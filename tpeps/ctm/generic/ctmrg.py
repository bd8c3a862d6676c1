"""Directional CTMRG for generic unit cells.

Counterpart of reference ctm/generic/ctmrg.py:18-804.  One directional
move: build 4x4 projectors for every non-equivalent bond, absorb a
row/column into every site's environment, truncate, and shift
coordinates.  A full iteration sweeps U, L, D, R, each repeated
lY (lX) times.

XLA design: environment dicts are pytrees; ``make_ctmrg_iter`` returns a
single jitted function performing the complete sweep — traced once per
(unit cell, D, chi, dtype) and reused across iterations, optimizer
epochs and line-search evaluations.  Gradients cross the convergence
loop via a checkpointed ``lax.scan`` tail after a no-grad fixed-point
run (the reference's ``fwd_checkpoint_move`` backprop semantics,
ctmrg.py:286-289, with O(1) memory per sweep).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .env import ENV
from .projectors import ctm_get_projectors

_REL_VECS = {
    (0, -1): {"nC1": (1, -1), "nC2": (-1, -1), "nT": (0, -1)},
    (-1, 0): {"nC1": (-1, -1), "nC2": (-1, 1), "nT": (-1, 0)},
    (0, 1): {"nC1": (-1, 1), "nC2": (1, 1), "nT": (0, 1)},
    (1, 0): {"nC1": (1, 1), "nC2": (1, -1), "nT": (1, 0)},
}


def _unfuse(P, chi, D, Db=None):
    return P.reshape(chi, D, D if Db is None else Db, -1)


def _absorb_up(c, sites, site_of, C, T, P, Pt, sites_bra=None):
    """Absorb the top row (reference ctmrg.py:324-441)."""
    a = sites[c]
    b = a if sites_bra is None else sites_bra[c]
    cl = site_of((c[0] - 1, c[1]))
    cr = site_of((c[0] + 1, c[1]))
    chi = C[(c, (1, -1))].shape[0]
    bl = sites[cl] if sites_bra is None else sites_bra[cl]
    br = sites[cr] if sites_bra is None else sites_bra[cr]

    C1, T1 = C[(c, (1, -1))], T[(c, (1, 0))]
    Tt = T[(c, (0, -1))]
    T2, C2 = T[(c, (-1, 0))], C[(c, (-1, -1))]
    P2 = _unfuse(P[c], chi, sites[cl].shape[4], bl.shape[4])
    Pt2 = _unfuse(Pt[c], chi, a.shape[2], b.shape[2])
    P1 = _unfuse(P[cr], chi, a.shape[4], b.shape[4])
    Pt1 = _unfuse(Pt[cr], chi, sites[cr].shape[2], br.shape[2])

    t = jnp.einsum("xy,ywb->xwb", C1, T1.reshape(chi, -1, chi))
    nC1 = jnp.einsum("xwq,xwb->qb", Pt1.reshape(chi, -1, Pt1.shape[-1]), t)

    t = jnp.einsum("xy,xdn->ydn", C2, T2)
    nC2 = jnp.einsum("ydn,ynq->dq", t, P2.reshape(chi, -1, P2.shape[-1]))

    T4 = Tt.reshape(chi, a.shape[1], b.shape[1], chi)
    z = jnp.einsum("xuvr,xlmq->uvrlmq", T4, Pt2)
    z = jnp.einsum("uvrlmq,sulef->vrmqsef", z, a)
    z = jnp.einsum("vrmqsef,svmgw->rqefgw", z, jnp.conj(b))
    nT = jnp.einsum("rqefgw,rfwp->qegp", z, P1)
    nT = nT.reshape(nT.shape[0], -1, nT.shape[3])
    return nC1, nC2, nT


def _absorb_left(c, sites, site_of, C, T, P, Pt, sites_bra=None):
    a = sites[c]
    b = a if sites_bra is None else sites_bra[c]
    cu = site_of((c[0], c[1] - 1))
    cd = site_of((c[0], c[1] + 1))
    chi = C[(c, (-1, -1))].shape[0]
    bu = sites[cu] if sites_bra is None else sites_bra[cu]
    bd = sites[cd] if sites_bra is None else sites_bra[cd]

    C1, T1 = C[(c, (-1, -1))], T[(c, (0, -1))]
    Tl = T[(c, (-1, 0))]
    T2, C2 = T[(c, (0, 1))], C[(c, (-1, 1))]
    P2 = _unfuse(P[c], chi, sites[cd].shape[1], bd.shape[1])
    Pt2 = _unfuse(Pt[c], chi, a.shape[3], b.shape[3])
    P1 = _unfuse(P[cu], chi, a.shape[1], b.shape[1])
    Pt1 = _unfuse(Pt[cu], chi, sites[cu].shape[3], bu.shape[3])

    t = jnp.einsum("xy,ymr->xmr", C1, T1)
    nC1 = jnp.einsum("xmq,xmr->qr", Pt1.reshape(chi, -1, Pt1.shape[-1]), t)

    t = jnp.einsum("xy,myr->xmr", C2, T2.reshape(-1, chi, chi))
    nC2 = jnp.einsum("xmq,xmr->qr", P2.reshape(chi, -1, P2.shape[-1]), t)

    T4 = Tl.reshape(chi, chi, a.shape[2], b.shape[2])
    z = jnp.einsum("tbwv,tucq->bwvucq", T4, P1)
    z = jnp.einsum("bwvucq,suwef->bvcqsef", z, a)
    z = jnp.einsum("bvcqsef,scvgh->bqefgh", z, jnp.conj(b))
    nT = jnp.einsum("bqefgh,begp->qpfh", z, Pt2)
    nT = nT.reshape(nT.shape[0], nT.shape[1], -1)
    return nC1, nC2, nT


def _absorb_down(c, sites, site_of, C, T, P, Pt, sites_bra=None):
    a = sites[c]
    b = a if sites_bra is None else sites_bra[c]
    cl = site_of((c[0] - 1, c[1]))
    cr = site_of((c[0] + 1, c[1]))
    chi = C[(c, (-1, 1))].shape[0]

    C1, T1 = C[(c, (-1, 1))], T[(c, (-1, 0))]
    Tb = T[(c, (0, 1))]
    T2, C2 = T[(c, (1, 0))], C[(c, (1, 1))]
    bl = sites[cl] if sites_bra is None else sites_bra[cl]
    br = sites[cr] if sites_bra is None else sites_bra[cr]
    P2 = _unfuse(P[c], chi, sites[cr].shape[2], br.shape[2])
    Pt2 = _unfuse(Pt[c], chi, a.shape[4], b.shape[4])
    P1 = _unfuse(P[cl], chi, a.shape[2], b.shape[2])
    Pt1 = _unfuse(Pt[cl], chi, sites[cl].shape[4], bl.shape[4])

    t = jnp.einsum("xy,txn->ytn", C1, T1)
    nC1 = jnp.einsum("ytn,ynq->tq", t, Pt1.reshape(chi, -1, Pt1.shape[-1]))

    t = jnp.einsum("xy,twx->ytw", C2, T2)
    nC2 = jnp.einsum("ytw,ywq->tq", t, P2.reshape(chi, -1, P2.shape[-1]))

    T4 = Tb.reshape(a.shape[3], b.shape[3], chi, chi)
    z = jnp.einsum("uvlr,lwcq->uvrwcq", T4, P1)
    z = jnp.einsum("uvrwcq,sewuf->vrcqsef", z, a)
    z = jnp.einsum("vrcqsef,sgcvh->rqefgh", z, jnp.conj(b))
    nT = jnp.einsum("rqefgh,rfhp->egqp", z, Pt2)
    nT = nT.reshape(-1, nT.shape[2], nT.shape[3])
    return nC1, nC2, nT


def _absorb_right(c, sites, site_of, C, T, P, Pt, sites_bra=None):
    a = sites[c]
    b = a if sites_bra is None else sites_bra[c]
    cu = site_of((c[0], c[1] - 1))
    cd = site_of((c[0], c[1] + 1))
    chi = C[(c, (1, 1))].shape[0]

    C1, T1 = C[(c, (1, 1))], T[(c, (0, 1))]
    Tr = T[(c, (1, 0))]
    T2, C2 = T[(c, (0, -1))], C[(c, (1, -1))]
    bu = sites[cu] if sites_bra is None else sites_bra[cu]
    bd = sites[cd] if sites_bra is None else sites_bra[cd]
    P2 = _unfuse(P[c], chi, sites[cu].shape[3], bu.shape[3])
    Pt2 = _unfuse(Pt[c], chi, a.shape[1], b.shape[1])
    P1 = _unfuse(P[cd], chi, a.shape[3], b.shape[3])
    Pt1 = _unfuse(Pt[cd], chi, sites[cd].shape[1], bd.shape[1])

    t = jnp.einsum("xy,mly->xml", C1, T1.reshape(-1, chi, chi))
    nC1 = jnp.einsum("xmq,xml->ql", Pt1.reshape(chi, -1, Pt1.shape[-1]), t)

    t = jnp.einsum("xy,lmx->ylm", C2, T2)
    nC2 = jnp.einsum("ylm,ymq->lq", t, P2.reshape(chi, -1, P2.shape[-1]))

    T4 = Tr.reshape(chi, a.shape[4], b.shape[4], chi)
    z = jnp.einsum("twvb,tucq->wvbucq", T4, Pt2)
    z = jnp.einsum("wvbucq,suefw->vbcqsef", z, a)
    z = jnp.einsum("vbcqsef,scghv->bqefgh", z, jnp.conj(b))
    nT = jnp.einsum("bqefgh,bfhp->qegp", z, P1)
    nT = nT.reshape(nT.shape[0], -1, nT.shape[3])
    return nC1, nC2, nT


_ABSORB = {
    (0, -1): _absorb_up,
    (-1, 0): _absorb_left,
    (0, 1): _absorb_down,
    (1, 0): _absorb_right,
}


def _norm_tensors(tensors, norm_type="inf", sg_norm=True):
    out = []
    for t in tensors:
        if norm_type == "inf":
            s = jnp.abs(t).max()
        else:
            s = jnp.linalg.norm(t.ravel())
        out.append(t / (lax.stop_gradient(s) if sg_norm else s))
    return tuple(out)


def ctm_move(direction, sites, site_of, C, T, chi, proj_kwargs, norm_type="inf",
             sites_bra=None, sg_norm=True, P_ref=None, return_P=False):
    """One directional move for every site (reference ctmrg.py:179-327).

    :param P_ref: optional ``{coord: P}`` gauge reference — each bond's
        (P, Pt) pair is rotated by the unitary Procrustes factor aligning
        P onto the previous sweep's projector (Pt gets the conjugate
        rotation, so the inserted resolution ``P Pt^T`` is unchanged).
        Without it the truncated bond basis drifts freely in gauge each
        sweep: the environment converges in spectrum but never
        elementwise, which rules out implicit fixed-point
        differentiation (same mechanism as the C4v continuity gauge,
        tpeps/ctm/c4v/ctmrg.py:143).
    :return: updated (C, T) dicts with shifted coordinate assignment
        (plus the ``{coord: P}`` dict when ``return_P``)
    """
    from ...linalg.power import procrustes_align

    P, Pt = {}, {}
    for c in sites:
        P[c], Pt[c] = ctm_get_projectors(direction, c, sites, site_of, C, T, chi,
                                         sites_bra=sites_bra, **proj_kwargs)
        if P_ref is not None:
            # block-diagonal alignment w.r.t. the multiplet-safe
            # truncation mask (zero columns must stay zero, see
            # tpeps/linalg/power.py:procrustes_align)
            cm = jnp.linalg.norm(lax.stop_gradient(P[c]), axis=0) > 0
            P[c], W = procrustes_align(P[c], P_ref[c], col_mask=cm)
            Pt[c] = Pt[c] @ jnp.conj(W)

    absorb = _ABSORB[direction]
    rel = _REL_VECS[direction]
    newC = dict(C)
    newT = dict(T)
    for c in sites:
        nC1, nC2, nT = absorb(c, sites, site_of, C, T, P, Pt, sites_bra=sites_bra)
        nC1, nC2, nT = _norm_tensors((nC1, nC2, nT), norm_type, sg_norm)
        nc = site_of((c[0] - direction[0], c[1] - direction[1]))
        newC[(nc, rel["nC1"])] = nC1
        newC[(nc, rel["nC2"])] = nC2
        newT[(nc, rel["nT"])] = nT
    if return_P:
        return newC, newT, P
    return newC, newT


def make_ctmrg_iter(state, chi: int, ctm_cfg, return_gauged: bool = False):
    """Build a jitted full CTMRG sweep for a given unit-cell structure.

    The returned function maps ``(sites, C, T) -> (C, T, spec)`` where
    ``spec`` stacks the singular values of all corners (for the
    gauge-invariant ``ctmrg_conv_specC`` criterion, reference
    env.py:817-860).
    """
    site_of = state.vertexToSite
    lX, lY = state.lX, state.lY
    if ctm_cfg.projector_method not in ("4X4", "4X2"):
        raise ValueError(
            f"generic CTM implements projector_method '4X4' and '4X2' "
            f"(got {ctm_cfg.projector_method!r})"
        )
    move_seq = tuple(tuple(d) for d in ctm_cfg.ctm_move_sequence)
    proj_kwargs = dict(
        svd_reltol=ctm_cfg.projector_svd_reltol,
        eps_multiplet=ctm_cfg.projector_eps_multiplet,
        multiplet_abstol=ctm_cfg.projector_multiplet_abstol,
        ad_decomp_reg=ctm_cfg.ad_decomp_reg,
        projector_method=ctm_cfg.projector_method,
    )
    norm_type = ctm_cfg.ctm_absorb_normalization

    def one_iter(sites, C, T, sg_norm=True):
        for direction in move_seq:
            n = lX if direction in ((-1, 0), (1, 0)) else lY
            for _ in range(n):
                C, T = ctm_move(direction, sites, site_of, C, T, chi, proj_kwargs,
                                norm_type, sg_norm=sg_norm)
        return C, T

    def one_iter_gauged(sites, C, T, P_refs, sg_norm=True):
        """Full sweep in the continuity gauge: ``P_refs`` is a tuple of
        per-move-slot projector dicts from the previous sweep; returns
        the new sweep's projectors alongside the environment so the
        gauge reference threads through a ``lax.while_loop`` carry."""
        P_out = []
        slot = 0
        for direction in move_seq:
            n = lX if direction in ((-1, 0), (1, 0)) else lY
            for _ in range(n):
                P_ref = None if P_refs is None else P_refs[slot]
                C, T, P = ctm_move(direction, sites, site_of, C, T, chi,
                                   proj_kwargs, norm_type, sg_norm=sg_norm,
                                   P_ref=P_ref, return_P=True)
                P_out.append(P)
                slot += 1
        return C, T, tuple(P_out)

    def iter_with_spec(sites, C, T):
        C, T = one_iter(sites, C, T)
        specs = [jnp.linalg.svd(C[k], compute_uv=False) for k in sorted(C.keys())]
        spec = jnp.stack(specs)
        spec = spec / jnp.maximum(spec[:, :1], 1e-300)
        return C, T, spec

    if return_gauged:
        return jax.jit(iter_with_spec), jax.jit(
            one_iter, static_argnames=("sg_norm",)), one_iter_gauged
    return jax.jit(iter_with_spec), jax.jit(one_iter, static_argnames=("sg_norm",))


def run(state, env: ENV, ctm_cfg, conv_check=None):
    """CTMRG to convergence (host loop over the jitted sweep).

    Default convergence: l2 distance of successive normalized corner
    spectra across all corners < ``ctm_conv_tol``.

    :return: ``(env, history)``
    """
    iter_spec, _ = make_ctmrg_iter(state, env.chi, ctm_cfg)
    sites = dict(state.sites)
    C, T = dict(env.C), dict(env.T)
    spec_prev = None
    history = {"conv_crit": []}
    for i in range(ctm_cfg.ctm_max_iter):
        C, T, spec = iter_spec(sites, C, T)
        if conv_check is not None:
            converged, history = conv_check(state, ENV(env.chi, C, T), history)
            if converged:
                break
        else:
            if spec_prev is not None:
                dist = float(jnp.linalg.norm(spec - spec_prev))
                history["conv_crit"].append(dist)
                if dist < ctm_cfg.ctm_conv_tol:
                    break
            spec_prev = spec
    out = ENV(env.chi, C, T)
    return out, history


def run_differentiable(state_sites, env: ENV, state, ctm_cfg):
    """Differentiable converged environment: no-grad fixed point, then a
    checkpointed ``lax.scan`` over ``grad_tail_iter`` full sweeps
    (truncated backprop-through-CTMRG; the reference backprops through
    all iterations with per-move re-entrant checkpointing, ctmrg.py:286).

    :param state_sites: dict of site tensors carrying gradients
    :param env: converged environment (will be stop-gradiented)
    """
    _, one_iter = make_ctmrg_iter(state, env.chi, ctm_cfg)
    C0 = jax.tree_util.tree_map(lax.stop_gradient, dict(env.C))
    T0 = jax.tree_util.tree_map(lax.stop_gradient, dict(env.T))

    def step(carry, _):
        C, T = carry
        C, T = one_iter(state_sites, C, T)
        return (C, T), None

    (C, T), _ = lax.scan(jax.checkpoint(step), (C0, T0), None, length=ctm_cfg.grad_tail_iter)
    return ENV(env.chi, C, T)


def _env_dist2(e1, e2):
    return sum(
        jnp.sum(jnp.abs(x - y) ** 2)
        for x, y in zip(jax.tree_util.tree_leaves(e1), jax.tree_util.tree_leaves(e2))
    )


def make_converge_implicit_generic(state, chi, ctm_cfg,
                                   adjoint_max_iter: int = 100,
                                   adjoint_tol: float = 1.0e-8):
    """Implicit fixed-point differentiation for the GENERIC engine
    (port of the C4v construction, tpeps/ctm/c4v/ctmrg.py:365-447;
    the reference instead backprops the full move history,
    ctm/generic/ctmrg.py:286).

    Forward: one pivot-gauge sweep seeds the per-move projector
    references, then a ``lax.while_loop`` of Procrustes-gauge-fixed
    sweeps (``one_iter_gauged``) runs to the ELEMENTWISE fixed point —
    without the continuity gauge the generic environment only converges
    in spectrum (the truncated bond bases rotate every sweep) and no
    fixed point exists to differentiate.
    Backward: Neumann solution of the adjoint equation with the
    divergence guard; the adjoint sweep differentiates the
    normalization (``sg_norm=False``) so the scale direction does not
    pin a unit eigenvalue in the move Jacobian, and holds the gauge
    reference at the converged projectors (a constant), exactly as the
    C4v adjoint does.

    :return: ``converge(sites, C, T) -> (C*, T*)`` (custom-vjp callable;
        call inside a jitted loss)
    """
    import dataclasses

    # floor the VJP gap regularizer: the adjoint differentiates the
    # projector decompositions at the fixed point where exact spectral
    # multiplets live (forward values are unaffected by ad_decomp_reg)
    ctm_cfg = dataclasses.replace(
        ctm_cfg, ad_decomp_reg=max(ctm_cfg.ad_decomp_reg,
                                   ctm_cfg.grad_adjoint_decomp_reg))
    _, _, one_iter_gauged = make_ctmrg_iter(state, chi, ctm_cfg,
                                            return_gauged=True)
    max_iter = ctm_cfg.ctm_max_iter
    conv_tol = ctm_cfg.ctm_conv_tol

    def _converge_raw(sites, C, T):
        C1, T1, P0 = one_iter_gauged(sites, C, T, None)

        def cond(carry):
            _, _, _, i, d2 = carry
            return jnp.logical_and(i < max_iter, d2 > conv_tol * conv_tol)

        def body(carry):
            C0, T0, Pr, i, _ = carry
            C1, T1, P1 = one_iter_gauged(sites, C0, T0, Pr)
            return (C1, T1, P1, i + 1, _env_dist2((C1, T1), (C0, T0)))

        init = (C1, T1, P0, jnp.asarray(0), jnp.asarray(jnp.inf, jnp.float64))
        Cf, Tf, Pf, _, _ = lax.while_loop(cond, body, init)
        return Cf, Tf, Pf

    @jax.custom_vjp
    def converge(sites, C, T):
        Cf, Tf, _ = _converge_raw(sites, C, T)
        return Cf, Tf

    def fwd(sites, C, T):
        Cf, Tf, Pf = _converge_raw(sites, C, T)
        return (Cf, Tf), (sites, Cf, Tf, Pf)

    def bwd(res, cot):
        sites, Cf, Tf, Pf = res
        P_star = jax.tree_util.tree_map(lax.stop_gradient, Pf)
        _, vjp_fn = jax.vjp(
            lambda s_, C_, T_: one_iter_gauged(s_, C_, T_, P_star,
                                               sg_norm=False)[:2],
            sites, Cf, Tf,
        )

        def norm2(t):
            return sum(jnp.vdot(x, x).real for x in jax.tree_util.tree_leaves(t))

        cot_norm = norm2(cot)
        da0 = jax.tree_util.tree_map(jnp.zeros_like, sites)

        def cond(carry):
            _, u, i, delta, _, grew = carry
            return jnp.logical_and(
                jnp.logical_and(i < adjoint_max_iter,
                                delta > adjoint_tol**2 * cot_norm),
                jnp.logical_and(grew < 4, delta < 1.0e4 * cot_norm),
            )

        def body(carry):
            da, u, i, delta, _, grew = carry
            da_i, uC, uT = vjp_fn(u)
            da = jax.tree_util.tree_map(jnp.add, da, da_i)
            delta_next = norm2((uC, uT))
            grew = jnp.where(delta_next > delta, grew + 1, 0)
            return (da, (uC, uT), i + 1, delta_next, delta, grew)

        init = (da0, cot, jnp.asarray(0), cot_norm, jnp.asarray(jnp.inf),
                jnp.asarray(0))
        da, _, n_adj, delta_f, _, grew_f = lax.while_loop(cond, body, init)
        diverged = jnp.logical_and(
            jnp.logical_or(grew_f >= 4, delta_f >= 1.0e4 * cot_norm),
            delta_f > adjoint_tol**2 * cot_norm,
        )
        lax.cond(
            diverged,
            lambda: jax.debug.print(
                "tpeps: generic implicit CTMRG adjoint diverging (iter {i}, "
                "|u|^2={d}); gradient truncated — use grad_mode='scan'",
                i=n_adj, d=delta_f,
            ),
            lambda: None,
        )
        zC = jax.tree_util.tree_map(jnp.zeros_like, Cf)
        zT = jax.tree_util.tree_map(jnp.zeros_like, Tf)
        return (da, zC, zT)

    converge.defvjp(fwd, bwd)
    return converge


def converge_env_generic(state_sites, env: ENV, state, ctm_cfg):
    """Differentiable converged generic environment, strategy selected by
    ``ctm_cfg.grad_mode``: "implicit" (fixed-point adjoint, constant
    memory) or "scan" (the truncated-backprop tail of
    :func:`run_differentiable`)."""
    if ctm_cfg.grad_mode == "scan":
        return run_differentiable(state_sites, env, state, ctm_cfg)
    fn = make_converge_implicit_generic(state, env.chi, ctm_cfg)
    C0 = jax.tree_util.tree_map(lax.stop_gradient, dict(env.C))
    T0 = jax.tree_util.tree_map(lax.stop_gradient, dict(env.T))
    Cf, Tf = fn(state_sites, C0, T0)
    return ENV(env.chi, Cf, Tf)
