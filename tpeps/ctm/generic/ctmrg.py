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


def _norm_tensors(tensors, norm_type="inf"):
    out = []
    for t in tensors:
        if norm_type == "inf":
            s = jnp.abs(t).max()
        else:
            s = jnp.linalg.norm(t.ravel())
        out.append(t / lax.stop_gradient(s))
    return tuple(out)


def ctm_move(direction, sites, site_of, C, T, chi, proj_kwargs, norm_type="inf",
             sites_bra=None):
    """One directional move for every site (reference ctmrg.py:179-327).

    :return: updated (C, T) dicts with shifted coordinate assignment
    """
    P, Pt = {}, {}
    for c in sites:
        P[c], Pt[c] = ctm_get_projectors(direction, c, sites, site_of, C, T, chi,
                                         sites_bra=sites_bra, **proj_kwargs)

    absorb = _ABSORB[direction]
    rel = _REL_VECS[direction]
    newC = dict(C)
    newT = dict(T)
    for c in sites:
        nC1, nC2, nT = absorb(c, sites, site_of, C, T, P, Pt, sites_bra=sites_bra)
        nC1, nC2, nT = _norm_tensors((nC1, nC2, nT), norm_type)
        nc = site_of((c[0] - direction[0], c[1] - direction[1]))
        newC[(nc, rel["nC1"])] = nC1
        newC[(nc, rel["nC2"])] = nC2
        newT[(nc, rel["nT"])] = nT
    return newC, newT


def make_ctmrg_iter(state, chi: int, ctm_cfg):
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

    def one_iter(sites, C, T):
        for direction in move_seq:
            n = lX if direction in ((-1, 0), (1, 0)) else lY
            for _ in range(n):
                C, T = ctm_move(direction, sites, site_of, C, T, chi, proj_kwargs, norm_type)
        return C, T

    def iter_with_spec(sites, C, T):
        C, T = one_iter(sites, C, T)
        specs = [jnp.linalg.svd(C[k], compute_uv=False) for k in sorted(C.keys())]
        spec = jnp.stack(specs)
        spec = spec / jnp.maximum(spec[:, :1], 1e-300)
        return C, T, spec

    return jax.jit(iter_with_spec), jax.jit(one_iter)


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
