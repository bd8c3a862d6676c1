"""Double-layer (dl) generic CTM: moves over an explicit 4-leg double
tensor ``E[U, L, D, R]`` with fused (ket, bra) pair legs.

Counterpart of the reference's ``ctm_force_dl`` mode
(ctm/generic/ctmrg.py:51-61 builds ``stateDL`` and runs the same
moves).  The sl engine contracts the two layers lazily; this engine
takes E as *data* — which is what fermionic double layers need: their
(ket, bra) pairs carry swap-gate sign structure that does not factor
into the layers (tpeps/models/fermion/NOTES.md).

1x1-cell driver (the fermionic honeycomb states are 1x1); E legs are
(up, left, down, right), each of fused dimension Dk*Db, ket-major.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .env import ENV, _zero_pad_into
from .projectors import projectors_from_matrices

_C = (0, 0)


def dl_of(a, b=None):
    """Naive bosonic double layer ``E[(uu'),(ll'),(dd'),(rr')]`` of
    ``a[s,u,l,d,r]`` (bra = conj(b or a))."""
    b = a if b is None else b
    E = jnp.einsum("suldr,sabce->ualbdcre", a, jnp.conj(b))
    sh = E.shape
    return E.reshape(sh[0] * sh[1], sh[2] * sh[3], sh[4] * sh[5], sh[6] * sh[7])


def pair_trace_vec(Dk, Db=None, dtype=jnp.float64):
    """delta vector over a fused (ket, bra) pair leg."""
    Db = Dk if Db is None else Db
    return jnp.eye(Dk, Db, dtype=dtype).reshape(-1)


def init_env_dl(E, chi: int, vecs=None) -> ENV:
    """PBC-traced environment from E: outward pair legs closed with the
    delta pairing (mirror of env.init_from_ipeps_pbc)."""
    dtype = E.dtype
    if vecs is None:
        D2 = E.shape[0]
        Dk = int(round(D2 ** 0.5))
        v = pair_trace_vec(Dk, dtype=dtype)
        vecs = (v, v, v, v)  # per leg u, l, d, r
    vu, vl, vd, vr = vecs
    env = ENV(chi)

    def n(t):
        return t / jax.lax.stop_gradient(jnp.abs(t).max())

    env.C[(_C, (-1, -1))] = _zero_pad_into(
        n(jnp.einsum("uldr,u,l->dr", E, vu, vl)), (chi, chi), dtype)
    env.C[(_C, (1, -1))] = _zero_pad_into(
        n(jnp.einsum("uldr,u,r->ld", E, vu, vr)), (chi, chi), dtype)
    env.C[(_C, (1, 1))] = _zero_pad_into(
        n(jnp.einsum("uldr,d,r->ul", E, vd, vr)), (chi, chi), dtype)
    env.C[(_C, (-1, 1))] = _zero_pad_into(
        n(jnp.einsum("uldr,l,d->ur", E, vl, vd)), (chi, chi), dtype)
    env.T[(_C, (0, -1))] = _zero_pad_into(
        n(jnp.einsum("uldr,u->ldr", E, vu)), (chi, E.shape[2], chi), dtype)
    env.T[(_C, (-1, 0))] = _zero_pad_into(
        n(jnp.einsum("uldr,l->udr", E, vl)), (chi, chi, E.shape[3]), dtype)
    env.T[(_C, (0, 1))] = _zero_pad_into(
        n(jnp.einsum("uldr,d->ulr", E, vd)), (E.shape[0], chi, chi), dtype)
    env.T[(_C, (1, 0))] = _zero_pad_into(
        n(jnp.einsum("uldr,r->uld", E, vr)), (chi, E.shape[1], chi), dtype)
    return env


# --------------------------------------------------------------- corners
# conventions mirror components.py:
#   c2x2_lu: [(down-chi . d-pair), (right-chi . r-pair)]
#   c2x2_ru: [(left-chi . l-pair), (down-chi . d-pair)]
#   c2x2_rd: [(up-chi . u-pair),   (left-chi . l-pair)]
#   c2x2_ld: [(up-chi . u-pair),   (right-chi . r-pair)]


def _corners(E, C, T):
    lu = jnp.einsum("xy,ymi->xmi", C[(_C, (-1, -1))], T[(_C, (0, -1))])
    lu = jnp.einsum("xmi,xjl->mijl", lu, T[(_C, (-1, 0))])
    lu = jnp.einsum("mijl,mldr->jdir", lu, E)
    lu = lu.reshape(lu.shape[0] * lu.shape[1], lu.shape[2] * lu.shape[3])

    ru = jnp.einsum("xy,ymb->xmb", C[(_C, (1, -1))], T[(_C, (1, 0))])
    ru = jnp.einsum("xmb,lnx->mbln", ru, T[(_C, (0, -1))])
    ru = jnp.einsum("mbln,nkdm->lkbd", ru, E)
    ru = ru.reshape(ru.shape[0] * ru.shape[1], ru.shape[2] * ru.shape[3])

    rd = jnp.einsum("xy,mly->xml", C[(_C, (1, 1))], T[(_C, (0, 1))])
    rd = jnp.einsum("xml,tnx->mltn", rd, T[(_C, (1, 0))])
    rd = jnp.einsum("mltn,ukmn->tulk", rd, E)
    rd = rd.reshape(rd.shape[0] * rd.shape[1], rd.shape[2] * rd.shape[3])

    ld = jnp.einsum("xy,txw->ytw", C[(_C, (-1, 1))], T[(_C, (-1, 0))])
    ld = jnp.einsum("ytw,myr->twmr", ld, T[(_C, (0, 1))])
    ld = jnp.einsum("twmr,uwmk->turk", ld, E)
    ld = ld.reshape(ld.shape[0] * ld.shape[1], ld.shape[2] * ld.shape[3])
    return lu, ru, rd, ld


def ctm_move_dl(E, env: ENV, chi: int, proj_kwargs, sg_norm=True,
                P_ref=None, return_P=False):
    """One full 4-direction sweep for the 1x1 dl network.  With C4-
    asymmetric E the four directional moves use the same projector
    construction as the sl engine (HALVES composition of the corners).

    :param P_ref: optional tuple of 4 directional gauge-reference
        projectors — each (P, Pt) pair is rotated by the Procrustes
        factor aligning P onto the previous sweep's, giving an
        ELEMENTWISE fixed point (same continuity gauge as the sl
        engines, tpeps/ctm/generic/ctmrg.py:189)
    :param sg_norm: stop-gradient the absorption normalizations (False
        inside the implicit adjoint so the scale direction does not pin
        a unit eigenvalue)
    """
    from ...linalg.power import procrustes_align
    from jax import lax

    C, T = dict(env.C), dict(env.T)
    D2u, D2l, D2d, D2r = E.shape
    P_out = []

    for idir, direction in enumerate(((0, -1), (-1, 0), (0, 1), (1, 0))):
        lu, ru, rd, ld = _corners(E, C, T)
        if direction == (0, -1):
            R = ru @ rd
            Rt = jnp.einsum("ab,ac->bc", lu, ld)
        elif direction == (-1, 0):
            R = lu @ ru
            Rt = jnp.einsum("ab,cb->ac", ld, rd)
        elif direction == (0, 1):
            R = jnp.einsum("ab,ac->bc", ld, lu)
            Rt = jnp.einsum("ab,ca->bc", rd, ru)
        else:
            R = jnp.einsum("ab,cb->ac", rd, ld)
            Rt = jnp.einsum("ab,ca->bc", ru, lu)
        P, Pt = projectors_from_matrices(R, Rt, chi, **proj_kwargs)
        if P_ref is not None:
            cm = jnp.linalg.norm(lax.stop_gradient(P), axis=0) > 0
            P, W = procrustes_align(P, P_ref[idir], col_mask=cm)
            Pt = Pt @ jnp.conj(W)
        P_out.append(P)

        def _nn(t):
            m = jnp.abs(t).max()
            return t / (jax.lax.stop_gradient(m) if sg_norm else m)

        if direction == (0, -1):
            chi0 = C[(_C, (1, -1))].shape[0]
            P4 = P.reshape(chi0, D2r, -1)
            Pt4 = Pt.reshape(chi0, D2l, -1)
            t = jnp.einsum("xy,ywb->xwb", C[(_C, (1, -1))], T[(_C, (1, 0))])
            nC1 = jnp.einsum("xwq,xwb->qb", Pt4, t)
            t = jnp.einsum("xy,xdn->ydn", C[(_C, (-1, -1))], T[(_C, (-1, 0))])
            nC2 = jnp.einsum("ydn,ynq->dq", t, P4)
            z = jnp.einsum("xur,xlq->urlq", T[(_C, (0, -1))], Pt4)
            z = jnp.einsum("urlq,uldm->rqdm", z, E)
            nT = jnp.einsum("rqdm,rmp->qdp", z, P4)
            C[(_C, (1, -1))], C[(_C, (-1, -1))] = _nn(nC1), _nn(nC2)
            T[(_C, (0, -1))] = _nn(nT)
        elif direction == (-1, 0):
            chi0 = C[(_C, (-1, -1))].shape[0]
            P4 = P.reshape(chi0, D2d, -1)
            Pt4 = Pt.reshape(chi0, D2u, -1)
            t = jnp.einsum("xy,ymr->xmr", C[(_C, (-1, -1))], T[(_C, (0, -1))])
            nC1 = jnp.einsum("xmq,xmr->qr", Pt4, t)
            t = jnp.einsum("xy,myr->xmr", C[(_C, (-1, 1))], T[(_C, (0, 1))])
            nC2 = jnp.einsum("xmq,xmr->qr", P4, t)
            z = jnp.einsum("tbw,tuq->bwuq", T[(_C, (-1, 0))], P4)
            z = jnp.einsum("bwuq,uwdr->bqdr", z, E)
            nT = jnp.einsum("bqdr,bdp->qpr", z, Pt4)
            C[(_C, (-1, -1))], C[(_C, (-1, 1))] = _nn(nC1), _nn(nC2)
            T[(_C, (-1, 0))] = _nn(nT)
        elif direction == (0, 1):
            chi0 = C[(_C, (-1, 1))].shape[0]
            P4 = P.reshape(chi0, D2r, -1)
            Pt4 = Pt.reshape(chi0, D2l, -1)
            t = jnp.einsum("xy,txn->ytn", C[(_C, (-1, 1))], T[(_C, (-1, 0))])
            nC1 = jnp.einsum("ytn,ynq->tq", t, Pt4)
            t = jnp.einsum("xy,twx->ytw", C[(_C, (1, 1))], T[(_C, (1, 0))])
            nC2 = jnp.einsum("ytw,ywq->tq", t, P4)
            z = jnp.einsum("mlr,lwq->mrwq", T[(_C, (0, 1))], P4)
            z = jnp.einsum("mrwq,uwmc->rquc", z, E)
            nT = jnp.einsum("rquc,rcp->uqp", z, Pt4)
            C[(_C, (-1, 1))], C[(_C, (1, 1))] = _nn(nC1), _nn(nC2)
            T[(_C, (0, 1))] = _nn(nT)
        else:
            chi0 = C[(_C, (1, 1))].shape[0]
            P4 = P.reshape(chi0, D2u, -1)
            Pt4 = Pt.reshape(chi0, D2d, -1)
            t = jnp.einsum("xy,mly->xml", C[(_C, (1, 1))], T[(_C, (0, 1))])
            nC1 = jnp.einsum("xmq,xml->ql", Pt4, t)
            t = jnp.einsum("xy,lmx->ylm", C[(_C, (1, -1))], T[(_C, (0, -1))])
            nC2 = jnp.einsum("ylm,ymq->lq", t, P4)
            z = jnp.einsum("twb,tuq->wbuq", T[(_C, (1, 0))], Pt4)
            z = jnp.einsum("wbuq,uldw->bqld", z, E)
            nT = jnp.einsum("bqld,bdp->qlp", z, P4)
            C[(_C, (1, 1))], C[(_C, (1, -1))] = _nn(nC1), _nn(nC2)
            T[(_C, (1, 0))] = _nn(nT)

    out = ENV(env.chi)
    out.C, out.T = C, T
    if return_P:
        return out, tuple(P_out)
    return out


def _n(t):
    return t / jax.lax.stop_gradient(jnp.abs(t).max())


def run_dl(E, env: ENV, ctm_cfg):
    """Host loop to convergence (corner-spectra criterion)."""
    proj_kwargs = dict(
        svd_reltol=ctm_cfg.projector_svd_reltol,
        eps_multiplet=ctm_cfg.projector_eps_multiplet,
        multiplet_abstol=ctm_cfg.projector_multiplet_abstol,
        ad_decomp_reg=ctm_cfg.ad_decomp_reg,
    )
    chi = env.chi
    spec_prev = None
    history = {"conv_crit": []}
    for _ in range(ctm_cfg.ctm_max_iter):
        env = ctm_move_dl(E, env, chi, proj_kwargs)
        specs = [np.asarray(jnp.linalg.svd(env.C[k], compute_uv=False))
                 for k in sorted(env.C.keys())]
        spec = np.stack([s / max(s[0], 1e-300) for s in specs])
        if spec_prev is not None:
            dist = float(np.linalg.norm(spec - spec_prev))
            history["conv_crit"].append(dist)
            if dist < ctm_cfg.ctm_conv_tol:
                break
        spec_prev = spec
    return env, history


def run_dl_differentiable(E, env: ENV, ctm_cfg):
    """Differentiable converged dl environment (mirror of
    ``ctmrg.run_differentiable``): stop-gradient the converged ``env``,
    then a checkpointed ``lax.scan`` over ``grad_tail_iter`` full
    sweeps carrying gradients from ``E`` (truncated
    backprop-through-CTMRG)."""
    from jax import lax

    proj_kwargs = dict(
        svd_reltol=ctm_cfg.projector_svd_reltol,
        eps_multiplet=ctm_cfg.projector_eps_multiplet,
        multiplet_abstol=ctm_cfg.projector_multiplet_abstol,
        ad_decomp_reg=ctm_cfg.ad_decomp_reg,
    )
    chi = env.chi
    C0 = jax.tree_util.tree_map(jax.lax.stop_gradient, dict(env.C))
    T0 = jax.tree_util.tree_map(jax.lax.stop_gradient, dict(env.T))

    def step(carry, _):
        C, T = carry
        e = ENV(chi)
        e.C, e.T = C, T
        e2 = ctm_move_dl(E, e, chi, proj_kwargs)
        return (dict(e2.C), dict(e2.T)), None

    (C, T), _ = lax.scan(jax.checkpoint(step), (C0, T0), None,
                         length=ctm_cfg.grad_tail_iter)
    out = ENV(chi)
    out.C, out.T = C, T
    return out


def _env_dist2_dl(e1, e2):
    d = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(e1), jax.tree_util.tree_leaves(e2)):
        d = d + jnp.sum(jnp.abs(a - b) ** 2)
    return d


def make_converge_implicit_dl(chi, ctm_cfg, adjoint_max_iter: int = 100,
                              adjoint_tol: float = 1.0e-8):
    """Implicit fixed-point differentiation for the dl engine — the
    counterpart of the reference's yastn ``FixedPoint`` / ``fp_ctmrg``
    optimization mode (reference examples/honeycomb/FCI.py:16, yastn
    tn/fpeps/envs/fixed_pt.py), built exactly like the sl-engine port
    (tpeps/ctm/generic/ctmrg.py:358 ``make_converge_implicit_generic``):

    Forward: one pivot sweep seeds the 4 directional projector
    references, then Procrustes-gauge-fixed sweeps run to the
    ELEMENTWISE fixed point in a ``lax.while_loop``.
    Backward: Neumann solution of the adjoint equation with the
    divergence guard; the adjoint sweep differentiates the
    normalization (``sg_norm=False``) and holds the gauge at the
    converged projectors.

    :return: ``converge(E, C, T) -> (C*, T*)`` (custom-vjp; call inside
        a jitted loss)
    """
    from jax import lax

    proj_kwargs = dict(
        svd_reltol=ctm_cfg.projector_svd_reltol,
        eps_multiplet=ctm_cfg.projector_eps_multiplet,
        multiplet_abstol=ctm_cfg.projector_multiplet_abstol,
        # VJP-only gap regularizer floored for the adjoint (degenerate
        # multiplets at the fixed point; values unaffected)
        ad_decomp_reg=max(ctm_cfg.ad_decomp_reg,
                          ctm_cfg.grad_adjoint_decomp_reg),
    )
    max_iter = ctm_cfg.ctm_max_iter
    conv_tol = ctm_cfg.ctm_conv_tol

    def sweep(E, C, T, P_ref, sg_norm=True):
        e = ENV(chi)
        e.C, e.T = dict(C), dict(T)
        e2, P = ctm_move_dl(E, e, chi, proj_kwargs, sg_norm=sg_norm,
                            P_ref=P_ref, return_P=True)
        return dict(e2.C), dict(e2.T), P

    def _converge_raw(E, C, T):
        C1, T1, P0 = sweep(E, C, T, None)

        def cond(carry):
            _, _, _, i, d2 = carry
            return jnp.logical_and(i < max_iter, d2 > conv_tol * conv_tol)

        def body(carry):
            C0, T0, Pr, i, _ = carry
            C1, T1, P1 = sweep(E, C0, T0, Pr)
            return (C1, T1, P1, i + 1, _env_dist2_dl((C1, T1), (C0, T0)))

        init = (C1, T1, P0, jnp.asarray(0), jnp.asarray(jnp.inf, jnp.float64))
        Cf, Tf, Pf, _, _ = lax.while_loop(cond, body, init)
        return Cf, Tf, Pf

    @jax.custom_vjp
    def converge(E, C, T):
        Cf, Tf, _ = _converge_raw(E, C, T)
        return Cf, Tf

    def fwd(E, C, T):
        Cf, Tf, Pf = _converge_raw(E, C, T)
        return (Cf, Tf), (E, Cf, Tf, Pf)

    def bwd(res, cot):
        E, Cf, Tf, Pf = res
        P_star = jax.tree_util.tree_map(lax.stop_gradient, Pf)
        _, vjp_fn = jax.vjp(
            lambda E_, C_, T_: sweep(E_, C_, T_, P_star, sg_norm=False)[:2],
            E, Cf, Tf,
        )

        def norm2(t):
            return sum(jnp.vdot(x, x).real for x in jax.tree_util.tree_leaves(t))

        cot_norm = norm2(cot)
        dE0 = jnp.zeros_like(E)

        def cond(carry):
            _, u, i, delta, _, grew = carry
            return jnp.logical_and(
                jnp.logical_and(i < adjoint_max_iter,
                                delta > adjoint_tol**2 * cot_norm),
                jnp.logical_and(grew < 4, delta < 1.0e4 * cot_norm),
            )

        def body(carry):
            dE, u, i, delta, _, grew = carry
            dE_i, uC, uT = vjp_fn(u)
            delta_next = norm2((uC, uT))
            grew = jnp.where(delta_next > delta, grew + 1, 0)
            return (dE + dE_i, (uC, uT), i + 1, delta_next, delta, grew)

        init = (dE0, cot, jnp.asarray(0), cot_norm, jnp.asarray(jnp.inf),
                jnp.asarray(0))
        dE, _, n_adj, delta_f, _, grew_f = lax.while_loop(cond, body, init)
        diverged = jnp.logical_and(
            jnp.logical_or(grew_f >= 4, delta_f >= 1.0e4 * cot_norm),
            delta_f > adjoint_tol**2 * cot_norm,
        )
        lax.cond(
            diverged,
            lambda: jax.debug.print(
                "tpeps: dl implicit CTMRG adjoint diverging (iter {i}, "
                "|u|^2={d}); gradient truncated — use grad_mode='scan'",
                i=n_adj, d=delta_f,
            ),
            lambda: None,
        )
        zC = jax.tree_util.tree_map(jnp.zeros_like, Cf)
        zT = jax.tree_util.tree_map(jnp.zeros_like, Tf)
        return (dE, zC, zT)

    converge.defvjp(fwd, bwd)
    return converge


def converge_env_dl(E, env: ENV, ctm_cfg):
    """Differentiable converged dl environment, strategy per
    ``ctm_cfg.grad_mode``: "implicit" (fixed-point adjoint) or "scan"
    (truncated-backprop tail of :func:`run_dl_differentiable`)."""
    if ctm_cfg.grad_mode == "scan":
        return run_dl_differentiable(E, env, ctm_cfg)
    fn = make_converge_implicit_dl(env.chi, ctm_cfg)
    C0 = jax.tree_util.tree_map(jax.lax.stop_gradient, dict(env.C))
    T0 = jax.tree_util.tree_map(jax.lax.stop_gradient, dict(env.T))
    Cf, Tf = fn(E, C0, T0)
    out = ENV(env.chi)
    out.C, out.T = Cf, Tf
    return out


def rdm1x1_dl(E_open, env: ENV):
    """Unnormalized rho[s, z] from an open double tensor
    ``E_open[s, z, U, L, D, R]``."""
    C, T = env.C, env.T
    q = jnp.einsum("xy,ymz->xmz", C[(_C, (-1, -1))], T[(_C, (0, -1))])
    q = jnp.einsum("xmz,xwl->mzwl", q, T[(_C, (-1, 0))])
    q = jnp.einsum("mzwl,bcmldr->bczwdr", q, E_open)
    q = jnp.einsum("bczwdr,zp->bcpwdr", q, C[(_C, (1, -1))])
    q = jnp.einsum("bcpwdr,prv->bcwdv", q, T[(_C, (1, 0))])
    q = jnp.einsum("bcwdv,wy->bcydv", q, C[(_C, (-1, 1))])
    q = jnp.einsum("bcydv,dyu->bcuv", q, T[(_C, (0, 1))])
    return jnp.einsum("bcuv,vu->bc", q, C[(_C, (1, 1))])


def rdm2x1_dl(E_open, env: ENV, E_open2=None):
    """Unnormalized rho[s0, z0, s1, z1] of two horizontally adjacent
    sites, both open (mirror of the sl ``rdm2x1``; the closure pattern
    is ``overlap.closure_2x1`` with the phys pairs threaded)."""
    C, T = env.C, env.T
    Eo2 = E_open if E_open2 is None else E_open2
    q = jnp.einsum("xy,ymz->xmz", C[(_C, (-1, -1))], T[(_C, (0, -1))])
    q = jnp.einsum("xmz,xwl->mzwl", q, T[(_C, (-1, 0))])
    q = jnp.einsum("mzwl,abmldr->abzwdr", q, E_open)
    q = jnp.einsum("abzwdr,wv->abzvdr", q, C[(_C, (-1, 1))])
    q = jnp.einsum("abzvdr,dvu->abzru", q, T[(_C, (0, 1))])
    q = jnp.einsum("abzru,znw->abrunw", q, T[(_C, (0, -1))])
    q = jnp.einsum("abrunw,efnrds->abefuwds", q, Eo2)
    q = jnp.einsum("abefuwds,dug->abefwsg", q, T[(_C, (0, 1))])
    q = jnp.einsum("abefwsg,wp->abefpsg", q, C[(_C, (1, -1))])
    q = jnp.einsum("abefpsg,pst->abeftg", q, T[(_C, (1, 0))])
    return jnp.einsum("abeftg,tg->abef", q, C[(_C, (1, 1))])


def rdm1x2_dl(E_open, env: ENV, E_open2=None):
    """Unnormalized rho[s0, z0, s1, z1] of two vertically adjacent
    sites (site1 below site0), both open."""
    C, T = env.C, env.T
    Eo2 = E_open if E_open2 is None else E_open2
    q = jnp.einsum("xy,ymz->xmz", C[(_C, (-1, -1))], T[(_C, (0, -1))])
    q = jnp.einsum("xmz,zp->xmp", q, C[(_C, (1, -1))])
    q = jnp.einsum("xmp,prv->xmrv", q, T[(_C, (1, 0))])
    q = jnp.einsum("xmrv,xwl->mrvwl", q, T[(_C, (-1, 0))])
    q = jnp.einsum("mrvwl,abmldr->abvwd", q, E_open)
    q = jnp.einsum("abvwd,wcl->abvdcl", q, T[(_C, (-1, 0))])
    q = jnp.einsum("abvdcl,efdlgr->abefvcgr", q, Eo2)
    q = jnp.einsum("abefvcgr,vrt->abefcgt", q, T[(_C, (1, 0))])
    q = jnp.einsum("abefcgt,cy->abefygt", q, C[(_C, (-1, 1))])
    q = jnp.einsum("abefygt,gyu->abefut", q, T[(_C, (0, 1))])
    return jnp.einsum("abefut,tu->abef", q, C[(_C, (1, 1))])


def _lu_open(E_open, C, T):
    q = jnp.einsum("xy,ymi->xmi", C[(_C, (-1, -1))], T[(_C, (0, -1))])
    q = jnp.einsum("xmi,xjl->mijl", q, T[(_C, (-1, 0))])
    q = jnp.einsum("mijl,abmldr->abjdir", q, E_open)
    sh = q.shape
    return q.reshape(sh[0], sh[1], sh[2] * sh[3], sh[4] * sh[5])


def _rd_open(E_open, C, T):
    q = jnp.einsum("xy,mly->xml", C[(_C, (1, 1))], T[(_C, (0, 1))])
    q = jnp.einsum("xml,tnx->mltn", q, T[(_C, (1, 0))])
    q = jnp.einsum("mltn,abukmn->abtulk", q, E_open)
    sh = q.shape
    return q.reshape(sh[0], sh[1], sh[2] * sh[3], sh[4] * sh[5])


def _ru_open(E_open, C, T):
    q = jnp.einsum("xy,ymb->xmb", C[(_C, (1, -1))], T[(_C, (1, 0))])
    q = jnp.einsum("xmb,lnx->mbln", q, T[(_C, (0, -1))])
    q = jnp.einsum("mbln,pqnkdm->pqlkbd", q, E_open)
    sh = q.shape
    return q.reshape(sh[0], sh[1], sh[2] * sh[3], sh[4] * sh[5])


def _ld_open(E_open, C, T):
    q = jnp.einsum("xy,txw->ytw", C[(_C, (-1, 1))], T[(_C, (-1, 0))])
    q = jnp.einsum("ytw,myr->twmr", q, T[(_C, (0, 1))])
    q = jnp.einsum("twmr,pquwmk->pqturk", q, E_open)
    sh = q.shape
    return q.reshape(sh[0], sh[1], sh[2] * sh[3], sh[4] * sh[5])


def rdm2x2_diag_dl(E_open, E, env: ENV, E_open2=None):
    """Unnormalized rho[s00, z00, s11, z11] of the diagonal NNN pair
    ((0,0), (1,1)) of a 2x2 patch (closed E at the off-diagonal sites).
    ``E_open2`` (default ``E_open``) is used at the second (lower-right)
    site — fermionic strings need different dressings per role."""
    C, T = env.C, env.T
    lu = _lu_open(E_open, C, T)
    _, ru, _, ld = _corners(E, C, T)
    rd = _rd_open(E_open if E_open2 is None else E_open2, C, T)
    q = jnp.einsum("abDR,RV->abDV", lu, ru)
    q = jnp.einsum("abDV,efVL->abefDL", q, rd)
    return jnp.einsum("abefDL,DL->abef", q, ld)


def rdm2x2_anti_dl(E_open, E, env: ENV, E_open2=None):
    """Unnormalized rho[s10, z10, s01, z01] of the anti-diagonal NNN
    pair ((1,0), (0,1)) — upper-right site FIRST in the output (the
    raw-order convention of the abelian ``rdm2x2_NNN_1n1``).
    ``E_open2`` (default ``E_open``) is used at the second (lower-left)
    site."""
    C, T = env.C, env.T
    lu, _, rd, _ = _corners(E, C, T)
    ru = _ru_open(E_open, C, T)
    ld = _ld_open(E_open if E_open2 is None else E_open2, C, T)
    q = jnp.einsum("DR,abRV->abDV", lu, ru)
    q = jnp.einsum("abDV,VL->abDL", q, rd)
    return jnp.einsum("abDL,efDL->abef", q, ld)
