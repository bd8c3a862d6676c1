"""Multi-site-cell double-layer (dl) CTM: directional moves over a
unit cell of explicit 4-leg double tensors ``E[c][U, L, D, R]`` with
fused (ket, bra) pair legs.

Generalizes the 1x1 engine (:mod:`tpeps.ctm.generic.dl`) to arbitrary
cells, mirroring the sl engine's coordinate bookkeeping
(:mod:`tpeps.ctm.generic.ctmrg` ``ctm_move``/``_absorb_*`` and the
reference's ``ctm_force_dl`` mode, ctm/generic/ctmrg.py:51-61): per
directional move one (P, Pt) pair per unique site, absorption shifts
the coordinate assignment by ``-direction``.  This lifts the 1x1-cell
ceiling of the fermionic double-layer stack — sign-dressed double
tensors from :mod:`tpeps.ctm.generic.dl_fermi` are per-site data, so
multi-site fermionic cells (e.g. the reference's 2x1/3x3 tv_model
states) run through the same machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .env import ENV, _zero_pad_into
from .projectors import projectors_from_matrices


# --------------------------------------------------------------- corners
# layouts mirror dl.py/_corners and components.py:
#   lu: [(down-chi . d-pair), (right-chi . r-pair)]
#   ru: [(left-chi . l-pair), (down-chi . d-pair)]
#   rd: [(up-chi . u-pair),   (left-chi . l-pair)]
#   ld: [(up-chi . u-pair),   (right-chi . r-pair)]


def _corner_lu(coord, Es, site_of, C, T):
    c = site_of(coord)
    E = Es[c]
    lu = jnp.einsum("xy,ymi->xmi", C[(c, (-1, -1))], T[(c, (0, -1))])
    lu = jnp.einsum("xmi,xjl->mijl", lu, T[(c, (-1, 0))])
    lu = jnp.einsum("mijl,mldr->jdir", lu, E)
    return lu.reshape(lu.shape[0] * lu.shape[1], lu.shape[2] * lu.shape[3])


def _corner_ru(coord, Es, site_of, C, T):
    c = site_of(coord)
    E = Es[c]
    ru = jnp.einsum("xy,ymb->xmb", C[(c, (1, -1))], T[(c, (1, 0))])
    ru = jnp.einsum("xmb,lnx->mbln", ru, T[(c, (0, -1))])
    ru = jnp.einsum("mbln,nkdm->lkbd", ru, E)
    return ru.reshape(ru.shape[0] * ru.shape[1], ru.shape[2] * ru.shape[3])


def _corner_rd(coord, Es, site_of, C, T):
    c = site_of(coord)
    E = Es[c]
    rd = jnp.einsum("xy,mly->xml", C[(c, (1, 1))], T[(c, (0, 1))])
    rd = jnp.einsum("xml,tnx->mltn", rd, T[(c, (1, 0))])
    rd = jnp.einsum("mltn,ukmn->tulk", rd, E)
    return rd.reshape(rd.shape[0] * rd.shape[1], rd.shape[2] * rd.shape[3])


def _corner_ld(coord, Es, site_of, C, T):
    c = site_of(coord)
    E = Es[c]
    ld = jnp.einsum("xy,txw->ytw", C[(c, (-1, 1))], T[(c, (-1, 0))])
    ld = jnp.einsum("ytw,myr->twmr", ld, T[(c, (0, 1))])
    ld = jnp.einsum("twmr,uwmk->turk", ld, E)
    return ld.reshape(ld.shape[0] * ld.shape[1], ld.shape[2] * ld.shape[3])


def _halves(direction, coord, Es, site_of, C, T):
    """R, Rt halves (compositions identical to components.halves_*)."""
    x, y = coord
    if direction == (0, -1):
        ru = _corner_ru(coord, Es, site_of, C, T)
        rd = _corner_rd((x, y + 1), Es, site_of, C, T)
        lu = _corner_lu((x - 1, y), Es, site_of, C, T)
        ld = _corner_ld((x - 1, y + 1), Es, site_of, C, T)
        return ru @ rd, jnp.einsum("ab,ac->bc", lu, ld)
    if direction == (-1, 0):
        lu = _corner_lu(coord, Es, site_of, C, T)
        ru = _corner_ru((x + 1, y), Es, site_of, C, T)
        ld = _corner_ld((x, y + 1), Es, site_of, C, T)
        rd = _corner_rd((x + 1, y + 1), Es, site_of, C, T)
        return lu @ ru, jnp.einsum("ab,cb->ac", ld, rd)
    if direction == (0, 1):
        ld = _corner_ld(coord, Es, site_of, C, T)
        lu = _corner_lu((x, y - 1), Es, site_of, C, T)
        rd = _corner_rd((x + 1, y), Es, site_of, C, T)
        ru = _corner_ru((x + 1, y - 1), Es, site_of, C, T)
        return (jnp.einsum("ab,ac->bc", ld, lu),
                jnp.einsum("ab,ca->bc", rd, ru))
    # (1, 0)
    rd = _corner_rd(coord, Es, site_of, C, T)
    ld = _corner_ld((x - 1, y), Es, site_of, C, T)
    ru = _corner_ru((x, y - 1), Es, site_of, C, T)
    lu = _corner_lu((x - 1, y - 1), Es, site_of, C, T)
    return (jnp.einsum("ab,cb->ac", rd, ld),
            jnp.einsum("ab,ca->bc", ru, lu))


# ------------------------------------------------------------- absorption
# per-direction absorptions mirror ctmrg._absorb_* with the dl (fused
# pair leg) contractions of dl.ctm_move_dl


def _absorb_up(c, Es, site_of, C, T, P, Pt, chi):
    E = Es[c]
    cr = site_of((c[0] + 1, c[1]))
    P2 = P[c].reshape(chi, E.shape[1], -1)
    Pt2 = Pt[c].reshape(chi, E.shape[1], -1)
    P1 = P[cr].reshape(chi, E.shape[3], -1)
    Pt1 = Pt[cr].reshape(chi, E.shape[3], -1)

    t = jnp.einsum("xy,ywb->xwb", C[(c, (1, -1))], T[(c, (1, 0))])
    nC1 = jnp.einsum("xwq,xwb->qb", Pt1, t)
    t = jnp.einsum("xy,xdn->ydn", C[(c, (-1, -1))], T[(c, (-1, 0))])
    nC2 = jnp.einsum("ydn,ynq->dq", t, P2)
    z = jnp.einsum("xur,xlq->urlq", T[(c, (0, -1))], Pt2)
    z = jnp.einsum("urlq,uldm->rqdm", z, E)
    nT = jnp.einsum("rqdm,rmp->qdp", z, P1)
    return nC1, nC2, nT


def _absorb_left(c, Es, site_of, C, T, P, Pt, chi):
    E = Es[c]
    cu = site_of((c[0], c[1] - 1))
    P2 = P[c].reshape(chi, E.shape[2], -1)
    Pt2 = Pt[c].reshape(chi, E.shape[2], -1)
    P1 = P[cu].reshape(chi, E.shape[0], -1)
    Pt1 = Pt[cu].reshape(chi, E.shape[0], -1)

    t = jnp.einsum("xy,ymr->xmr", C[(c, (-1, -1))], T[(c, (0, -1))])
    nC1 = jnp.einsum("xmq,xmr->qr", Pt1, t)
    t = jnp.einsum("xy,myr->xmr", C[(c, (-1, 1))], T[(c, (0, 1))])
    nC2 = jnp.einsum("xmq,xmr->qr", P2, t)
    z = jnp.einsum("tbw,tuq->bwuq", T[(c, (-1, 0))], P1)
    z = jnp.einsum("bwuq,uwdr->bqdr", z, E)
    nT = jnp.einsum("bqdr,bdp->qpr", z, Pt2)
    return nC1, nC2, nT


def _absorb_down(c, Es, site_of, C, T, P, Pt, chi):
    E = Es[c]
    cl = site_of((c[0] - 1, c[1]))
    P2 = P[c].reshape(chi, E.shape[3], -1)
    Pt2 = Pt[c].reshape(chi, E.shape[3], -1)
    P1 = P[cl].reshape(chi, E.shape[1], -1)
    Pt1 = Pt[cl].reshape(chi, E.shape[1], -1)

    t = jnp.einsum("xy,txn->ytn", C[(c, (-1, 1))], T[(c, (-1, 0))])
    nC1 = jnp.einsum("ytn,ynq->tq", t, Pt1)
    t = jnp.einsum("xy,twx->ytw", C[(c, (1, 1))], T[(c, (1, 0))])
    nC2 = jnp.einsum("ytw,ywq->tq", t, P2)
    z = jnp.einsum("mlr,lwq->mrwq", T[(c, (0, 1))], P1)
    z = jnp.einsum("mrwq,uwmc->rquc", z, E)
    nT = jnp.einsum("rquc,rcp->uqp", z, Pt2)
    return nC1, nC2, nT


def _absorb_right(c, Es, site_of, C, T, P, Pt, chi):
    E = Es[c]
    cd = site_of((c[0], c[1] + 1))
    P2 = P[c].reshape(chi, E.shape[0], -1)
    Pt2 = Pt[c].reshape(chi, E.shape[0], -1)
    P1 = P[cd].reshape(chi, E.shape[2], -1)
    Pt1 = Pt[cd].reshape(chi, E.shape[2], -1)

    t = jnp.einsum("xy,mly->xml", C[(c, (1, 1))], T[(c, (0, 1))])
    nC1 = jnp.einsum("xmq,xml->ql", Pt1, t)
    t = jnp.einsum("xy,lmx->ylm", C[(c, (1, -1))], T[(c, (0, -1))])
    nC2 = jnp.einsum("ylm,ymq->lq", t, P2)
    z = jnp.einsum("twb,tuq->wbuq", T[(c, (1, 0))], Pt2)
    z = jnp.einsum("wbuq,uldw->bqld", z, E)
    nT = jnp.einsum("bqld,bdp->qlp", z, P1)
    return nC1, nC2, nT


_ABSORB = {(0, -1): _absorb_up, (-1, 0): _absorb_left,
           (0, 1): _absorb_down, (1, 0): _absorb_right}
_REL = {
    (0, -1): {"nC1": (1, -1), "nC2": (-1, -1), "nT": (0, -1)},
    (-1, 0): {"nC1": (-1, -1), "nC2": (-1, 1), "nT": (-1, 0)},
    (0, 1): {"nC1": (-1, 1), "nC2": (1, 1), "nT": (0, 1)},
    (1, 0): {"nC1": (1, 1), "nC2": (1, -1), "nT": (1, 0)},
}


def _n(t):
    return t / jax.lax.stop_gradient(jnp.abs(t).max())


def ctm_move_dl_cell(direction, Es, site_of, C, T, chi, proj_kwargs):
    """One directional move over every unique site."""
    P, Pt = {}, {}
    for c in Es:
        R, Rt = _halves(direction, c, Es, site_of, C, T)
        P[c], Pt[c] = projectors_from_matrices(R, Rt, chi, **proj_kwargs)
    absorb = _ABSORB[direction]
    rel = _REL[direction]
    newC, newT = dict(C), dict(T)
    for c in Es:
        nC1, nC2, nT = absorb(c, Es, site_of, C, T, P, Pt, chi)
        nc = site_of((c[0] - direction[0], c[1] - direction[1]))
        newC[(nc, rel["nC1"])] = _n(nC1)
        newC[(nc, rel["nC2"])] = _n(nC2)
        newT[(nc, rel["nT"])] = _n(nT)
    return newC, newT


def init_env_dl_cell(Es, site_of, chi: int, vecs=None) -> ENV:
    """PBC-traced environment from the cell's double tensors (per-site
    mirror of dl.init_env_dl); ``vecs`` optionally maps
    ``(coord, leg_index)`` to the outward pair-closing vector."""
    from .dl import pair_trace_vec

    env = ENV(chi)

    def vec(c, E, ax):
        if vecs is not None and (c, ax) in vecs:
            return vecs[(c, ax)]
        Dk = int(round(E.shape[ax] ** 0.5))
        return pair_trace_vec(Dk, dtype=E.dtype)

    for c, E in Es.items():
        vu, vl, vd, vr = (vec(c, E, i) for i in range(4))
        env.C[(c, (-1, -1))] = _zero_pad_into(
            _n(jnp.einsum("uldr,u,l->dr", E, vu, vl)), (chi, chi), E.dtype)
        env.C[(c, (1, -1))] = _zero_pad_into(
            _n(jnp.einsum("uldr,u,r->ld", E, vu, vr)), (chi, chi), E.dtype)
        env.C[(c, (1, 1))] = _zero_pad_into(
            _n(jnp.einsum("uldr,d,r->ul", E, vd, vr)), (chi, chi), E.dtype)
        env.C[(c, (-1, 1))] = _zero_pad_into(
            _n(jnp.einsum("uldr,l,d->ur", E, vl, vd)), (chi, chi), E.dtype)
        env.T[(c, (0, -1))] = _zero_pad_into(
            _n(jnp.einsum("uldr,u->ldr", E, vu)), (chi, E.shape[2], chi), E.dtype)
        env.T[(c, (-1, 0))] = _zero_pad_into(
            _n(jnp.einsum("uldr,l->udr", E, vl)), (chi, chi, E.shape[3]), E.dtype)
        env.T[(c, (0, 1))] = _zero_pad_into(
            _n(jnp.einsum("uldr,d->ulr", E, vd)), (E.shape[0], chi, chi), E.dtype)
        env.T[(c, (1, 0))] = _zero_pad_into(
            _n(jnp.einsum("uldr,r->uld", E, vr)), (chi, E.shape[1], chi), E.dtype)
    return env


def run_dl_cell(Es, site_of, env: ENV, ctm_cfg):
    """Host loop to convergence (corner-spectra criterion, all corners)."""
    proj_kwargs = dict(
        svd_reltol=ctm_cfg.projector_svd_reltol,
        eps_multiplet=ctm_cfg.projector_eps_multiplet,
        multiplet_abstol=ctm_cfg.projector_multiplet_abstol,
        ad_decomp_reg=ctm_cfg.ad_decomp_reg,
    )
    chi = env.chi
    move_seq = tuple(tuple(d) for d in ctm_cfg.ctm_move_sequence)
    C, T = dict(env.C), dict(env.T)
    spec_prev = None
    history = {"conv_crit": []}
    for _ in range(ctm_cfg.ctm_max_iter):
        for direction in move_seq:
            C, T = ctm_move_dl_cell(direction, Es, site_of, C, T, chi,
                                    proj_kwargs)
        specs = [np.asarray(jnp.linalg.svd(C[k], compute_uv=False))
                 for k in sorted(C.keys())]
        spec = np.stack([s / max(s[0], 1e-300) for s in specs])
        if spec_prev is not None and spec.shape == spec_prev.shape:
            dist = float(np.linalg.norm(spec - spec_prev))
            history["conv_crit"].append(dist)
            if dist < ctm_cfg.ctm_conv_tol:
                break
        spec_prev = spec
    out = ENV(chi)
    out.C, out.T = C, T
    return out, history


# -------------------------------------------------------------- dl RDMs
# 1x1-window RDM over an open double tensor at ``coord``; the closed
# tensors of the cell live in the environment already.


def rdm1x1_dl_cell(coord, E_open, site_of, env: ENV):
    """Unnormalized rho[s, z] at ``coord`` from the cell environment
    (exactly dl.rdm1x1_dl with coordinate-keyed C/T)."""
    c = site_of(coord)
    C, T = env.C, env.T
    q = jnp.einsum("xy,ymz->xmz", C[(c, (-1, -1))], T[(c, (0, -1))])
    q = jnp.einsum("xmz,xwl->mzwl", q, T[(c, (-1, 0))])
    q = jnp.einsum("mzwl,bcmldr->bczwdr", q, E_open)
    q = jnp.einsum("bczwdr,zp->bcpwdr", q, C[(c, (1, -1))])
    q = jnp.einsum("bcpwdr,prv->bcwdv", q, T[(c, (1, 0))])
    q = jnp.einsum("bcwdv,wy->bcydv", q, C[(c, (-1, 1))])
    q = jnp.einsum("bcydv,dyu->bcuv", q, T[(c, (0, 1))])
    return jnp.einsum("bcuv,vu->bc", q, C[(c, (1, 1))])


def rdm2x1_dl_cell(coord, Eo0, Eo1, site_of, env: ENV):
    """Unnormalized rho[s0, z0, s1, z1] of the horizontal pair
    ``coord``, ``coord + (1, 0)`` (dl.rdm2x1_dl with per-column
    coordinate-keyed environment rows)."""
    C, T = env.C, env.T
    x, y = coord
    c0, c1 = site_of((x, y)), site_of((x + 1, y))
    q = jnp.einsum("xy,ymz->xmz", C[(c0, (-1, -1))], T[(c0, (0, -1))])
    q = jnp.einsum("xmz,xwl->mzwl", q, T[(c0, (-1, 0))])
    q = jnp.einsum("mzwl,abmldr->abzwdr", q, Eo0)
    q = jnp.einsum("abzwdr,wv->abzvdr", q, C[(c0, (-1, 1))])
    q = jnp.einsum("abzvdr,dvu->abzru", q, T[(c0, (0, 1))])
    q = jnp.einsum("abzru,znw->abrunw", q, T[(c1, (0, -1))])
    q = jnp.einsum("abrunw,efnrds->abefuwds", q, Eo1)
    q = jnp.einsum("abefuwds,dug->abefwsg", q, T[(c1, (0, 1))])
    q = jnp.einsum("abefwsg,wp->abefpsg", q, C[(c1, (1, -1))])
    q = jnp.einsum("abefpsg,pst->abeftg", q, T[(c1, (1, 0))])
    return jnp.einsum("abeftg,tg->abef", q, C[(c1, (1, 1))])


def rdm1x2_dl_cell(coord, Eo0, Eo1, site_of, env: ENV):
    """Unnormalized rho[s0, z0, s1, z1] of the vertical pair ``coord``,
    ``coord + (0, 1)`` (site1 below site0)."""
    C, T = env.C, env.T
    x, y = coord
    c0, c1 = site_of((x, y)), site_of((x, y + 1))
    q = jnp.einsum("xy,ymz->xmz", C[(c0, (-1, -1))], T[(c0, (0, -1))])
    q = jnp.einsum("xmz,zp->xmp", q, C[(c0, (1, -1))])
    q = jnp.einsum("xmp,prv->xmrv", q, T[(c0, (1, 0))])
    q = jnp.einsum("xmrv,xwl->mrvwl", q, T[(c0, (-1, 0))])
    q = jnp.einsum("mrvwl,abmldr->abvwd", q, Eo0)
    q = jnp.einsum("abvwd,wcl->abvdcl", q, T[(c1, (-1, 0))])
    q = jnp.einsum("abvdcl,efdlgr->abefvcgr", q, Eo1)
    q = jnp.einsum("abefvcgr,vrt->abefcgt", q, T[(c1, (1, 0))])
    q = jnp.einsum("abefcgt,cy->abefygt", q, C[(c1, (-1, 1))])
    q = jnp.einsum("abefygt,gyu->abefut", q, T[(c1, (0, 1))])
    return jnp.einsum("abefut,tu->abef", q, C[(c1, (1, 1))])


# open 2x2 corners with coordinate-keyed environment (mirrors of
# dl._lu_open/_ru_open/_rd_open/_ld_open)


def _corner_lu_open(coord, Eo, site_of, C, T):
    c = site_of(coord)
    q = jnp.einsum("xy,ymi->xmi", C[(c, (-1, -1))], T[(c, (0, -1))])
    q = jnp.einsum("xmi,xjl->mijl", q, T[(c, (-1, 0))])
    q = jnp.einsum("mijl,abmldr->abjdir", q, Eo)
    sh = q.shape
    return q.reshape(sh[0], sh[1], sh[2] * sh[3], sh[4] * sh[5])


def _corner_ru_open(coord, Eo, site_of, C, T):
    c = site_of(coord)
    q = jnp.einsum("xy,ymb->xmb", C[(c, (1, -1))], T[(c, (1, 0))])
    q = jnp.einsum("xmb,lnx->mbln", q, T[(c, (0, -1))])
    q = jnp.einsum("mbln,pqnkdm->pqlkbd", q, Eo)
    sh = q.shape
    return q.reshape(sh[0], sh[1], sh[2] * sh[3], sh[4] * sh[5])


def _corner_rd_open(coord, Eo, site_of, C, T):
    c = site_of(coord)
    q = jnp.einsum("xy,mly->xml", C[(c, (1, 1))], T[(c, (0, 1))])
    q = jnp.einsum("xml,tnx->mltn", q, T[(c, (1, 0))])
    q = jnp.einsum("mltn,abukmn->abtulk", q, Eo)
    sh = q.shape
    return q.reshape(sh[0], sh[1], sh[2] * sh[3], sh[4] * sh[5])


def _corner_ld_open(coord, Eo, site_of, C, T):
    c = site_of(coord)
    q = jnp.einsum("xy,txw->ytw", C[(c, (-1, 1))], T[(c, (-1, 0))])
    q = jnp.einsum("ytw,myr->twmr", q, T[(c, (0, 1))])
    q = jnp.einsum("twmr,pquwmk->pqturk", q, Eo)
    sh = q.shape
    return q.reshape(sh[0], sh[1], sh[2] * sh[3], sh[4] * sh[5])


def rdm2x2_diag_dl_cell(coord, Eo0, Eo1, Es, site_of, env: ENV):
    """Unnormalized rho[s00, z00, s11, z11] of the diagonal NNN pair
    (``coord``, ``coord + (1, 1)``), closed cell tensors at the
    off-diagonal sites."""
    x, y = coord
    C, T = env.C, env.T
    lu = _corner_lu_open(coord, Eo0, site_of, C, T)
    ru = _corner_ru((x + 1, y), Es, site_of, C, T)
    rd = _corner_rd_open((x + 1, y + 1), Eo1, site_of, C, T)
    ld = _corner_ld((x, y + 1), Es, site_of, C, T)
    q = jnp.einsum("abDR,RV->abDV", lu, ru)
    q = jnp.einsum("abDV,efVL->abefDL", q, rd)
    return jnp.einsum("abefDL,DL->abef", q, ld)


def rdm2x2_anti_dl_cell(coord, Eo0, Eo1, Es, site_of, env: ENV):
    """Unnormalized rho[s10, z10, s01, z01] of the anti-diagonal NNN
    pair (``coord + (1, 0)``, ``coord + (0, 1)``) — upper-right site
    FIRST (the dl.rdm2x2_anti_dl convention)."""
    x, y = coord
    C, T = env.C, env.T
    lu = _corner_lu(coord, Es, site_of, C, T)
    ru = _corner_ru_open((x + 1, y), Eo0, site_of, C, T)
    rd = _corner_rd((x + 1, y + 1), Es, site_of, C, T)
    ld = _corner_ld_open((x, y + 1), Eo1, site_of, C, T)
    q = jnp.einsum("DR,abRV->abDV", lu, ru)
    q = jnp.einsum("abDV,VL->abDL", q, rd)
    return jnp.einsum("abDL,efDL->abef", q, ld)
