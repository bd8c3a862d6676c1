"""Partial (bra-only) 2x2 RDMs for imaginary-time evolution.

Counterpart of reference ctm/generic/rdm_itevol.py:10-434: the 2x2
window network WITHOUT the ket layer — the environment is contracted
with the conjugated on-site tensors only, leaving the ket-facing aux
legs and the physical legs open.  Evolution loops (full update /
fast-full update style) precompute this object once per environment
and then evaluate overlaps ``<psi(A)|psi(A')>`` for many candidate
``A'`` at the cost of a small contraction
(:func:`fidelity_rdm2x2`).
"""

from __future__ import annotations

import jax.numpy as jnp


def _split(t, axis, D):
    sh = list(t.shape)
    sh[axis:axis + 1] = [D, D]
    return t.reshape(sh)


def _p_lu(coord, sites, site_of, C, T):
    c = site_of(coord)
    B = jnp.conj(sites[c])
    D = B.shape[1]
    tu = _split(T[(c, (0, -1))], 1, D)   # [y, uk, ub, z]
    tl = _split(T[(c, (-1, 0))], 2, D)   # [x, w, lk, lb]
    q = jnp.einsum("xy,yabz->xabz", C[(c, (-1, -1))], tu)
    q = jnp.einsum("xabz,xwcm->abzwcm", q, tl)
    q = jnp.einsum("abzwcm,sbmdr->azwcsdr", q, B)
    # [ku(a), z, w, kl(c), s, bd(d), br(r)] -> [(w,d),(z,r),ku,kl,s]
    q = q.transpose(2, 5, 1, 6, 0, 3, 4)
    sh = q.shape
    return q.reshape(sh[0] * sh[1], sh[2] * sh[3], sh[4], sh[5], sh[6])


def _p_ru(coord, sites, site_of, C, T):
    c = site_of(coord)
    B = jnp.conj(sites[c])
    D = B.shape[1]
    tr = _split(T[(c, (1, 0))], 1, D)    # [p, rk, rb, v]
    tu = _split(T[(c, (0, -1))], 1, D)   # [y, uk, ub, z]
    q = jnp.einsum("zp,pabv->zabv", C[(c, (1, -1))], tr)
    q = jnp.einsum("zabv,yucz->abvyuc", q, tu)
    q = jnp.einsum("abvyuc,scldb->avyulsd", q, B)
    # [kr(a), v, y, ku(u), bl(l), s, bd(d)] -> [(y,l),(v,d),ku,kr,s]
    q = q.transpose(2, 4, 1, 6, 3, 0, 5)
    sh = q.shape
    return q.reshape(sh[0] * sh[1], sh[2] * sh[3], sh[4], sh[5], sh[6])


def _p_rd(coord, sites, site_of, C, T):
    c = site_of(coord)
    B = jnp.conj(sites[c])
    D = B.shape[1]
    td = _split(T[(c, (0, 1))], 0, D)    # [dk, db, y, u]
    tr = _split(T[(c, (1, 0))], 1, D)    # [t, rk, rb, v]
    q = jnp.einsum("vu,efyu->vefy", C[(c, (1, 1))], td)
    q = jnp.einsum("vefy,tghv->efytgh", q, tr)
    q = jnp.einsum("efytgh,sulfh->eytgsul", q, B)
    # [kd(e), y, t, kr(g), s, bu(u), bl(l)] -> [(t,u),(y,l),kd,kr,s]
    q = q.transpose(2, 5, 1, 6, 0, 3, 4)
    sh = q.shape
    return q.reshape(sh[0] * sh[1], sh[2] * sh[3], sh[4], sh[5], sh[6])


def _p_ld(coord, sites, site_of, C, T):
    c = site_of(coord)
    B = jnp.conj(sites[c])
    D = B.shape[1]
    tl = _split(T[(c, (-1, 0))], 2, D)   # [x, w, lk, lb]
    td = _split(T[(c, (0, 1))], 0, D)    # [dk, db, y, r]
    q = jnp.einsum("wy,xwcm->yxcm", C[(c, (-1, 1))], tl)
    q = jnp.einsum("yxcm,efyr->xcmefr", q, td)
    q = jnp.einsum("xcmefr,sumfb->xcersub", q, B)
    # [x, kl(c), kd(e), r, s, bu(u), br(b)] -> [(x,u),(r,b),kl,kd,s]
    q = q.transpose(0, 5, 3, 6, 1, 2, 4)
    sh = q.shape
    return q.reshape(sh[0] * sh[1], sh[2] * sh[3], sh[4], sh[5], sh[6])


def partial_rdm2x2(coord, sites, site_of, C, T):
    """Bra-only 2x2 window (reference rdm_itevol.py:248-356).

    :return: 12-leg tensor ordered per site (00, 10, 01, 11) as
        ``(ket-aux, ket-aux, phys)`` with aux legs anticlockwise from
        up: 00: (u, l, s); 10: (u, r, s); 01: (l, d, s); 11: (d, r, s).
    """
    x, y = coord
    lu = _p_lu(coord, sites, site_of, C, T)
    ru = _p_ru((x + 1, y), sites, site_of, C, T)
    ld = _p_ld((x, y + 1), sites, site_of, C, T)
    rd = _p_rd((x + 1, y + 1), sites, site_of, C, T)
    upper = jnp.einsum("drabs,rvcet->dvabscet", lu, ru)
    lower = jnp.einsum("drfgp,vrhkq->dvfgphkq", ld, rd)
    return jnp.einsum("dvabscet,dvfgphkq->abscetfgphkq", upper, lower)


def fidelity_rdm2x2(prdm, kets):
    """Overlap ``<psi_env-bra | A'_00 A'_10 A'_01 A'_11>`` of a
    partial 2x2 RDM with a candidate ket 2x2 patch (reference
    rdm_itevol.py:357-434).

    :param prdm: output of :func:`partial_rdm2x2`
    :param kets: dict with keys (0,0),(1,0),(0,1),(1,1) of site tensors
        ``A[s,u,l,d,r]`` (relative coordinates within the window)
    """
    A00, A10 = kets[(0, 0)], kets[(1, 0)]
    A01, A11 = kets[(0, 1)], kets[(1, 1)]
    # prdm legs: a=u0 b=l0 c=s0  d=u1 e=r1 f=s1  g=l2 h=d2 i=s2
    #            j=d3 k=r3 l=s3 ; internal ket bonds X,Y,Z,W
    return jnp.einsum(
        "abcdefghijkl,cabYX,fdXZe,iYghW,lZWjk->",
        prdm, A00, A10, A01, A11)
