"""Reduced density matrices for generic unit-cell iPEPS.

Counterpart of reference ctm/generic/rdm.py:71-1676 (the subset needed
by the model zoo: 1x1, 2x1, 1x2, 2x2 and its diagonal-pair variants).
Built from the single-layer open corners of
:mod:`tpeps.ctm.generic.components`; no D^4 double-layer tensor.

Conventions: ``rho[s_0..s_n, s'_0..s'_n]``, unprimed = ket
(non-conjugated) layer; site order for 2x2 is::

    s0 s1
    s2 s3

with ``coord`` the upper-left site (reference rdm.py:1306-1593).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..c4v.rdm import _sym_pos_def_rdm  # same helper semantics
from .components import corner_ld, corner_lu, corner_rd, corner_ru


def rdm1x1(coord, sites, site_of, C, T, sym_pos_def: bool = False):
    """1-site RDM (reference rdm.py:71-258)."""
    c = site_of(coord)
    a = sites[c]
    d0, d1, d2, d3, d4 = a.shape
    chi = C[(c, (-1, -1))].shape[0]

    Tl = T[(c, (-1, 0))].reshape(chi, chi, d2, d2)
    Tt = T[(c, (0, -1))].reshape(chi, d1, d1, chi)
    Tb = T[(c, (0, 1))].reshape(d3, d3, chi, chi)
    Tr = T[(c, (1, 0))].reshape(chi, d4, d4, chi)

    # left column C-T-C
    L = jnp.einsum("xy,xblk->yblk", C[(c, (-1, -1))], Tl)
    L = jnp.einsum("yblk,bw->ylkw", L, C[(c, (-1, 1))])
    # attach top and bottom edges
    q = jnp.einsum("ylkw,yuvi->lkwuvi", L, Tt)
    q = jnp.einsum("lkwuvi,dewj->lkuvidej", q, Tb)
    # ket and bra layers
    q = jnp.einsum("lkuvidej,suldr->kviejsr", q, a)
    q = jnp.einsum("kviejsr,zvkeg->ijsrzg", q, jnp.conj(a))
    # right column C-T-C
    R = jnp.einsum("pq,qmnb->pmnb", C[(c, (1, -1))], Tr)
    R = jnp.einsum("pmnb,bj->pmnj", R, C[(c, (1, 1))])
    rho = jnp.einsum("ijsrzg,irgj->sz", q, R)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x1(coord, sites, site_of, C, T, sym_pos_def: bool = False):
    """Horizontal 2-site RDM of (coord, coord+(1,0))
    (reference rdm.py:304-570)."""
    c0 = site_of(coord)
    c1 = site_of((coord[0] + 1, coord[1]))
    a0, a1 = sites[c0], sites[c1]
    chi = C[(c0, (-1, -1))].shape[0]

    lu = corner_lu(coord, sites, site_of, C, T, open_phys=True)
    ru = corner_ru((coord[0] + 1, coord[1]), sites, site_of, C, T, open_phys=True)

    # bottom-left C2x1: C(-1,1) + T(0,1) of site0
    Tb0 = T[(c0, (0, 1))].reshape(a0.shape[3], a0.shape[3], chi, chi)
    cb0 = jnp.einsum("xy,deyj->xdej", C[(c0, (-1, 1))], Tb0)
    lu5 = lu.reshape(chi, a0.shape[3], a0.shape[3], lu.shape[1], *lu.shape[2:])
    lh = jnp.einsum("xdersz,xdej->rszj", lu5, cb0)

    # bottom-right C2x1: T(0,1) of site1 + C(1,1)
    Tb1 = T[(c1, (0, 1))].reshape(a1.shape[3], a1.shape[3], chi, chi)
    cb1 = jnp.einsum("dely,xy->xdel", Tb1, C[(c1, (1, 1))])
    ru5 = ru.reshape(ru.shape[0], chi, a1.shape[3], a1.shape[3], *ru.shape[2:])
    rh = jnp.einsum("lxdesz,xdej->lszj", ru5, cb1)

    rho = jnp.einsum("rszj,rwvj->szwv", lh, rh)
    rho = rho.transpose(0, 2, 1, 3)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm1x2(coord, sites, site_of, C, T, sym_pos_def: bool = False):
    """Vertical 2-site RDM of (coord, coord+(0,1))
    (reference rdm.py:571-960)."""
    c0 = site_of(coord)
    c1 = site_of((coord[0], coord[1] + 1))
    a0, a1 = sites[c0], sites[c1]
    chi = C[(c0, (-1, -1))].shape[0]

    lu = corner_lu(coord, sites, site_of, C, T, open_phys=True)
    ld = corner_ld((coord[0], coord[1] + 1), sites, site_of, C, T, open_phys=True)

    # top-right column piece: C(1,-1) + T(1,0) of site0
    Tr0 = T[(c0, (1, 0))].reshape(chi, a0.shape[4], a0.shape[4], chi)
    rt0 = jnp.einsum("pq,qmnb->pmnb", C[(c0, (1, -1))], Tr0)
    lu5 = lu.reshape(lu.shape[0], chi, a0.shape[4], a0.shape[4], *lu.shape[2:])
    th = jnp.einsum("dpmnsz,pmnb->dszb", lu5, rt0)

    # bottom-right column piece: T(1,0) of site1 + C(1,1)
    Tr1 = T[(c1, (1, 0))].reshape(chi, a1.shape[4], a1.shape[4], chi)
    rb1 = jnp.einsum("tmnb,bl->tmnl", Tr1, C[(c1, (1, 1))])
    ld5 = ld.reshape(ld.shape[0], chi, a1.shape[4], a1.shape[4], *ld.shape[2:])
    bh = jnp.einsum("ulmnsz,tmnl->uszt", ld5, rb1)

    rho = jnp.einsum("dszb,dwvb->szwv", th, bh)
    rho = rho.transpose(0, 2, 1, 3)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def _four_corners(coord, sites, site_of, C, T, open_flags):
    """Corners of the 2x2 patch with upper-left at ``coord``; each of
    (lu, ru, ld, rd) optionally open."""
    x, y = coord
    lu = corner_lu((x, y), sites, site_of, C, T, open_phys=open_flags[0])
    ru = corner_ru((x + 1, y), sites, site_of, C, T, open_phys=open_flags[1])
    ld = corner_ld((x, y + 1), sites, site_of, C, T, open_phys=open_flags[2])
    rd = corner_rd((x + 1, y + 1), sites, site_of, C, T, open_phys=open_flags[3])
    return lu, ru, ld, rd


def rdm2x2(coord, sites, site_of, C, T, sym_pos_def: bool = False):
    """Full 2x2 RDM, sites (s0,s1;s2,s3) row-major from ``coord``
    (reference rdm.py:1306-1593)."""
    lu, ru, ld, rd = _four_corners(coord, sites, site_of, C, T, (1, 1, 1, 1))
    # upper half: contract lu.right with ru.left
    uh = jnp.einsum("xrab,rycd->xyabcd", lu, ru)
    # lower half: contract ld.right with rd.left
    lh = jnp.einsum("xrab,yrcd->xyabcd", ld, rd)
    rho = jnp.einsum("xyabcd,xyefgh->abcdefgh", uh, lh)
    # [s0,z0,s1,z1,s2,z2,s3,z3] -> (s0,s1,s2,s3, z0,z1,z2,z3)
    rho = rho.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x2_NNN_11(coord, sites, site_of, C, T, sym_pos_def: bool = False):
    """Diagonal pair (coord, coord+(1,1)) from a 2x2 patch
    (reference rdm.py:962-1143)."""
    lu, ru, ld, rd = _four_corners(coord, sites, site_of, C, T, (1, 0, 0, 1))
    uh = jnp.einsum("xrab,ry->xyab", lu, ru)
    lh = jnp.einsum("xr,yrcd->xycd", ld, rd)
    rho = jnp.einsum("xyab,xycd->abcd", uh, lh)
    rho = rho.transpose(0, 2, 1, 3)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x2_NNN_1n1(coord, sites, site_of, C, T, sym_pos_def: bool = False):
    """Anti-diagonal pair (coord, coord+(1,-1)); ``coord`` is the
    lower-left site of the 2x2 patch (reference rdm.py:1051-1092).
    Site order: (s0 = lower-left, s1 = upper-right)."""
    coord = (coord[0], coord[1] - 1)  # patch upper-left
    lu, ru, ld, rd = _four_corners(coord, sites, site_of, C, T, (0, 1, 1, 0))
    uh = jnp.einsum("xr,rycd->xycd", lu, ru)
    lh = jnp.einsum("xrab,yr->xyab", ld, rd)
    rho = jnp.einsum("xycd,xyab->abcd", uh, lh)
    rho = rho.transpose(0, 2, 1, 3)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def norm_3x3(coord, sites, site_of, C, T):
    """Norm of the 3x3 patch around ``coord``: boundary edge + one
    transfer column + closing edge (reference rdm.py:2741-2746
    ``norm_3x3``, built from the corrf edge helpers)."""
    from . import corrf

    E = corrf.get_edge(coord, (-1, 0), sites, site_of, C, T)
    E = corrf.apply_TM_1sO(coord, (0, 1), sites, site_of, C, T, E)
    return corrf.apply_edge(coord, (0, 1), sites, site_of, C, T, E)


def aux_rdm0x1(coord, sites, site_of, C, T):
    """Auxiliary 0x1 "bond" RDM: the pure-environment network of the
    vertical bond column between ``coord-(1,0)`` and ``coord`` with the
    two facing aux D-pairs open (reference rdm.py:2816-2858
    ``aux_rdm0x1``).  Returns ``rho[l_ket, r_ket, l_bra, r_bra]`` with
    ``l`` = T4(coord)'s right-facing pair, ``r`` = T2(coord-(1,0))'s
    left-facing pair."""
    c = site_of(coord)
    cn = site_of((coord[0] - 1, coord[1]))
    a = sites[c]
    D = a.shape[2]
    chi = C[(c, (-1, -1))].shape[0]
    T4 = T[(c, (-1, 0))].reshape(chi, chi, D, D)
    Dn = sites[cn].shape[4]
    T2 = T[(cn, (1, 0))].reshape(chi, Dn, Dn, chi)
    # left column: C1-T4-C4 of coord; right column: C2-T2-C3 of coord-(1,0)
    Lc = jnp.einsum("xy,xwab->ywab", C[(c, (-1, -1))], T4)
    Lc = jnp.einsum("ywab,wz->yzab", Lc, C[(c, (-1, 1))])
    Rc = jnp.einsum("yp,pcdw->ycdw", C[(cn, (1, -1))], T2)
    Rc = jnp.einsum("ycdw,wz->ycdz", Rc, C[(cn, (1, 1))])
    rho = jnp.einsum("yzab,ycdz->acbd", Lc, Rc)
    return rho


def aux_rdm1x1(coord, sites, site_of, C, T):
    """Auxiliary 1-site RDM: the C-T ring around ``coord`` with all four
    aux D-pairs open, kets first (reference rdm.py:2860-2912
    ``aux_rdm1x1``); ``rho[u,l,d,r, u',l',d',r']``."""
    c = site_of(coord)
    a = sites[c]
    d0, d1, d2, d3, d4 = a.shape
    chi = C[(c, (-1, -1))].shape[0]
    Tl = T[(c, (-1, 0))].reshape(chi, chi, d2, d2)
    Tt = T[(c, (0, -1))].reshape(chi, d1, d1, chi)
    Tb = T[(c, (0, 1))].reshape(d3, d3, chi, chi)
    Tr = T[(c, (1, 0))].reshape(chi, d4, d4, chi)
    L = jnp.einsum("xy,xblk->yblk", C[(c, (-1, -1))], Tl)
    L = jnp.einsum("yblk,bw->ylkw", L, C[(c, (-1, 1))])
    q = jnp.einsum("ylkw,yuvi->lkwuvi", L, Tt)
    q = jnp.einsum("lkwuvi,dewj->lkuvidej", q, Tb)
    R = jnp.einsum("pq,qmnb->pmnb", C[(c, (1, -1))], Tr)
    R = jnp.einsum("pmnb,bj->pmnj", R, C[(c, (1, 1))])
    rho = jnp.einsum("lkuvidej,irgj->uvlkderg", q, R)
    # pairs are (ket, bra) per leg in order (u, l, d, r) -> kets first
    return rho.transpose(0, 2, 4, 6, 1, 3, 5, 7)


def aux_rdm1x2(coord, sites, site_of, C, T):
    """Auxiliary 1x2 RDM: the C-T ring around the horizontal pair
    (coord, coord+(1,0)) with the six boundary aux D-pairs open, in
    anti-clockwise order (u0, l0, d0, d1, r1, u1), kets first
    (reference rdm.py:2913-2963 ``aux_rdm1x2``).

    Note: the reference builds BOTH columns from ``coord``'s environment
    tensors (rdm.py:2934-2935), exact only for 1-site cells; here each
    column uses its own site's tensors (equal on 1-site cells, validated
    there against the oracle in tests/test_rdm_tail.py)."""
    x, y = coord
    c0 = site_of((x, y))
    c1 = site_of((x + 1, y))
    a0, a1 = sites[c0], sites[c1]
    chi = C[(c0, (-1, -1))].shape[0]
    Tl = T[(c0, (-1, 0))].reshape(chi, chi, a0.shape[2], a0.shape[2])
    Tt0 = T[(c0, (0, -1))].reshape(chi, a0.shape[1], a0.shape[1], chi)
    Tb0 = T[(c0, (0, 1))].reshape(a0.shape[3], a0.shape[3], chi, chi)
    Tt1 = T[(c1, (0, -1))].reshape(chi, a1.shape[1], a1.shape[1], chi)
    Tb1 = T[(c1, (0, 1))].reshape(a1.shape[3], a1.shape[3], chi, chi)
    Tr = T[(c1, (1, 0))].reshape(chi, a1.shape[4], a1.shape[4], chi)
    # left half: C1-T4-C4 ring closed with Tt0/Tb0
    L = jnp.einsum("xy,xblk->yblk", C[(c0, (-1, -1))], Tl)
    L = jnp.einsum("yblk,bw->ylkw", L, C[(c0, (-1, 1))])
    L = jnp.einsum("ylkw,yuvi->lkwuvi", L, Tt0)
    L = jnp.einsum("lkwuvi,dewj->lkuvidej", L, Tb0)
    # right half: C2-T2-C3 ring closed with Tt1/Tb1
    R = jnp.einsum("pq,qmnb->pmnb", C[(c1, (1, -1))], Tr)
    R = jnp.einsum("pmnb,bj->pmnj", R, C[(c1, (1, 1))])
    R = jnp.einsum("iuvp,pmnj->iuvmnj", Tt1, R)
    R = jnp.einsum("iuvmnj,dewj->iuvmndew", R, Tb1)
    rho = jnp.einsum("lkuvidej,iUVmnDEj->uvlkdeDEmnUV", L, R)
    # anti-clockwise (u0, l0, d0, d1, r1, u1), kets first
    return rho.transpose(0, 2, 4, 6, 8, 10, 1, 3, 5, 7, 9, 11)
