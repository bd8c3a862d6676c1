"""Enlarged 2x2 corners and 4x4 halves for the generic CTM.

Counterpart of reference ctm/generic/ctm_components.py:10-884, single
layer only (the D^4 double-layer tensor is never built; XLA fuses the
layer-by-layer contractions).  Corner matrix conventions (closed form;
``open_phys=True`` appends (s, s') physical indices)::

    c2x2_lu:  [ (down-chi . d-pair),  (right-chi . r-pair) ]
    c2x2_ru:  [ (left-chi . l-pair),  (down-chi . d-pair) ]
    c2x2_rd:  [ (up-chi . u-pair),    (left-chi . l-pair) ]
    c2x2_ld:  [ (up-chi . u-pair),    (right-chi . r-pair) ]

All functions take raw jnp arrays; fused D^2 legs split as (ket, bra)
with ket (non-conjugated layer) major.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _split2(T, axis, D):
    """Unfuse a D^2 leg at position ``axis`` into (ket, bra) of dim D."""
    sh = list(T.shape)
    sh[axis : axis + 1] = [D, D]
    return T.reshape(sh)


def _split4(T, axis, Dk, Db):
    """Unfuse a (Dket * Dbra) leg at ``axis`` (overlap envs allow
    different bond dimensions on the two layers)."""
    sh = list(T.shape)
    sh[axis : axis + 1] = [Dk, Db]
    return T.reshape(sh)


def _sum_over_phys(f, a):
    """``sum_s f(a[s])`` via ``lax.scan`` — bounds the peak corner
    intermediate by 1/d (the reference's index-unrolled loops,
    oe_ext/oe_ext.py:513 ``contract_with_unroll``; here the physical
    index is the only one coupling ket and bra layers).  Required for
    large-d coarse-grained models (maple-leaf d=2^6)."""
    import jax

    shape = jax.eval_shape(f, a[0])

    def step(acc, a_s):
        return acc + f(a_s), None

    acc, _ = lax.scan(step, jnp.zeros(shape.shape, shape.dtype), a)
    return acc


def c2x2_lu(C, Tt, Tl, a, open_phys: bool = False, slice_phys: bool = False,
            bra=None):
    """Upper-left corner from C(-1,-1), T(0,-1), T(-1,0), site
    (reference ctm_components.py:372-433 ``c2x2_LU_sl_c``).

    ``slice_phys``: contract the ket/bra layers one physical component
    at a time (``lax.scan``/``lax.map``), dividing the peak intermediate
    by d — the large-d (maple-leaf) memory mode."""
    d = a.shape[0]
    b = a if bra is None else bra
    Tt4 = _split4(Tt, 1, a.shape[1], b.shape[1])  # [y(left), u, v, i(right)]
    Tl4 = _split4(Tl, 2, a.shape[2], b.shape[2])  # [x(up), j(down), l, k]
    q = jnp.einsum("xy,yuvi->xuvi", C, Tt4)
    q = jnp.einsum("xuvi,xjlk->uvijlk", q, Tl4)
    if slice_phys:
        if open_phys:
            def term(a_s):  # ket slice; bra z stays open
                t = jnp.einsum("uvijlk,uler->vijker", q, a_s)
                return jnp.einsum("vijker,zvkfg->jefirgz", t, jnp.conj(a))
            out = lax.map(term, a)  # [s, j,e,f,i,r,g,z]
            out = jnp.moveaxis(out, 0, 6)  # [j,e,f,i,r,g,s,z]
            return out.reshape(
                out.shape[0] * a.shape[3] ** 2, out.shape[3] * a.shape[4] ** 2, d, d
            )
        def term(a_s):
            t = jnp.einsum("uvijlk,uler->vijker", q, a_s)
            return jnp.einsum("vijker,vkfg->jefirg", t, jnp.conj(a_s))
        out = _sum_over_phys(term, a)
        return out.reshape(out.shape[0] * a.shape[3] ** 2, out.shape[3] * a.shape[4] ** 2)
    q = jnp.einsum("uvijlk,suler->vijkser", q, a)
    if open_phys:
        out = jnp.einsum("vijkser,zvkfg->jefirgsz", q, jnp.conj(b))
        return out.reshape(
            out.shape[0] * a.shape[3] * b.shape[3],
            out.shape[3] * a.shape[4] * b.shape[4], d, d
        )
    out = jnp.einsum("vijkser,svkfg->jefirg", q, jnp.conj(b))
    return out.reshape(out.shape[0] * a.shape[3] * b.shape[3],
                       out.shape[3] * a.shape[4] * b.shape[4])


def c2x2_ru(C, Tr, Tt, a, open_phys: bool = False, slice_phys: bool = False,
            bra=None):
    """Upper-right corner from C(1,-1), T(1,0), T(0,-1), site
    (reference ctm_components.py:530-590 ``c2x2_RU_sl_c``)."""
    d = a.shape[0]
    b = a if bra is None else bra
    Tr4 = _split4(Tr, 1, a.shape[4], b.shape[4])  # [t(up), w, v, b(down)]
    Tt4 = _split4(Tt, 1, a.shape[1], b.shape[1])  # [l(left), m, n, x(right)]
    q = jnp.einsum("xy,ywvb->xwvb", C, Tr4)
    q = jnp.einsum("xwvb,lmnx->wvblmn", q, Tt4)
    if slice_phys:
        if open_phys:
            def term(a_s):
                t = jnp.einsum("wvblmn,megw->vblneg", q, a_s)
                return jnp.einsum("vblneg,znfhv->lefbghz", t, jnp.conj(a))
            out = lax.map(term, a)
            out = jnp.moveaxis(out, 0, 6)
            return out.reshape(
                out.shape[0] * a.shape[2] ** 2, out.shape[3] * a.shape[3] ** 2, d, d
            )
        def term(a_s):
            t = jnp.einsum("wvblmn,megw->vblneg", q, a_s)
            return jnp.einsum("vblneg,nfhv->lefbgh", t, jnp.conj(a_s))
        out = _sum_over_phys(term, a)
        return out.reshape(out.shape[0] * a.shape[2] ** 2, out.shape[3] * a.shape[3] ** 2)
    # ket layer: a[s, u=m, l=e, d=g, r=w]
    q = jnp.einsum("wvblmn,smegw->vblnseg", q, a)
    if open_phys:
        out = jnp.einsum("vblnseg,znfhv->lefbghsz", q, jnp.conj(b))
        return out.reshape(
            out.shape[0] * a.shape[2] * b.shape[2],
            out.shape[3] * a.shape[3] * b.shape[3], d, d
        )
    out = jnp.einsum("vblnseg,snfhv->lefbgh", q, jnp.conj(b))
    return out.reshape(out.shape[0] * a.shape[2] * b.shape[2],
                       out.shape[3] * a.shape[3] * b.shape[3])


def c2x2_rd(C, Tb, Tr, a, open_phys: bool = False, slice_phys: bool = False,
            bra=None):
    """Lower-right corner from C(1,1), T(0,1), T(1,0), site
    (reference ctm_components.py:666-722 ``c2x2_RD_sl_c``)."""
    d = a.shape[0]
    b = a if bra is None else bra
    Tb4 = _split4(Tb, 0, a.shape[3], b.shape[3])  # [m, n, l(left), y(right)]
    Tr4 = _split4(Tr, 1, a.shape[4], b.shape[4])  # [t(up), w, v, x(down)]
    q = jnp.einsum("xy,mnly->xmnl", C, Tb4)
    q = jnp.einsum("xmnl,twvx->mnltwv", q, Tr4)
    if slice_phys:
        if open_phys:
            def term(a_s):
                t = jnp.einsum("mnltwv,egmw->nltveg", q, a_s)
                return jnp.einsum("nltveg,zfhnv->teflghz", t, jnp.conj(a))
            out = lax.map(term, a)
            out = jnp.moveaxis(out, 0, 6)
            return out.reshape(
                out.shape[0] * a.shape[1] ** 2, out.shape[3] * a.shape[2] ** 2, d, d
            )
        def term(a_s):
            t = jnp.einsum("mnltwv,egmw->nltveg", q, a_s)
            return jnp.einsum("nltveg,fhnv->teflgh", t, jnp.conj(a_s))
        out = _sum_over_phys(term, a)
        return out.reshape(out.shape[0] * a.shape[1] ** 2, out.shape[3] * a.shape[2] ** 2)
    # ket layer: a[s, u=e, l=g, d=m, r=w]
    q = jnp.einsum("mnltwv,segmw->nltvseg", q, a)
    if open_phys:
        out = jnp.einsum("nltvseg,zfhnv->teflghsz", q, jnp.conj(b))
        return out.reshape(
            out.shape[0] * a.shape[1] * b.shape[1],
            out.shape[3] * a.shape[2] * b.shape[2], d, d
        )
    out = jnp.einsum("nltvseg,sfhnv->teflgh", q, jnp.conj(b))
    return out.reshape(out.shape[0] * a.shape[1] * b.shape[1],
                       out.shape[3] * a.shape[2] * b.shape[2])


def c2x2_ld(C, Tl, Tb, a, open_phys: bool = False, slice_phys: bool = False,
            bra=None):
    """Lower-left corner from C(-1,1), T(-1,0), T(0,1), site
    (reference ctm_components.py:822-884 ``c2x2_LD_sl_c``)."""
    d = a.shape[0]
    b = a if bra is None else bra
    Tl4 = _split4(Tl, 2, a.shape[2], b.shape[2])  # [t(up), x(down), w, v]
    Tb4 = _split4(Tb, 0, a.shape[3], b.shape[3])  # [m, n, y(left), r(right)]
    q = jnp.einsum("xy,txwv->ytwv", C, Tl4)
    q = jnp.einsum("ytwv,mnyr->twvmnr", q, Tb4)
    if slice_phys:
        if open_phys:
            def term(a_s):
                t = jnp.einsum("twvmnr,ewmg->tvnreg", q, a_s)
                return jnp.einsum("tvnreg,zfvnh->tefrghz", t, jnp.conj(a))
            out = lax.map(term, a)
            out = jnp.moveaxis(out, 0, 6)
            return out.reshape(
                out.shape[0] * a.shape[1] ** 2, out.shape[3] * a.shape[4] ** 2, d, d
            )
        def term(a_s):
            t = jnp.einsum("twvmnr,ewmg->tvnreg", q, a_s)
            return jnp.einsum("tvnreg,fvnh->tefrgh", t, jnp.conj(a_s))
        out = _sum_over_phys(term, a)
        return out.reshape(out.shape[0] * a.shape[1] ** 2, out.shape[3] * a.shape[4] ** 2)
    # ket layer: a[s, u=e, l=w, d=m, r=g]
    q = jnp.einsum("twvmnr,sewmg->tvnrseg", q, a)
    if open_phys:
        out = jnp.einsum("tvnrseg,zfvnh->tefrghsz", q, jnp.conj(b))
        return out.reshape(
            out.shape[0] * a.shape[1] * b.shape[1],
            out.shape[3] * a.shape[4] * b.shape[4], d, d
        )
    out = jnp.einsum("tvnrseg,sfvnh->tefrgh", q, jnp.conj(b))
    return out.reshape(out.shape[0] * a.shape[1] * b.shape[1],
                       out.shape[3] * a.shape[4] * b.shape[4])


# --------------------------------------------------------------------------
# corner builders addressed by lattice coordinate
# --------------------------------------------------------------------------


def corner_lu(coord, sites, site_of, C, T, open_phys=False, slice_phys=False,
              sites_bra=None):
    c = site_of(coord)
    return c2x2_lu(C[(c, (-1, -1))], T[(c, (0, -1))], T[(c, (-1, 0))], sites[c],
                   open_phys, slice_phys,
                   bra=None if sites_bra is None else sites_bra[c])


def corner_ru(coord, sites, site_of, C, T, open_phys=False, slice_phys=False,
              sites_bra=None):
    c = site_of(coord)
    return c2x2_ru(C[(c, (1, -1))], T[(c, (1, 0))], T[(c, (0, -1))], sites[c],
                   open_phys, slice_phys,
                   bra=None if sites_bra is None else sites_bra[c])


def corner_rd(coord, sites, site_of, C, T, open_phys=False, slice_phys=False,
              sites_bra=None):
    c = site_of(coord)
    return c2x2_rd(C[(c, (1, 1))], T[(c, (0, 1))], T[(c, (1, 0))], sites[c],
                   open_phys, slice_phys,
                   bra=None if sites_bra is None else sites_bra[c])


def corner_ld(coord, sites, site_of, C, T, open_phys=False, slice_phys=False,
              sites_bra=None):
    c = site_of(coord)
    return c2x2_ld(C[(c, (-1, 1))], T[(c, (-1, 0))], T[(c, (0, 1))], sites[c],
                   open_phys, slice_phys,
                   bra=None if sites_bra is None else sites_bra[c])


# --------------------------------------------------------------------------
# halves of the 4x4 network (reference ctm_components.py:10-268)
# --------------------------------------------------------------------------


def halves_up(coord, sites, site_of, C, T, sites_bra=None):
    """R, Rt for the UP move; ``coord`` is the upper-right site."""
    x, y = coord
    ru = corner_ru(coord, sites, site_of, C, T, sites_bra=sites_bra)
    rd = corner_rd((x, y + 1), sites, site_of, C, T, sites_bra=sites_bra)
    lu = corner_lu((x - 1, y), sites, site_of, C, T, sites_bra=sites_bra)
    ld = corner_ld((x - 1, y + 1), sites, site_of, C, T, sites_bra=sites_bra)
    R = ru @ rd  # [ru-left, rd-left]
    Rt = jnp.einsum("ab,ac->bc", lu, ld)  # [lu-right, ld-right]
    return R, Rt


def halves_left(coord, sites, site_of, C, T, sites_bra=None):
    """R, Rt for the LEFT move; ``coord`` is the upper-left site."""
    x, y = coord
    lu = corner_lu(coord, sites, site_of, C, T, sites_bra=sites_bra)
    ru = corner_ru((x + 1, y), sites, site_of, C, T, sites_bra=sites_bra)
    ld = corner_ld((x, y + 1), sites, site_of, C, T, sites_bra=sites_bra)
    rd = corner_rd((x + 1, y + 1), sites, site_of, C, T, sites_bra=sites_bra)
    R = lu @ ru  # [lu-down, ru-down]
    Rt = jnp.einsum("ab,cb->ac", ld, rd)  # [ld-up, rd-up]
    return R, Rt


def halves_down(coord, sites, site_of, C, T, sites_bra=None):
    """R, Rt for the DOWN move; ``coord`` is the lower-left site."""
    x, y = coord
    ld = corner_ld(coord, sites, site_of, C, T, sites_bra=sites_bra)
    lu = corner_lu((x, y - 1), sites, site_of, C, T, sites_bra=sites_bra)
    rd = corner_rd((x + 1, y), sites, site_of, C, T, sites_bra=sites_bra)
    ru = corner_ru((x + 1, y - 1), sites, site_of, C, T, sites_bra=sites_bra)
    R = jnp.einsum("ab,ac->bc", ld, lu)  # [ld-right, lu-right]
    Rt = jnp.einsum("ab,ca->bc", rd, ru)  # [rd-left, ru-left]
    return R, Rt


def halves_right(coord, sites, site_of, C, T, sites_bra=None):
    """R, Rt for the RIGHT move; ``coord`` is the lower-right site."""
    x, y = coord
    rd = corner_rd(coord, sites, site_of, C, T, sites_bra=sites_bra)
    ld = corner_ld((x - 1, y), sites, site_of, C, T, sites_bra=sites_bra)
    ru = corner_ru((x, y - 1), sites, site_of, C, T, sites_bra=sites_bra)
    lu = corner_lu((x - 1, y - 1), sites, site_of, C, T, sites_bra=sites_bra)
    R = jnp.einsum("ab,cb->ac", rd, ld)  # [rd-up, ld-up]
    Rt = jnp.einsum("ab,ca->bc", ru, lu)  # [ru-down, lu-down]
    return R, Rt


HALVES = {
    (0, -1): halves_up,
    (-1, 0): halves_left,
    (0, 1): halves_down,
    (1, 0): halves_right,
}


# ------------------------------------------------------------- 4X2 mode
# (reference ctm_projectors.py:66-140 ``ctm_get_projectors_4x2``):
# projectors from two enlarged corners only — half the construction
# cost of the 4X4 scheme.  Row (= truncated-bond) orientation matches
# the 4X4 halves so the same projector/absorption machinery applies.

def halves_up_4x2(coord, sites, site_of, C, T, sites_bra=None):
    x, y = coord
    R = corner_ru(coord, sites, site_of, C, T, sites_bra=sites_bra)
    Rt = corner_lu((x - 1, y), sites, site_of, C, T, sites_bra=sites_bra).T
    return R, Rt


def halves_left_4x2(coord, sites, site_of, C, T, sites_bra=None):
    x, y = coord
    R = corner_lu(coord, sites, site_of, C, T, sites_bra=sites_bra)
    Rt = corner_ld((x, y + 1), sites, site_of, C, T, sites_bra=sites_bra)
    return R, Rt


def halves_down_4x2(coord, sites, site_of, C, T, sites_bra=None):
    x, y = coord
    R = corner_ld(coord, sites, site_of, C, T, sites_bra=sites_bra).T
    Rt = corner_rd((x + 1, y), sites, site_of, C, T, sites_bra=sites_bra).T
    return R, Rt


def halves_right_4x2(coord, sites, site_of, C, T, sites_bra=None):
    x, y = coord
    R = corner_rd(coord, sites, site_of, C, T, sites_bra=sites_bra)
    Rt = corner_ru((x, y - 1), sites, site_of, C, T, sites_bra=sites_bra).T
    return R, Rt


HALVES_4X2 = {
    (0, -1): halves_up_4x2,
    (-1, 0): halves_left_4x2,
    (0, 1): halves_down_4x2,
    (1, 0): halves_right_4x2,
}
