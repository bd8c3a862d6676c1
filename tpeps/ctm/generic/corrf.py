"""Correlation functions along rows/columns of the lattice.

Counterpart of reference ctm/generic/corrf.py:10-1238 (``get_edge``,
``apply_TM_1sO``, ``apply_edge``, ``corrf_1sO1sO``).  The two-point
function <O1(0) O2(r)> is evaluated by growing a boundary edge with
column/row transfer matrices; supported growth directions are
right=(1,0) and down=(0,1) (the reference's up/left are the same
networks read from the opposite side).
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift(c, d):
    return (c[0] + d[0], c[1] + d[1])


def get_edge(coord, direction, sites, site_of, C, T):
    """Boundary edge C-T-C of site ``coord`` facing ``direction``
    (reference corrf.py:10-115).  Index order left-to-right / up-to-down:
    ``[chi, D^2, chi]``."""
    c = site_of(coord)
    if direction == (0, -1):  # up
        E = jnp.einsum("lmx,xy->lmy", T[(c, (0, -1))], C[(c, (1, -1))])
        E = jnp.einsum("xl,lmy->xmy", C[(c, (-1, -1))], E)
    elif direction == (-1, 0):  # left
        E = jnp.einsum("xy,xbm->ybm", C[(c, (-1, -1))], T[(c, (-1, 0))])
        E = jnp.einsum("ybm,bw->ymw", E, C[(c, (-1, 1))])
    elif direction == (0, 1):  # down
        E = jnp.einsum("xy,myr->xmr", C[(c, (-1, 1))], T[(c, (0, 1))])
        E = jnp.einsum("xmr,br->xmb", E, C[(c, (1, 1))])
    elif direction == (1, 0):  # right
        E = jnp.einsum("tmb,bw->tmw", T[(c, (1, 0))], C[(c, (1, 1))])
        E = jnp.einsum("xt,tmw->xmw", C[(c, (1, -1))], E)
    else:
        raise ValueError(f"Invalid direction: {direction}")
    return E


def _aXa(a, op=None):
    """Double-layer transfer tensor ``A[u^2, l^2, d^2, r^2]`` with an
    optional one-site operator inserted (reference corrf.py:404-449)."""
    a_op = a if op is None else jnp.einsum("mefgh,mn->nefgh", a, op)
    A = jnp.einsum("nefgh,nabcd->eafbgchd", a_op, jnp.conj(a))
    d = a.shape
    return A.reshape(d[1] ** 2, d[2] ** 2, d[3] ** 2, d[4] ** 2)


def apply_TM_1sO(coord, direction, sites, site_of, C, T, edge, op=None):
    """Apply one column/row transfer matrix (with optional operator) to
    ``edge[chi, D^2, chi]`` (reference corrf.py:364-663)."""
    c = site_of(coord)
    A = _aXa(sites[c], op)
    if direction == (1, 0):
        # edge = left boundary [top, D^2, bottom]; grow rightward
        Tt = T[(c, (0, -1))]
        Tb = T[(c, (0, 1))]
        E = jnp.einsum("tnq,tmb->nqmb", Tt, edge)
        E = jnp.einsum("nqmb,nmdr->qbdr", E, A)
        return jnp.einsum("qbdr,dbw->qrw", E, Tb)
    if direction == (0, 1):
        # edge = top boundary [left, D^2, right]; grow downward
        Tl = T[(c, (-1, 0))]
        Tr = T[(c, (1, 0))]
        E = jnp.einsum("tbn,tmr->bnmr", Tl, edge)
        E = jnp.einsum("bnmr,mndw->brdw", E, A)
        return jnp.einsum("brdw,rwq->bdq", E, Tr)
    raise NotImplementedError(
        f"direction {direction}: grow with (1,0)/(0,1) and read from the other end"
    )


def apply_edge(coord, direction, sites, site_of, C, T, vec):
    """Close the network: full contraction of ``vec`` with the boundary
    edge in the growth direction (reference corrf.py:200-277)."""
    E = get_edge(coord, direction, sites, site_of, C, T)
    return jnp.einsum("abc,abc->", vec, E)


def corrf_1sO1sO(coord, direction, sites, site_of, C, T, op1, get_op2, dist: int):
    """<O1(0) O2(r)> for r in [0, dist] (reference corrf.py:980-1068).

    ``get_op2(r)`` supplies the (possibly sublattice-rotated) second
    operator at distance r+1.
    """
    rev = (-direction[0], -direction[1])
    c0 = coord
    E0 = get_edge(c0, rev, sites, site_of, C, T)
    E1 = apply_TM_1sO(c0, direction, sites, site_of, C, T, E0, op=op1)
    E0 = apply_TM_1sO(c0, direction, sites, site_of, C, T, E0)
    out = []
    for r in range(dist + 1):
        c0 = _shift(c0, direction)
        E12 = apply_TM_1sO(c0, direction, sites, site_of, C, T, E1, op=get_op2(r))
        E0 = apply_TM_1sO(c0, direction, sites, site_of, C, T, E0)
        E1 = apply_TM_1sO(c0, direction, sites, site_of, C, T, E1)
        num = apply_edge(c0, direction, sites, site_of, C, T, E12)
        den = apply_edge(c0, direction, sites, site_of, C, T, E0)
        out.append(num / den)
        scale = jnp.abs(E0).max()
        E0 = E0 / scale
        E1 = E1 / scale
    return jnp.stack(out)


def _split_op2(op2, d):
    """SVD-split a two-site gate ``op2[s0,s1,s0',s1']`` into
    ``sum_k o1_k (x) o2_k`` (small d — exact split)."""
    import numpy as np

    m = np.asarray(op2).reshape(d, d, d, d).transpose(0, 2, 1, 3).reshape(d * d, d * d)
    U, S, Vh = np.linalg.svd(m, full_matrices=False)
    k = max(int((S > 1e-14 * max(S[0], 1e-300)).sum()), 1)
    o1 = (U[:, :k] * S[:k][None, :]).T.reshape(k, d, d)
    o2 = Vh[:k].reshape(k, d, d)
    return jnp.asarray(o1), jnp.asarray(o2)


def apply_TM_2sO(coord, direction, sites, site_of, C, T, edge, op2=None):
    """Apply TWO consecutive transfer columns with an (optional) 2-site
    operator spanning them (reference corrf.py:664-790 ``apply_TM_2sO``)."""
    c1 = _shift(coord, direction)
    if op2 is None:
        E = apply_TM_1sO(coord, direction, sites, site_of, C, T, edge)
        return apply_TM_1sO(c1, direction, sites, site_of, C, T, E)
    d = sites[site_of(coord)].shape[0]
    o1s, o2s = _split_op2(op2, d)
    out = None
    for k in range(o1s.shape[0]):
        E = apply_TM_1sO(coord, direction, sites, site_of, C, T, edge, op=o1s[k])
        E = apply_TM_1sO(c1, direction, sites, site_of, C, T, E, op=o2s[k])
        out = E if out is None else out + E
    return out


def corrf_2sOH2sOH_E1(coord, direction, sites, site_of, C, T, op1, get_op2,
                      dist: int):
    """<O1(0,1) O2(r,r+1)> of horizontally-oriented 2-site operators
    along ``direction`` (reference corrf.py:1069-1157).  Values for
    r in [1, dist] (op2 applied after at least one plain column)."""
    rev = (-direction[0], -direction[1])
    c0 = coord
    E0 = get_edge(c0, rev, sites, site_of, C, T)
    E1 = apply_TM_2sO(c0, direction, sites, site_of, C, T, E0, op2=op1)
    E0 = apply_TM_2sO(c0, direction, sites, site_of, C, T, E0)
    c0 = _shift(_shift(c0, direction), direction)
    out = []
    for r in range(dist):
        E12 = apply_TM_2sO(c0, direction, sites, site_of, C, T, E1, op2=get_op2(r))
        E0n = apply_TM_2sO(c0, direction, sites, site_of, C, T, E0)
        num = apply_edge(_shift(c0, direction), direction, sites, site_of, C, T, E12)
        den = apply_edge(_shift(c0, direction), direction, sites, site_of, C, T, E0n)
        out.append(num / den)
        E0 = apply_TM_1sO(c0, direction, sites, site_of, C, T, E0)
        E1 = apply_TM_1sO(c0, direction, sites, site_of, C, T, E1)
        scale = jnp.abs(E0).max()
        E0 = E0 / scale
        E1 = E1 / scale
        c0 = _shift(c0, direction)
    return jnp.stack(out)


def get_edge2(coord, direction, sites, site_of, C, T):
    """Width-2 boundary edge C-T-T-C spanning rows y, y+1 (for growth
    along +-x) or columns x, x+1 (for growth along +-y); index order
    ``[chi, D^2, D^2, chi]`` (reference corrf.py:116-199)."""
    c0 = site_of(coord)
    if direction == (-1, 0):  # left boundary of a rightward channel
        c1 = site_of((coord[0], coord[1] + 1))
        E = jnp.einsum("xy,xbm->ybm", C[(c0, (-1, -1))], T[(c0, (-1, 0))])
        E = jnp.einsum("ybm,bwn->ymnw", E, T[(c1, (-1, 0))])
        return jnp.einsum("ymnw,wv->ymnv", E, C[(c1, (-1, 1))])
    if direction == (1, 0):  # right boundary closing a rightward channel
        c1 = site_of((coord[0], coord[1] + 1))
        E = jnp.einsum("tmb,xt->xmb", T[(c0, (1, 0))], C[(c0, (1, -1))])
        E = jnp.einsum("xmb,bnw->xmnw", E, T[(c1, (1, 0))])
        return jnp.einsum("xmnw,wv->xmnv", E, C[(c1, (1, 1))])
    raise NotImplementedError(f"direction {direction}")


def apply_TM_1sO_2(coord, direction, sites, site_of, C, T, edge, op2=None):
    """Grow a WIDTH-2 channel by one column: T, a(x,y), a(x,y+1), T,
    with an optional VERTICAL 2-site operator inside the column
    (reference corrf.py:791-979 ``apply_TM_1sO_2``)."""
    assert direction == (1, 0), "width-2 channel implemented for +x growth"
    c0 = site_of(coord)
    c1 = site_of((coord[0], coord[1] + 1))
    if op2 is None:
        A0, A1 = _aXa(sites[c0]), _aXa(sites[c1])
        parts = [(None, A0, A1, 1.0)]
    else:
        d = sites[c0].shape[0]
        o1s, o2s = _split_op2(op2, d)
        parts = [
            (k, _aXa(sites[c0], o1s[k]), _aXa(sites[c1], o2s[k]), 1.0)
            for k in range(o1s.shape[0])
        ]
    out = None
    Tt, Tb = T[(c0, (0, -1))], T[(c1, (0, 1))]
    for _, A0, A1, w in parts:
        E = jnp.einsum("tnq,tmzb->nqmzb", Tt, edge)
        E = jnp.einsum("nqmzb,nmdr->qzbdr", E, A0)
        E = jnp.einsum("qzbdr,dzev->qbrev", E, A1)
        E = jnp.einsum("qbrev,ebw->qrvw", E, Tb)
        out = E if out is None else out + E
    return out


def corrf_2sOV2sOV_E2(coord, direction, sites, site_of, C, T, op1, get_op2,
                      dist: int):
    """<O1(0) O2(r)> of vertically-oriented 2-site operators along +x
    (reference corrf.py:1158-1237): a width-2 transfer channel with the
    dimer operators inside single columns."""
    assert direction == (1, 0)
    rev = (-1, 0)
    c0 = coord
    E0 = get_edge2(c0, rev, sites, site_of, C, T)
    E1 = apply_TM_1sO_2(c0, direction, sites, site_of, C, T, E0, op2=op1)
    E0 = apply_TM_1sO_2(c0, direction, sites, site_of, C, T, E0)
    out = []
    for r in range(dist + 1):
        c0 = _shift(c0, direction)
        E12 = apply_TM_1sO_2(c0, direction, sites, site_of, C, T, E1, op2=get_op2(r))
        E0 = apply_TM_1sO_2(c0, direction, sites, site_of, C, T, E0)
        E1 = apply_TM_1sO_2(c0, direction, sites, site_of, C, T, E1)
        cap = get_edge2(_shift(c0, direction), direction, sites, site_of, C, T)
        num = jnp.einsum("abcd,abcd->", E12, cap)
        den = jnp.einsum("abcd,abcd->", E0, cap)
        out.append(num / den)
        scale = jnp.abs(E0).max()
        E0 = E0 / scale
        E1 = E1 / scale
    return jnp.stack(out)
