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
