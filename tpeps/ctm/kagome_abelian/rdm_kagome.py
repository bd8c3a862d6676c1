"""Kagome iPESS RDMs over the abelian block-sparse environment.

Counterpart of reference ctm/pess_kagome_abelian/rdm_kagome.py (1,381
LoC).  Operates on the 7-leg site tensors of
:class:`tpeps.ipeps.ipess_kagome_abelian.IPESS_KAGOME_ABELIAN`
(``a7[s0,s1,s2,u,l,d,r]`` — DoFs unfused, so per-DoF opens are plain
tensordots) and the ENV_ABELIAN of the fused state.  Dense rho /
scalars are returned so the dense kagome models evaluate unchanged
(the models/abelian adapter pattern).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...sym.tensor import AbelianTensor
from ..c4v.rdm import _cast_to_real, _sym_pos_def_rdm

_PHYS = (0, 1, 2)
_AUX = {"u": 3, "l": 4, "d": 5, "r": 6}


def _corner(coord, state, env, which: str, open_sites=()):
    """Enlarged corner with selected kagome DoFs open.

    Output legs: (row-chi, row-Dk, row-Db, col-chi, col-Dk, col-Db,
    open-kets..., open-bras...) following the generic_abelian corner
    conventions (tpeps/ctm/generic_abelian/components.py):
      LU: rows = down triple,  cols = right triple
      RU: rows = left triple,  cols = down triple
      RD: rows = up triple,    cols = left triple
      LD: rows = up triple,    cols = right triple
    """
    open_sites = tuple(sorted(open_sites))
    closed = tuple(s for s in _PHYS if s not in open_sites)
    c = state.vertexToSite(coord)
    a = state.sites7[c] if hasattr(state, "sites7") else state.site7(coord)
    ac = a.conj()
    C, T = env.C, env.T
    n_open = len(open_sites)

    if which == "LU":
        q = C[(c, (-1, -1))].tensordot(T[(c, (0, -1))], ((1,), (0,)))  # (x,uk,ub,i)
        q = q.tensordot(T[(c, (-1, 0))], ((0,), (0,)))                 # (uk,ub,i,j,lk,lb)
        q = q.tensordot(a, ((0, 4), (3, 4)))
        # q: (ub,i,j,lb, s0,s1,s2, d,r)
        ax_q = (0, 3) + tuple(4 + s for s in closed)
        ax_b = (3, 4) + closed
        out = q.tensordot(ac, (ax_q, ax_b))
        # out: (i, j, openK..., d, r) + (openB..., db, rb)
        nk = n_open
        perm = (
            (1,) + (2 + nk,) + (4 + 2 * nk,)      # rows: j, dk, db
            + (0,) + (3 + nk,) + (5 + 2 * nk,)    # cols: i, rk, rb
            + tuple(range(2, 2 + nk))             # open kets
            + tuple(range(4 + nk, 4 + 2 * nk))    # open bras
        )
        return out.transpose(perm)

    if which == "RU":
        q = C[(c, (1, -1))].tensordot(T[(c, (1, 0))], ((1,), (0,)))    # (x,w,rk,rb? ...)
        # T(1,0): (chi_u, Dk_left, Db_left, chi_d) -> (x, rk?, ...) careful:
        # C(1,-1) legs (top-T-right, right-T-up); td over right-T-up
        # gives (x, rk, rb, b)
        q = q.tensordot(T[(c, (0, -1))], ((0,), (3,)))                 # (rk,rb,b, l,uk,ub)
        q = q.tensordot(a, ((0, 4), (6, 3)))
        # q: (rb, b, l, ub, s0,s1,s2, lA, dA)
        ax_q = (0, 3) + tuple(4 + s for s in closed)
        ax_b = (6, 3) + closed
        out = q.tensordot(ac, (ax_q, ax_b))
        # out: (b, l, openK..., lA, dA) + (openB..., lB, dB)
        nk = n_open
        perm = (
            (1,) + (2 + nk,) + (4 + 2 * nk,)      # rows: l, lAk, lAb
            + (0,) + (3 + nk,) + (5 + 2 * nk,)    # cols: b, dk, db
            + tuple(range(2, 2 + nk))
            + tuple(range(4 + nk, 4 + 2 * nk))
        )
        return out.transpose(perm)

    if which == "RD":
        # C(1,1) legs: (right-T-down, bottom-T-right) — see
        # generic_abelian/components.c2x2_rd and rdm.py usages
        q = C[(c, (1, 1))].tensordot(T[(c, (0, 1))], ((1,), (3,)))     # (y, dk,db, l)
        q = q.tensordot(T[(c, (1, 0))], ((0,), (3,)))                  # (dk,db,l, t,rk,rb)
        q = q.tensordot(a, ((0, 4), (5, 6)))
        # q: (db, l, t, rb, s0,s1,s2, uA, lA)
        ax_q = (0, 3) + tuple(4 + s for s in closed)
        ax_b = (5, 6) + closed
        out = q.tensordot(ac, (ax_q, ax_b))
        # out: (l, t, openK..., uA, lA) + (openB..., uB, lB)
        nk = n_open
        perm = (
            (1,) + (2 + nk,) + (4 + 2 * nk,)      # rows: t, uk, ub
            + (0,) + (3 + nk,) + (5 + 2 * nk,)    # cols: l, lk, lb
            + tuple(range(2, 2 + nk))
            + tuple(range(4 + nk, 4 + 2 * nk))
        )
        return out.transpose(perm)

    if which == "LD":
        q = C[(c, (-1, 1))].tensordot(T[(c, (-1, 0))], ((0,), (1,)))   # (y, t, lk, lb)
        q = q.tensordot(T[(c, (0, 1))], ((0,), (2,)))                  # (t,lk,lb, dk,db,r)
        q = q.tensordot(a, ((1, 3), (4, 5)))
        # q: (t, lb, db, r, s0,s1,s2, uA, rA)
        ax_q = (1, 2) + tuple(4 + s for s in closed)
        ax_b = (4, 5) + closed
        out = q.tensordot(ac, (ax_q, ax_b))
        # out: (t, r, openK..., uA, rA) + (openB..., uB, rB)
        nk = n_open
        perm = (
            (0,) + (2 + nk,) + (4 + 2 * nk,)      # rows: t, uk, ub
            + (1,) + (3 + nk,) + (5 + 2 * nk,)    # cols: r, rk, rb
            + tuple(range(2, 2 + nk))
            + tuple(range(4 + nk, 4 + 2 * nk))
        )
        return out.transpose(perm)

    raise ValueError(which)


def _phys_op_to_abelian(op, phys_legs, sym, n_dof=3):
    """Dense 3-DoF operator [(s0 s1 s2), (s0' s1' s2')] or 6-leg ->
    AbelianTensor with legs (s0,s1,s2,s0',s1',s2')."""
    if isinstance(op, AbelianTensor):
        return op
    d = phys_legs[0].total_dim()
    g = jnp.asarray(op).reshape((d,) * (2 * n_dof))
    return AbelianTensor.from_dense(
        g, sym, (1,) * n_dof + (-1,) * n_dof, tuple(phys_legs) * 2, 0
    ).to_backend("np")


def trace1x1_dn_kagome(coord, state, env, op):
    """Unnormalized <op> on the down triangle of one site
    (reference pess_kagome_abelian/rdm_kagome.py ``trace1x1_dn_kagome``)."""
    c = state.vertexToSite(coord)
    a = state.sites7[c]
    opA = _phys_op_to_abelian(op, a.legs[:3], a.sym)
    # a_op[s0',s1',s2',u,l,d,r] = op . a
    a_op = opA.tensordot(a, ((3, 4, 5), (0, 1, 2)))
    # build LU with a_op: the corner with the op-dressed site
    C, T = env.C, env.T
    q = C[(c, (-1, -1))].tensordot(T[(c, (0, -1))], ((1,), (0,)))
    q = q.tensordot(T[(c, (-1, 0))], ((0,), (0,)))
    q = q.tensordot(a_op, ((0, 4), (3, 4)))
    ac = a.conj()
    lu_op = q.tensordot(ac, ((0, 3, 4, 5, 6), (3, 4, 0, 1, 2)))
    # lu_op: (i, j, d, r) + (db, rb) -> rows (j, d, db), cols (i, r, rb)
    lu_op = lu_op.transpose((1, 2, 4, 0, 3, 5))
    # close with the remaining C-T edges of the SAME site (1x1 trace)
    t = C[(c, (1, -1))].tensordot(T[(c, (1, 0))], ((1,), (0,)))   # (x, rk, rb, b)
    rt = t.tensordot(C[(c, (1, 1))], ((3,), (0,)))                # (x, rk, rb, y)
    b = C[(c, (-1, 1))].tensordot(T[(c, (0, 1))], ((1,), (2,)))   # (j, dk, db, y2)
    v = lu_op.tensordot(b, ((0, 1, 2), (0, 1, 2)))                # (i, rk, rb, y2)
    v = v.tensordot(rt, ((0, 1, 2), (0, 1, 2)))                   # (y2, y)
    out = v.tensordot(_eye_like(v), ((0, 1), (0, 1)))
    return _scalar(out)


def _eye_like(t2):
    """Identity pairing the two legs of a rank-2 AbelianTensor."""
    e = AbelianTensor(t2.sym, (-t2.signature[0], -t2.signature[1]),
                      (t2.legs[0], t2.legs[1]), 0, dtype=t2.dtype)
    for q, d in t2.legs[0].charges:
        if q in dict(t2.legs[1].charges):
            e.blocks[(q, q)] = np.eye(d, dict(t2.legs[1].charges)[q])
    return e


def _scalar(t):
    if not t.blocks:
        return jnp.asarray(0.0)
    return sum(jnp.asarray(b).reshape(()) for b in t.blocks.values())


def rdm1x1_kagome(coord, state, env, sym_pos_def=False):
    """Dense 3-DoF RDM of the down triangle, ``rho[s0,s1,s2;s0',s1',s2']``."""
    lu = _corner(coord, state, env, "LU", (0, 1, 2))
    # close the 1x1 network
    c = state.vertexToSite(coord)
    C, T = env.C, env.T
    t = C[(c, (1, -1))].tensordot(T[(c, (1, 0))], ((1,), (0,)))
    rt = t.tensordot(C[(c, (1, 1))], ((3,), (0,)))                # (x, rk, rb, y)
    b = C[(c, (-1, 1))].tensordot(T[(c, (0, 1))], ((1,), (2,)))   # (j, dk, db, y2)
    v = lu.tensordot(b, ((0, 1, 2), (0, 1, 2)))   # (i, rk, rb, K..B.., y2)
    v = v.tensordot(rt, ((0, 1, 2), (0, 1, 2)))   # (K0,K1,K2,B0,B1,B2, y2, y)
    v = v.tensordot(_eye_like_tail(v), ((6, 7), (0, 1)))
    rho = v.to_dense()
    d = rho.shape[0]
    return _sym_pos_def_rdm(rho.reshape((d,) * 6), sym_pos_def=sym_pos_def)


def _eye_like_tail(t):
    e = AbelianTensor(t.sym, (-t.signature[6], -t.signature[7]),
                      (t.legs[6], t.legs[7]), 0, dtype=t.dtype)
    for q, d in t.legs[6].charges:
        if q in dict(t.legs[7].charges):
            e.blocks[(q, q)] = np.eye(d, dict(t.legs[7].charges)[q])
    return e


def rdm2x2_up_triangle_open(coord, state, env, sym_pos_def=False):
    """3-site RDM of the UP triangle over the 2x2 patch at ``coord``
    (upper-left), dense ``rho[s0,s1,s2;s0',s1',s2']`` with the dense
    module's site order: (DoF 1 of coord+(1,0), DoF 0 of coord+(1,1),
    DoF 2 of coord+(0,1))."""
    lu = _corner(coord, state, env, "LU", ())
    ru = _corner((coord[0] + 1, coord[1]), state, env, "RU", (1,))
    rd = _corner((coord[0] + 1, coord[1] + 1), state, env, "RD", (0,))
    ld = _corner((coord[0], coord[1] + 1), state, env, "LD", (2,))
    upper = lu.tensordot(ru, ((3, 4, 5), (0, 1, 2)))
    # upper: (lu-rows 0..2)+(ru cols 0..2, ruK, ruB)
    lower = ld.tensordot(rd, ((3, 4, 5), (3, 4, 5)))
    # lower: (ld rows, ldK, ldB, rd rows, rdK, rdB)
    rho = upper.tensordot(lower, ((0, 1, 2, 3, 4, 5), (0, 1, 2, 5, 6, 7)))
    # rho: (ruK, ruB, ldK, ldB, rdK, rdB)
    rho = rho.to_dense()
    # -> (ruK, ldK, rdK; ruB, ldB, rdB) matching the dense module's
    # site order (tpeps/ctm/kagome/rdm_kagome.py rdm2x2_up_triangle_open)
    rho = rho.transpose(0, 2, 4, 1, 3, 5)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x2_dn_triangle_with_operator(coord, state, env, op):
    """Normalized <op> on the down triangle of ``coord`` within a 2x2
    patch; returns ``(<op>, norm)``."""
    c = state.vertexToSite(coord)
    a = state.sites7[c]
    opA = _phys_op_to_abelian(op, a.legs[:3], a.sym)
    a_op = opA.tensordot(a, ((3, 4, 5), (0, 1, 2)))
    C, T = env.C, env.T

    def lu_with(site_a):
        q = C[(c, (-1, -1))].tensordot(T[(c, (0, -1))], ((1,), (0,)))
        q = q.tensordot(T[(c, (-1, 0))], ((0,), (0,)))
        q = q.tensordot(site_a, ((0, 4), (3, 4)))
        out = q.tensordot(a.conj(), ((0, 3, 4, 5, 6), (3, 4, 0, 1, 2)))
        return out.transpose((1, 2, 4, 0, 3, 5))  # rows (j,d,db), cols (i,r,rb)

    lu_op = lu_with(a_op)
    lu_id = lu_with(a)
    ru = _corner((coord[0] + 1, coord[1]), state, env, "RU", ())
    rd = _corner((coord[0] + 1, coord[1] + 1), state, env, "RD", ())
    ld = _corner((coord[0], coord[1] + 1), state, env, "LD", ())
    lower = ld.tensordot(rd, ((3, 4, 5), (3, 4, 5)))  # (ld rows, rd rows)

    def close(lu):
        upper = lu.tensordot(ru, ((3, 4, 5), (0, 1, 2)))  # (lu rows, ru cols)
        out = upper.tensordot(lower, ((0, 1, 2, 3, 4, 5), (0, 1, 2, 3, 4, 5)))
        return _scalar(out)

    val = close(lu_op)
    norm = _cast_to_real(close(lu_id))
    return val / norm, norm
