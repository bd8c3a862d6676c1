"""Correlation functions on block-sparse abelian environments.

Counterpart of reference ctm/generic_abelian/corrf.py (526 LoC) and
corrf_fermionic.py:29-227: two-point functions evaluated by growing a
boundary edge with block-sparse transfer matrices — NO densify bridge,
so the cost scales with the kept blocks (the point of the abelian
engine at large chi).

Fermionic correlators live in
:mod:`tpeps.ctm.generic_abelian.corrf_fermionic` (explicit per-block
sign dressing, machine-exact against the dl engine).  The graded
string-leg machinery below (``add_leg`` + ``_string_cap``) remains for
closed graded networks; do NOT evaluate observables by blanket-grading
a bosonically-converged environment (``env_with_grading``) — the
bosonic env pieces differ from graded pieces by a non-factorizable
sign gauge and even parity-even insertions cancel to zero through that
route (receipt: tests/test_abelian_fermionic_corrf.py anchors the
explicit-dressing path instead).

Edge convention (direction (-1,0), growing right): rank-4 AbelianTensor
``E[chi_top, Dk, Db, chi_bot]`` (D-pair unfused, matching
:mod:`tpeps.ctm.generic_abelian.env`); an edge carrying an operator
string has a trailing 5th leg.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...sym.tensor import AbelianTensor, _qscale


def _shift(c, d):
    return (c[0] + d[0], c[1] + d[1])


def get_edge(coord, direction, state, env):
    """Boundary edge C-T-C of site ``coord`` facing ``direction``
    (block-sparse mirror of tpeps.ctm.generic.corrf.get_edge)."""
    c = state.vertexToSite(coord)
    C, T = env.C, env.T
    if direction == (-1, 0):  # left boundary: E[top, Dk, Db, bot]
        E = C[(c, (-1, -1))].tensordot(T[(c, (-1, 0))], ((0,), (0,)))
        return E.tensordot(C[(c, (-1, 1))], ((1,), (0,)))
    if direction == (1, 0):  # right boundary: E[top, Dk, Db, bot]
        E = C[(c, (1, -1))].tensordot(T[(c, (1, 0))], ((1,), (0,)))
        return E.tensordot(C[(c, (1, 1))], ((3,), (0,)))
    raise ValueError(f"Invalid direction: {direction}")


def _string_cap(E, ix, iy):
    """Graded identity cap closing string legs ``ix`` and ``iy`` of
    ``E``: tensordot with the identity over the shared string sectors —
    the graded contraction supplies every reordering sign."""
    lx, ly = E.legs[ix], E.legs[iy]
    sx, sy = E.signature[ix], E.signature[iy]
    cap = AbelianTensor(E.sym, (-sx, -sy), (lx, ly), 0, dtype=E.dtype,
                        fermionic=E.fermionic)
    for qx, dx in lx.charges:
        # charge rule: -sx*qx - sy*qy = 0  =>  qy = -(sx*sy)*qx
        qy = _qscale(E.sym, -sx * sy, qx)
        dy = dict(ly.charges).get(qy)
        if dy is None:
            continue
        cap.blocks[(qx, qy)] = jnp.eye(dx, dy, dtype=E.dtype)
    return E.tensordot(cap, ((ix, iy), (0, 1)))


def _apply_op(a, op):
    """``op[s', s]`` (or ``op[s', s, str]`` for odd operators) applied
    to the ket: returns ``(a_op[s', u, l, d, r(, str)], has_string)``.

    The ket is the LEFT operand so the graded annihilation of the
    (theta_s, theta-bar_s) pair is ordered ket-first and sign-free —
    op-first would order the dual leg first and cost a spurious
    (-1)^{p(s)} (verified on the exact dimer state: density-density
    came out negated)."""
    if op is None:
        return a, False
    a_op = a.tensordot(op, ((0,), (1,)))
    if op.ndim == 3:
        # (u, l, d, r, s', str) -> (s', u, l, d, r, str)
        return a_op.transpose((4, 0, 1, 2, 3, 5)), True
    # (u, l, d, r, s') -> (s', u, l, d, r)
    return a_op.transpose((4, 0, 1, 2, 3)), False


def apply_TM_1sO(coord, direction, state, env, edge, op=None):
    """Apply one column transfer matrix to ``edge`` (growth direction
    (1,0)); optional one-site operator (odd ops carry a string leg).
    An edge string stays threaded; when both an edge string and an op
    string are present they are closed with the graded cap."""
    if direction != (1, 0):
        raise NotImplementedError(
            "grow with (1,0); evaluate columns on the lattice-rotated state"
        )
    c = state.vertexToSite(coord)
    T = env.T
    a = state.sites[c]
    a_op, op_str = _apply_op(a, op)
    hx = 1 if edge.ndim == 5 else 0

    Tt = T[(c, (0, -1))]   # (chi_l, Dk_d, Db_d, chi_r)
    Tb = T[(c, (0, 1))]    # (Dk_u, Db_u, chi_l, chi_r)
    E = Tt.tensordot(edge, ((0,), (0,)))
    # E = (dk, db, r, mk, mb, b[, x])
    E = E.tensordot(a_op, ((0, 3), (1, 2)))
    # E = (db, r, mb, b[, x], s, d, rr[, y])
    E = E.tensordot(a.conj(), ((4 + hx, 0, 2), (0, 1, 2)))
    # E = (r, b, [x,] d, rr, [y,] d', rr')
    if hx and op_str:
        E = _string_cap(E, 2, 5)
        hx, op_str = 0, False
    if not hx and not op_str:
        # (r, b, d, rr, d', rr')
        E = E.tensordot(Tb, ((2, 4, 1), (0, 1, 2)))   # (r, rr, rr', b')
        return E
    if hx:
        # (r, b, x, d, rr, d', rr')
        E = E.tensordot(Tb, ((3, 5, 1), (0, 1, 2)))   # (r, x, rr, rr', b')
        return E.transpose((0, 2, 3, 4, 1))
    # op_str only: (r, b, d, rr, y, d', rr')
    E = E.tensordot(Tb, ((2, 5, 1), (0, 1, 2)))       # (r, rr, y, rr', b')
    return E.transpose((0, 1, 3, 4, 2))


def _scalar(t):
    if not t.blocks:
        return jnp.asarray(0.0)
    return next(iter(t.blocks.values()))


def _close(coord, direction, state, env, vec):
    E = get_edge(coord, direction, state, env)
    return _scalar(vec.tensordot(E, ((0, 1, 2, 3), (0, 1, 2, 3))))


def _edge_norm(E):
    return float(np.max(np.abs(np.concatenate(
        [np.ravel(np.asarray(b)) for b in E.blocks.values()]))))


def corrf_1sO1sO(coord, direction, state, env, op1, get_op2, dist: int):
    """<O1(0) O2(r)> for r in [0, dist] on the block-sparse environment.

    For graded states with odd string-carrying operators this reproduces
    the reference's swap-gate fermionic correlators
    (corrf_fermionic.py:29-227) through the automatic Grassmann signs.

    :param get_op2: ``r -> op2`` (possibly sublattice-dependent)
    """
    rev = (-direction[0], -direction[1])
    c0 = coord
    E0 = get_edge(c0, rev, state, env)
    E1 = apply_TM_1sO(c0, direction, state, env, E0, op=op1)
    E0 = apply_TM_1sO(c0, direction, state, env, E0)
    out = []
    for r in range(dist + 1):
        c0 = _shift(c0, direction)
        E12 = apply_TM_1sO(c0, direction, state, env, E1, op=get_op2(r))
        E0n = apply_TM_1sO(c0, direction, state, env, E0)
        E1 = apply_TM_1sO(c0, direction, state, env, E1)
        num = _close(c0, direction, state, env, E12)
        den = _close(c0, direction, state, env, E0n)
        out.append(num / den)
        E0 = E0n
        s = _edge_norm(E0)
        E0 = E0 * (1.0 / s)
        E1 = E1 * (1.0 / s)
    return jnp.stack(out)
