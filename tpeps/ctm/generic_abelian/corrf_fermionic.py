"""Fermionic two-point functions on block-sparse abelian environments.

Counterpart of reference ``ctm/generic_abelian/corrf_fermionic.py:29-227``
(swap-gate dressed correlators over yastn block-sparse environments).

Design: the validated fermionic sign structure of this package lives in
:mod:`tpeps.ctm.generic.dl_fermi` — a per-site quadratic parity dressing
of the ket (x) bra double layer plus GF(2)-solved pair/mid string masks,
machine-exact against brute-force Grassmann oracles.  Here the SAME
masks are applied *per block pair* while pairing ket and bra blocks into
a block-sparse double tensor (``double_tensor_ab``), so the whole
correlator runs on the :class:`~tpeps.ctm.generic_abelian.env.ENV_ABELIAN`
boundary with cost scaling in the kept charge blocks — no densify, no
dense D^4 double layer.

The earlier experiment of reinterpreting a bosonically-converged
environment with blanket Grassmann grading (``env_with_grading``) is NOT
used: the bosonic env pieces differ from graded env pieces by a
non-factorizable sign gauge, and even parity-even observables cancel to
zero through that route (sweep receipt in tests/test_abelian_obs.py).
Explicit dressing sidesteps the issue: all tensors stay bosonic and
every fermionic sign is carried by the masks.

**Environment precondition.**  The ``env`` passed to the correlators
must be a fixed point of the SIGN-DRESSED double layer — converge it
with :func:`tpeps.ctm.generic_abelian.ctmrg_dl.run_fermionic` (or hand
in a densified dl_fermi environment).  An ``ENV_ABELIAN`` produced by
the bosonic engine (:func:`tpeps.ctm.generic_abelian.ctmrg.run`, which
contracts the sign-STRIPPED layer) is a fixed point of the wrong
transfer operator: on the honeycomb CI state it gives ~7e-3-wrong
values at distance even when chi saturates (PARITY.md round-4 root
cause; regression test ``tests/test_abelian_fermionic_corrf.py::
test_independent_graded_env_matches_dl``).

Operators are charge-homogeneous rank-2 ``AbelianTensor``s ``op[z, s]``
= <z|O|s> on the physical leg (signature ``(sp, -sp)``); parity-odd
operators (c, c^dag) need NO explicit string leg — the pair/mid string
masks of dl_fermi replace it.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...sym.tensor import AbelianTensor, _qadd, _qscale
from ..generic.dl_fermi import MID_STRING_H, PAIR_STRINGS, _LEG_IDX
from .corrf import get_edge, _scalar, _shift


def _interleave(xs, ys):
    return tuple(v for pair in zip(xs, ys) for v in pair)


def double_tensor_ab(a, string=(), open_phys: bool = False):
    """Block-sparse dressed double tensor of on-site tensor ``a``.

    :param a: AbelianTensor, legs (s, u, l, d, r) (grading flag ignored —
        every Grassmann sign is applied explicitly per block pair).
    :param string: aux-leg names from dl_fermi (``"uk"``, ``"db"``, ...)
        receiving the string mask — unconditional ``(-1)^p`` for closed
        tensors (``MID_STRING_H``), operator-parity-conditional
        ``(-1)^{(p_s+p_z) p}`` for open ones (``PAIR_STRINGS``).
    :param open_phys: keep (s, z) = (ket, bra) physical legs in front.
    :return: AbelianTensor with legs (uk, ub, lk, lb, dk, db, rk, rb)
        (closed) or (s, z, uk, ub, ...) (open); bosonic.
    """
    sig_k = a.signature[1:5]
    sig_b = tuple(-s for s in sig_k)
    legs_k = a.legs[1:5]
    if open_phys:
        sig = (a.signature[0], -a.signature[0]) + _interleave(sig_k, sig_b)
        legs = (a.legs[0], a.legs[0]) + _interleave(legs_k, legs_k)
    else:
        sig = _interleave(sig_k, sig_b)
        legs = _interleave(legs_k, legs_k)
    out = AbelianTensor(a.sym, sig, legs, 0, dtype=a.dtype, fermionic=False)

    # string legs -> (which layer, which site leg 1..4)
    s_ket = [(_LEG_IDX[nm] % 5) for nm in string if _LEG_IDX[nm] < 5]
    s_bra = [(_LEG_IDX[nm] % 5) for nm in string if _LEG_IDX[nm] >= 5]

    P = a.leg_parity
    items = list(a.blocks.items())
    for qk, bk in items:
        ps = P(0, qk[0])
        pu, pl, pd, pr = (P(i, qk[i]) for i in (1, 2, 3, 4))
        for qb, bb in items:
            if not open_phys and qb[0] != qk[0]:
                continue
            pz = P(0, qb[0])
            pub, plb, pdb, prb = (P(i, qb[i]) for i in (1, 2, 3, 4))
            phys_p = pz if open_phys else ps
            # dl_fermi._sign_mask: (-1)^{(p_phys+p_u)(p_r+p_r') + p_l(p_d+p_d')}
            e = (phys_p + pu) * (pr + prb) + pl * (pd + pdb)
            if string:
                pk_ = {1: pu, 2: pl, 3: pd, 4: pr}
                pb_ = {1: pub, 2: plb, 3: pdb, 4: prb}
                tot = sum(pk_[i] for i in s_ket) + sum(pb_[i] for i in s_bra)
                e += ((ps + pz) * tot) if open_phys else tot
            sgn = -1.0 if (e % 2) else 1.0
            bbc = jnp.conj(bb)
            if open_phys:
                blk = sgn * jnp.einsum("sabcd,zefgh->szaebfcgdh", bk, bbc)
                qout = (qk[0], qb[0]) + _interleave(qk[1:], qb[1:])
            else:
                blk = sgn * jnp.einsum("sabcd,sefgh->aebfcgdh", bk, bbc)
                qout = _interleave(qk[1:], qb[1:])
            if qout in out.blocks:
                out.blocks[qout] = out.blocks[qout] + blk
            else:
                out.blocks[qout] = blk
    return out


def op_from_dense(Lp, mat, dtype=None, tol=1e-14, sym="U1"):
    """Charge-homogeneous ``op[z, s]`` AbelianTensor from a dense matrix
    in the charge-sorted dense basis of physical leg ``Lp`` (inverse of
    the dense embedding used by dl_fermi / TVModel operators).

    The charge-transfer sector is computed with the group arithmetic of
    ``sym`` (signature (1, -1): ``dq = qz - qs`` group-wise, mod 2 for
    Z2, component-wise for U1xU1).  Raises if ``mat`` mixes
    charge-transfer sectors (not homogeneous).
    """
    mat = np.asarray(mat)
    if dtype is None:
        dtype = jnp.complex128 if np.iscomplexobj(mat) else jnp.float64
    off, n_op = {}, None
    o = 0
    for q, d in Lp.charges:
        off[q] = (o, d)
        o += d
    blocks = {}
    for qz, (oz, dz) in off.items():
        for qs, (os_, ds) in off.items():
            b = mat[oz:oz + dz, os_:os_ + ds]
            if np.abs(b).max() <= tol:
                continue
            dq = _qadd(sym, qz, _qscale(sym, -1, qs))
            if n_op is None:
                n_op = dq
            elif n_op != dq:
                raise ValueError("operator mixes charge-transfer sectors")
            blocks[(qz, qs)] = jnp.asarray(b, dtype=dtype)
    if n_op is None:
        n_op = (0, 0) if sym == "U1xU1" else 0
    out = AbelianTensor(sym, (1, -1), (Lp, Lp), n_op, dtype=dtype)
    out.blocks.update(blocks)
    return out


def _bosonic(t):
    if not t.fermionic:
        return t
    return AbelianTensor(t.sym, t.signature, t.legs, t.n, t.blocks,
                         t.dtype, False)


def _apply_col(coord, state, env, edge, col8):
    """Grow ``edge`` (top, Dk, Db, bot) by one column given as a paired
    rank-8 double tensor (uk, ub, lk, lb, dk, db, rk, rb)."""
    c = state.vertexToSite(coord)
    Tt = _bosonic(env.T[(c, (0, -1))])   # (chi_l, Dk_d, Db_d, chi_r)
    Tb = _bosonic(env.T[(c, (0, 1))])    # (Dk_u, Db_u, chi_l, chi_r)
    q = Tt.tensordot(edge, ((0,), (0,)))          # (dk,db,r, eDk,eDb,bot)
    q = q.tensordot(col8, ((0, 1, 3, 4), (0, 1, 2, 3)))
    # (r, bot, dk, db, rk, rb)
    q = q.tensordot(Tb, ((1, 2, 3), (2, 0, 1)))   # (r, rk, rb, bot')
    return q


def _close_right(coord, state, env, edge):
    E = get_edge(coord, (1, 0), state, env)
    return _scalar(edge.tensordot(_bosonic(E), ((0, 1, 2, 3), (0, 1, 2, 3))))


def _op_parity(op):
    """Fermion parity of a charge-homogeneous operator (0 = even)."""
    for (qz, qs) in op.blocks:
        return (op.leg_parity(0, qz) + op.leg_parity(1, qs)) % 2
    return 0


def _split_by_out_parity(op):
    """Split ``op[z, s]`` into (even-z, odd-z) parts."""
    oe = AbelianTensor(op.sym, op.signature, op.legs, op.n, dtype=op.dtype)
    oo = AbelianTensor(op.sym, op.signature, op.legs, op.n, dtype=op.dtype)
    for q, b in op.blocks.items():
        (oo if op.leg_parity(0, q[0]) else oe).blocks[q] = b
    return oe, oo


def _edge_max(E):
    """max |entry| of an edge; 0.0 for an empty or all-zero edge (the
    caller must skip rescaling in that case)."""
    if not E.blocks:
        return 0.0
    return float(np.max(np.abs(np.concatenate(
        [np.ravel(np.asarray(b)) for b in E.blocks.values()]))))


def corrf_1sO1sO_fermionic(coord, direction, state, env, op1, op2, dist: int):
    """``<O1(coord) O2(coord + r*direction)>`` for r = 1..dist, fermionic
    statistics included, on the block-sparse abelian environment
    (reference corrf_fermionic.py:29-227; sign structure = this
    package's dl_fermi solution, so with a shared environment the values
    match :func:`tpeps.ctm.generic.dl_fermi.corrf_1sO1sO_h` to machine
    precision).

    ``env`` MUST be converged on the sign-dressed double layer
    (:func:`tpeps.ctm.generic_abelian.ctmrg_dl.run_fermionic`) — see the
    module docstring; a bosonic-layer env silently yields wrong values
    at distance.

    :param op1, op2: rank-2 AbelianTensors ``op[z, s]`` on the physical
        leg, charge-homogeneous and of EQUAL parity (parity-even or
        parity-odd pair; a mixed pair has no parity-conserving two-point
        function and is rejected).
    :param direction: (1, 0) only (horizontal row; evaluate columns on
        the lattice-rotated state).
    :return: jnp array of length ``dist`` (values at r = 1..dist).
    """
    if direction != (1, 0):
        raise NotImplementedError("grow with (1,0) on the (rotated) state")
    if _op_parity(op1) != _op_parity(op2):
        raise ValueError(
            "op1 and op2 carry different fermion parities; a mixed pair "
            "has no well-defined dressed two-point function"
        )
    op1 = _bosonic(op1)
    op2 = _bosonic(op2)
    odd = _op_parity(op1) == 1
    s1, s2 = PAIR_STRINGS["h"] if odd else ((), ())

    def site(c):
        return state.sites[state.vertexToSite(c)]

    # per-unique-site caches of the paired double tensors
    cache = {}

    def cols(c):
        key = state.vertexToSite(c)
        if key not in cache:
            a = site(c)
            cache[key] = dict(
                closed=double_tensor_ab(a),
                mid=double_tensor_ab(a, string=MID_STRING_H) if odd else None,
            )
        return cache[key]

    c0 = coord
    a0 = site(c0)
    Eo1 = double_tensor_ab(a0, string=s1, open_phys=True)
    E0 = get_edge(c0, (-1, 0), state, env)
    E0 = _bosonic(E0)

    def op_col(Eo, op):
        # (s, z, uk, ub, ...) x op[z, s] -> (uk, ub, lk, lb, dk, db, rk, rb)
        return Eo.tensordot(op, ((0, 1), (1, 0)))

    if odd:
        op1e, op1o = _split_by_out_parity(op1)
        Le = _apply_col(c0, state, env, E0, op_col(Eo1, op1e))
        Lo = _apply_col(c0, state, env, E0, op_col(Eo1, op1o))
    else:
        Le = _apply_col(c0, state, env, E0, op_col(Eo1, op1))
        Lo = None
    Ln = _apply_col(c0, state, env, E0, cols(c0)["closed"])

    vals = []
    c = c0
    for r in range(1, dist + 1):
        if r > 1:
            # the site at distance r-1 becomes a passed (mid) column
            k = cols(c)
            Le = _apply_col(c, state, env, Le, k["mid"] if odd else k["closed"])
            if odd:
                Lo = _apply_col(c, state, env, Lo, k["mid"])
            Ln = _apply_col(c, state, env, Ln, k["closed"])
            s = _edge_max(Ln)
            if s > 0.0:
                Le = Le * (1.0 / s)
                Ln = Ln * (1.0 / s)
                if odd:
                    Lo = Lo * (1.0 / s)
        c = _shift(c, direction)
        if odd and r > 1:
            # block sign -(-1)^{(n_mid-1) p(z_1)}, n_mid = r - 1
            L = (Le + ((-1.0) ** (r - 2)) * Lo) * (-1.0)
        elif odd:
            L = Le + Lo
        else:
            L = Le
        a_r = site(c)
        Eo2 = double_tensor_ab(a_r, string=s2, open_phys=True)
        num_edge = _apply_col(c, state, env, L, op_col(Eo2, op2))
        den_edge = _apply_col(c, state, env, Ln, cols(c)["closed"])
        num = _close_right(c, state, env, num_edge)
        den = _close_right(c, state, env, den_edge)
        v = num / den
        if odd:
            # dressing convention -> physical Fock ordering (dl_fermi)
            v = v * ((-1.0) ** r)
        vals.append(v)
    return jnp.stack(vals)
