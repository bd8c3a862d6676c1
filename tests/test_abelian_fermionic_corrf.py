"""Block-sparse fermionic correlators (corrf_1sO1sO_fermionic) —
counterpart of reference ctm/generic_abelian/corrf_fermionic.py:29-227.

Two anchors:

1. the exact horizontal-dimer state (closed-form correlators — the
   same gold values as tests/test_fermionic_dl.py::test_corrf_distance_dimer),
2. same-env machine-exact equivalence with the dense dl_fermi
   correlator on a random U(1) fermionic state: converge ONE abelian
   environment, evaluate block-sparse and (densified) dense — the sign
   dressing port must agree to machine precision.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpeps.config import CtmArgs
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_ab
from tpeps.ctm.generic_abelian import env as env_ab
from tpeps.ctm.generic_abelian.corrf_fermionic import corrf_1sO1sO_fermionic
from tpeps.ctm.generic_abelian.to_dense import densify
from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN
from tpeps.sym.tensor import AbelianTensor, leg


def _op(Lp, blocks, n, dtype):
    o = AbelianTensor("U1", (1, -1), (Lp, Lp), n, dtype=dtype)
    for k, v in blocks.items():
        o.blocks[k] = jnp.asarray(v, dtype=dtype)
    return o


def _fused_ops(Lp, dtype):
    """c_B, c^dag_A, n_A, n_B on the fused 2-mode physical leg
    (dense basis |00>, |10>, |01>, |11>; intra-site Jordan-Wigner sign
    on the second mode)."""
    cB = _op(Lp, {(-1, 0): [[0.0, 1.0]], (0, 1): [[-1.0], [0.0]]}, -1, dtype)
    cpA = _op(Lp, {(0, -1): [[1.0], [0.0]], (1, 0): [[0.0, 1.0]]}, 1, dtype)
    nA = _op(Lp, {(0, 0): [[1.0, 0.0], [0.0, 0.0]], (1, 1): [[1.0]]}, 0, dtype)
    nB = _op(Lp, {(0, 0): [[0.0, 0.0], [0.0, 1.0]], (1, 1): [[1.0]]}, 0, dtype)
    return cB, cpA, nA, nB


def _bosonic_np(a):
    return AbelianTensor(a.sym, a.signature, a.legs, a.n, a.blocks,
                         a.dtype, False).to_backend("np")


def test_dimer_gold():
    """Exact horizontal-dimer state: <c_B(0) c^dag_A(r)> = -1/2 at r=1
    (the dimer bond) and 0 beyond; <n_B(0) n_A(r)> = 0 at r=1
    (same-dimer exclusion) and 1/4 beyond (independent dimers)."""
    Lp = leg({-1: 1, 0: 2, 1: 1})
    L2 = leg({0: 1, 1: 1})
    L1 = leg({0: 1})
    s2v = 1 / np.sqrt(2)
    a = AbelianTensor("U1", (1, 1, 1, -1, -1), (Lp, L1, L2, L1, L2), 0,
                      dtype=jnp.complex128, fermionic=True)
    ent = {(1, 1): (0, 0, 1.0), (0, 0): (0, 1, -1.0),
           (1, 0): (1, 0, 1.0), (0, 1): (-1, 0, 1.0)}
    for (ql, qr), (qs, idx, sg) in ent.items():
        key = (qs, 0, ql, 0, qr)
        sh = a.block_shape(key)
        blk = np.zeros(sh, dtype=complex)
        blk[(idx,) + (0,) * (len(sh) - 1)] = s2v * sg
        a.blocks[key] = jnp.asarray(blk)

    st = IPEPS_ABELIAN("U1", {(0, 0): _bosonic_np(a)})
    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-11)
    env, _ = ctmrg_ab.run(st, env_ab.init_env(st, 8), cfg)

    cB, cpA, nA, nB = _fused_ops(Lp, a.dtype)
    vc = np.asarray(corrf_1sO1sO_fermionic((0, 0), (1, 0), st, env,
                                           cB, cpA, 4))
    assert np.abs(vc - np.array([-0.5, 0.0, 0.0, 0.0])).max() < 1e-9, vc
    vd = np.asarray(corrf_1sO1sO_fermionic((0, 0), (1, 0), st, env,
                                           nB, nA, 4))
    assert np.abs(vd - np.array([0.0, 0.25, 0.25, 0.25])).max() < 1e-9, vd


def test_same_env_matches_dl_dense():
    """Same abelian env, two evaluators: block-sparse vs dl_fermi dense
    (through densify) — the per-block sign dressing must reproduce the
    dense mask contraction to machine precision, odd and even pairs."""
    from tpeps.ctm.generic.dl_fermi import corrf_1sO1sO_h
    from tpeps.models.fermion.tv_model import (phys_leg_u1,
                                               random_1x1_state_U1)

    Lp = phys_leg_u1()
    st0 = random_1x1_state_U1({-1: 1, 0: 1, 1: 1}, key=1)
    a = st0.site((0, 0))
    st = IPEPS_ABELIAN("U1", {(0, 0): _bosonic_np(a)})
    cfg = CtmArgs(ctm_max_iter=40, ctm_conv_tol=1e-9)
    env, _ = ctmrg_ab.run(st, env_ab.init_env(st, 8), cfg)
    _, denv = densify(st, env)

    def dense_op(o):
        d = np.zeros((4, 4), dtype=complex)
        off = {-1: 0, 0: 1, 1: 3}
        dims = {-1: 1, 0: 2, 1: 1}
        for (qz, qs), b in o.blocks.items():
            d[off[qz]:off[qz] + dims[qz],
              off[qs]:off[qs] + dims[qs]] = np.asarray(b)
        return d

    cB, cpA, nA, nB = _fused_ops(Lp, a.dtype)
    for o1, o2 in ((cB, cpA), (nB, nA)):
        v_ab = np.asarray(corrf_1sO1sO_fermionic((0, 0), (1, 0), st, env,
                                                 o1, o2, 3))
        v_dl = np.asarray(corrf_1sO1sO_h(a, denv, dense_op(o1),
                                         dense_op(o2), 3))
        assert np.abs(v_ab - v_dl).max() < 1e-12, (v_ab, v_dl)


def test_double_tensor_ab_matches_dense_mask():
    """The block-sparse dressed double tensor (closed) embeds to exactly
    the dense dl_fermi double tensor (sign mask applied per block pair
    == per dense element)."""
    from tpeps.ctm.generic.dl_fermi import double_tensor
    from tpeps.ctm.generic_abelian.corrf_fermionic import double_tensor_ab
    from tpeps.models.fermion.tv_model import random_1x1_state_U1

    a = random_1x1_state_U1({-1: 1, 0: 1, 1: 1}, key=3).site((0, 0))
    E_ab = double_tensor_ab(a)                       # (uk,ub,...,rk,rb)
    Ed = np.asarray(E_ab.to_dense())
    s = Ed.shape
    Ed = Ed.reshape(s[0] * s[1], s[2] * s[3], s[4] * s[5], s[6] * s[7])
    E_ref = np.asarray(double_tensor(a))
    assert np.abs(Ed - E_ref).max() < 1e-13


def test_independent_graded_env_matches_dl():
    """INDEPENDENT environments, one per engine: the graded abelian env
    (ctmrg_dl.run_fermionic — fixed point of the sign-dressed double
    layer) reproduces the dense dl_fermi correlators.  This is the
    round-4 bug regression: an env converged on the BOSONIC layer
    (ctmrg_ab.run) is a fixed point of the wrong transfer operator and
    disagrees at distance (~7e-3 on the CI state)."""
    from tpeps.config import CtmArgs as _CtmArgs
    from tpeps.ctm.generic.dl_fermi import corrf_1sO1sO_h
    from tpeps.ctm.generic_abelian.ctmrg_dl import run_fermionic
    from tpeps.models.fermion.tv_model import (TVModel, phys_leg_u1,
                                               random_1x1_state_U1)

    st = random_1x1_state_U1({-1: 1, 0: 1, 1: 1}, key=1)
    a = st.site((0, 0))
    model = TVModel(t1=1.0)
    cfg = _CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-10)

    denv, _ = model.converge(a, 8, cfg)             # dense fixed point
    aenv, _ = run_fermionic(st, 8, cfg)             # graded abelian one

    Lp = phys_leg_u1()

    def dense(o):
        d = np.zeros((4, 4), dtype=complex)
        off = {-1: 0, 0: 1, 1: 3}
        dims = {-1: 1, 0: 2, 1: 1}
        for (qz, qs), b in o.blocks.items():
            d[off[qz]:off[qz] + dims[qz],
              off[qs]:off[qs] + dims[qs]] = np.asarray(b)
        return d

    cB, cpA, nA, nB = _fused_ops(Lp, a.dtype)
    for o1, o2 in ((cB, cpA), (nB, nA)):
        v_ab = np.asarray(corrf_1sO1sO_fermionic((0, 0), (1, 0), st, aenv,
                                                 o1, o2, 3))
        v_dl = np.asarray(corrf_1sO1sO_h(a, denv, dense(o1), dense(o2), 3))
        assert np.abs(v_ab - v_dl).max() < 1e-8, (v_ab, v_dl)


def test_mixed_parity_pair_rejected():
    """(odd, even) operator pairs are rejected instead of silently
    returning garbage (ADVICE r4)."""
    from tpeps.models.fermion.tv_model import phys_leg_u1

    Lp = phys_leg_u1()
    cB, cpA, nA, nB = _fused_ops(Lp, jnp.complex128)
    with pytest.raises(ValueError):
        corrf_1sO1sO_fermionic((0, 0), (1, 0), None, None, cB, nA, 2)


def test_op_from_dense_roundtrip():
    """op_from_dense inverts the charge-sorted dense embedding: block
    content, charge-transfer sector n, and to_dense() all round-trip;
    a sector-mixing matrix is rejected."""
    from tpeps.ctm.generic_abelian.corrf_fermionic import op_from_dense
    from tpeps.models.fermion.tv_model import phys_leg_u1

    Lp = phys_leg_u1()
    rng = np.random.default_rng(7)
    # charge-homogeneous annihilator-like op: dq = -1 for every block
    blocks = {(-1, 0): rng.standard_normal((1, 2)),
              (0, 1): rng.standard_normal((2, 1))}
    o = _op(Lp, blocks, -1, jnp.float64)
    back = op_from_dense(Lp, np.asarray(o.to_dense()))
    assert back.n == -1
    assert set(back.blocks) == set(blocks)
    for k, v in blocks.items():
        assert np.abs(np.asarray(back.blocks[k]) - v).max() < 1e-14
    assert np.abs(np.asarray(back.to_dense()) -
                  np.asarray(o.to_dense())).max() < 1e-14
    # mixing dq=-1 and dq=+1 sectors must raise
    bad = np.asarray(o.to_dense()) + np.asarray(o.to_dense()).T
    with pytest.raises(ValueError):
        op_from_dense(Lp, bad)
