"""Unit tests for the Ozaki-scheme exact-int8 f64 matmul
(tpeps/linalg/ozaki.py) — the f64-accuracy speed lever of the mixed
CTMRG driver (run_ctmrg_tpu_mixed f64_dot_impl="ozaki[:s]").

Accuracy contract: relative error ~ K * 2**(-7s) for s mantissa slices
of 7 bits; the driver's 1e-8 energy-parity gate needs s >= 7 at CTMRG
sizes (K ~ 1e4).
"""

import numpy as np
import pytest

import tpeps  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp

from tpeps.linalg.ozaki import ozaki_dot_general, ozaki_matmul


def _rel_err(C, Cref):
    return float(np.abs(np.asarray(C) - np.asarray(Cref)).max()
                 / np.abs(np.asarray(Cref)).max())


@pytest.mark.parametrize("s,bound", [(8, 1e-13), (7, 1e-11), (6, 3e-10)])
def test_ozaki_matmul_accuracy(s, bound):
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(192, 257))
    B = jnp.asarray(rng.randn(257, 129))
    C = ozaki_matmul(A, B, s, 7)
    assert _rel_err(C, A @ B) < bound


def test_ozaki_matmul_dynamic_range():
    """Per-row/col power-of-two scaling must keep accuracy when rows
    and columns span many orders of magnitude."""
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.randn(64, 96) * np.logspace(-12, 9, 64)[:, None])
    B = jnp.asarray(rng.randn(96, 64) * np.logspace(8, -11, 64)[None, :])
    C = ozaki_matmul(A, B, 8, 7)
    assert _rel_err(C, A @ B) < 1e-12


def test_ozaki_matmul_zero_rows():
    A = jnp.zeros((16, 32), dtype=jnp.float64)
    B = jnp.asarray(np.random.RandomState(2).randn(32, 16))
    assert float(jnp.abs(ozaki_matmul(A, B, 8, 7)).max()) == 0.0


def test_ozaki_dot_general_batched_matches_xla():
    """Contracting + batch dims collapse correctly (the move's dots are
    multi-axis dot_generals, not plain matmuls)."""
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(3, 5, 4, 6))
    b = jnp.asarray(rng.randn(3, 6, 4, 7))
    dn = (((2, 3), (2, 1)), ((0,), (0,)))
    C = ozaki_dot_general(a, b, dn)
    Cref = jax.lax.dot_general(a, b, dn)
    assert _rel_err(C, Cref) < 1e-12


def test_ozaki_matmul_grad_is_exact_split_matmul():
    """custom VJP: gradient of sum(A@B) is the same split-path matmul —
    f64-class accurate, and jittable."""
    rng = np.random.RandomState(4)
    A = jnp.asarray(rng.randn(24, 32))
    B = jnp.asarray(rng.randn(32, 16))
    W = jnp.asarray(rng.randn(24, 16))

    f = jax.jit(lambda a, b: jnp.vdot(W, ozaki_matmul(a, b, 8, 7)))
    gA, gB = jax.grad(f, argnums=(0, 1))(A, B)
    assert _rel_err(gA, W @ B.T) < 1e-12
    assert _rel_err(gB, A.T @ W) < 1e-12


def test_move_dot_impl_slices_parse():
    """The move dispatcher's "ozaki:<s>" syntax selects the slice count."""
    from tpeps.ctm.c4v.move_tpu import _dot

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(32, 48))
    y = jnp.asarray(rng.randn(48, 24))
    dn = (((1,), (0,)), ((), ()))
    ref = jax.lax.dot_general(x, y, dn)
    assert _rel_err(_dot(x, y, dn, "ozaki:7"), ref) < 1e-11
    assert _rel_err(_dot(x, y, dn, "ozaki"), ref) < 1e-13
    # s=2 is visibly coarse — proves the knob is actually honored
    assert _rel_err(_dot(x, y, dn, "ozaki:2"), ref) > 1e-7
    # strict parsing (ADVICE r4): typos and malformed suffixes raise
    # with a clear message instead of silently taking a default path
    import pytest

    for bad in ("ozakii", "ozaki8", "ozaki:", "ozaki:x", "ozaki:0", "xl"):
        with pytest.raises(ValueError):
            _dot(x, y, dn, bad)


def test_ozaki_presplit_matches_matmul():
    """ozaki_presplit + ozaki_matmul_presplit (the reuse path of the
    factored-corner operator in move_tpu.ctm_move_sl_tpu) must agree
    with the one-shot ozaki_matmul bit-for-bit: both run the identical
    digit extraction and accumulation order."""
    from tpeps.linalg.ozaki import ozaki_matmul_presplit, ozaki_presplit

    rng = np.random.RandomState(3)
    A = jnp.asarray(rng.randn(96, 131) * np.exp(rng.randn(96, 131)))
    for s in (8, 7):
        Ac, ea = ozaki_presplit(A, s)
        ref = None
        for _ in range(3):  # several right operands reuse one split
            B = jnp.asarray(rng.randn(131, 40))
            got = ozaki_matmul_presplit(Ac, ea, B, s)
            full = ozaki_matmul(A, B, s, 7)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(full))
            assert _rel_err(got, A @ B) < (1e-12 if s == 8 else 1e-10)


def test_ozaki_move_matches_xla_f64():
    """One TPU-layout C4v move with dot_impl="ozaki" (which routes the
    subspace iteration through the pre-split corner operator) must land
    on the same projected spectrum and environment as dot_impl="xla"
    to the Ozaki accuracy contract."""
    from tpeps.ctm.c4v.env import init_env
    from tpeps.ctm.c4v.move_tpu import ctm_move_sl_tpu, to_tpu_layout
    from tpeps.ipeps.ipeps_c4v import symmetrize_c4v
    from tpeps.linalg.power import cold_start_basis

    rng = np.random.RandomState(5)
    D, chi = 3, 27
    a = symmetrize_c4v(jnp.asarray(rng.rand(2, D, D, D, D) - 0.5),
                       normalize=True)
    env = init_env(a, chi, "CTMRG")
    T_int = to_tpu_layout(env.T, D)
    P0 = cold_start_basis(chi * D * D, chi, env.C.dtype)
    C_x, T_x, spec_x, _ = ctm_move_sl_tpu(a, env.C, T_int, P0, dot_impl="xla")
    C_o, T_o, spec_o, _ = ctm_move_sl_tpu(a, env.C, T_int, P0, dot_impl="ozaki")
    assert float(jnp.abs(spec_x - spec_o).max()) < 1e-11
    assert float(jnp.abs(C_x - C_o).max()) < 1e-10
    assert float(jnp.abs(T_x - T_o).max()) < 1e-10
