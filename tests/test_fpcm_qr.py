"""FPCM and QR-projector C4v moves: same fixed point as the standard
(SYMEIG) move (VERDICT r1 item 9; reference fpcm_c4v.py:17,
ctmrg_c4v.py:465)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpeps.ctm.c4v.ctmrg import run_fixed_point
from tpeps.ctm.c4v.env import init_env
from tpeps.ctm.c4v.fpcm import fpcm_move_sl, isogauge_mps, pull_through
from tpeps.ipeps.ipeps_c4v import symmetrize_c4v
from tpeps.models.j1j2 import J1J2_C4V_BIPARTITE


@pytest.fixture(scope="module")
def setup(D=2, chi=16):
    rng = np.random.RandomState(0)
    a = symmetrize_c4v(jnp.asarray(rng.rand(2, D, D, D, D) - 0.5), normalize=True)
    model = J1J2_C4V_BIPARTITE(j1=1.0, j2=0.3)
    env0 = init_env(a, chi, "CTMRG")
    env_ref, n, dist, _ = run_fixed_point(a, env0, max_iter=200, conv_tol=1e-11)
    e_ref = float(model.energy_1x1_lowmem(a, env_ref))
    return a, model, env0, env_ref, e_ref, int(n)


def test_qr_move_same_energy(setup):
    a, model, env0, _, e_ref, _ = setup
    env_qr, n, dist, _ = run_fixed_point(
        a, env0, max_iter=300, conv_tol=1e-11, projector_method="QR"
    )
    e_qr = float(model.energy_1x1_lowmem(a, env_qr))
    assert abs(e_qr - e_ref) < 1e-9


def test_fpcm_same_fixed_point_fewer_moves(setup):
    a, model, env0, _, e_ref, n_ref = setup
    # a handful of warmup moves, then the fixed-point solve
    n_warm = 4
    env_w, _, _, _ = run_fixed_point(a, env0, max_iter=n_warm, conv_tol=1e-30)
    env_fp = fpcm_move_sl(a, env_w)
    e_fp = float(model.energy_1x1_lowmem(a, env_fp))
    assert abs(e_fp - e_ref) < 1e-9
    assert n_warm < n_ref  # fewer absorption moves than plain CTMRG


def test_pull_through_isometry(setup):
    a, model, env0, env_ref, *_ = setup
    C, U = isogauge_mps(env_ref.T, C0=env_ref.C)
    chi, D2 = U.shape[0], U.shape[2]
    # U is an isometry on the fused (chi, D2) space
    Um = U.transpose(0, 2, 1).reshape(chi * D2, chi)
    assert float(jnp.abs(Um.conj().T @ Um - jnp.eye(chi)).max()) < 1e-10
    # pulling-through residual: C T ~ U C
    P, U2 = pull_through(C, env_ref.T)
    assert float(jnp.linalg.norm(C - P)) < 1e-6
