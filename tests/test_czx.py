"""CZX model tests anchored by the exact CZX ground state.

The CZX state places a 4-spin GHZ state on every plaquette; as a PEPS,
each site's four corner spins copy the GHZ labels of the four adjacent
plaquettes through D=4 (=2x2) virtual bonds built from delta (copy)
tensors.  On this state the plaquette Hamiltonian term gives exactly -1
and the U_Z / U_X on-site symmetry expectations vanish.
"""

import numpy as np
import pytest

import tpeps  # noqa: F401
import jax.numpy as jnp

from tpeps.config import CtmArgs
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import IPEPS
from tpeps.models.czx import CZX, czx_ground_state, get_h_czx_mpo


def czx_exact_state():
    """Spin layout 0,1 / 3,2 clockwise (now provided by the model)."""
    return czx_ground_state()


@pytest.fixture(scope="module")
def czx_env():
    a = czx_exact_state()
    state = IPEPS(sites={(0, 0): a}, lX=1, lY=1)
    env = init_env(state, 16, "CTMRG")
    env, _ = run(state, env, CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-10))
    return state, env


def test_czx_mpo_structure():
    mpo = [np.asarray(m) for m in get_h_czx_mpo()]
    assert len(mpo) == 4
    assert mpo[0].shape[0] == 1 and mpo[-1].shape[2] == 1

    def matvec(x):
        # y[z0..z3] = sum_k prod_i M_i[m,k_i,m',z_i] x[k0..k3],
        # contracted site-by-site (a single greedy-path einsum would
        # materialize the dense 16^4 x 16^4 operator)
        t = np.einsum("kbz,kpqr->bzpqr", mpo[0][0], x.reshape(16, 16, 16, 16))
        t = np.einsum("bkcz,bwkqr->cwzqr", mpo[1], t)  # [c,z0,z1,k2,k3]
        t = np.einsum("ckdz,cwvkr->dwvzr", mpo[2], t)  # [d,z0,z1,z2,k3]
        y = np.einsum("dkz,dwvuk->wvuz", mpo[3][:, :, 0, :], t)
        return y.reshape(-1)

    rng = np.random.RandomState(0)
    # hermiticity via random matrix elements: <x|H|y> == <y|H|x>
    for _ in range(3):
        x = rng.rand(16, 16, 16, 16) - 0.5
        y = rng.rand(16, 16, 16, 16) - 0.5
        hxy = float(x.reshape(-1) @ matvec(y))
        hyx = float(y.reshape(-1) @ matvec(x))
        assert abs(hxy - hyx) < 1e-10 * max(1, abs(hxy))
    # spectral radius <= 1 (product of projectors and a tunneling term)
    x = rng.rand(16, 16, 16, 16) - 0.5
    for _ in range(40):
        v = matvec(x.reshape(16, 16, 16, 16))
        n = np.linalg.norm(v)
        if n < 1e-30:
            break
        x = (v / n).reshape(16, 16, 16, 16)
    lam = abs(float(x.reshape(-1) @ matvec(x)))
    assert lam < 1 + 1e-8


def test_czx_exact_state_energy(czx_env):
    state, env = czx_env
    model = CZX(g_czx=1.0, g_zxz=0.0, V=0.0, delta=0.0)
    eczx, ezxza, ezxzb, e_uz, e_ux, e_hz = model.eval_H_ops(state, env)
    assert abs(float(eczx) - (-1.0)) < 1e-8
    assert abs(float(e_uz)) < 1e-8
    assert abs(float(e_ux)) < 1e-8
    assert abs(float(e_hz)) < 1e-12  # delta = 0
    e = float(model.energy_per_site(state, env))
    assert abs(e - (-1.0)) < 1e-8


def test_czx_symmetry_expectation_V(czx_env):
    """V-term normalization: (e_uz - e_ux + 2) = 2 on the CZX state."""
    state, env = czx_env
    model = CZX(g_czx=0.0, V=0.5)
    e = float(model.energy_per_site(state, env))
    assert abs(e - 1.0) < 1e-8
