"""Looped/sliced contraction == direct contraction (the reference's
tests/test_rdms_loop.py strategy, SURVEY.md §4): index-unrolled RDMs and
phys-sliced corners must equal the direct versions exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpeps.config import CtmArgs
from tpeps.ctm.generic import rdm_patch
from tpeps.ctm.generic.components import corner_ld, corner_lu, corner_rd, corner_ru
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import IPEPS


@pytest.fixture(scope="module")
def converged(d=3, D=2, chi=8):
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.rand(d, D, D, D, D) - 0.5)
    st = IPEPS({(0, 0): A / jnp.linalg.norm(A)}, lX=1, lY=1)
    env = init_env(st, chi, "CTMRG")
    env, _ = run(st, env, CtmArgs(ctm_max_iter=30, ctm_conv_tol=1e-8))
    return st, env


def test_sliced_corners_equal_direct(converged):
    st, env = converged
    args = ((0, 0), st.sites, st.vertexToSite, env.C, env.T)
    for fn in (corner_lu, corner_ru, corner_rd, corner_ld):
        for open_phys in (False, True):
            direct = fn(*args, open_phys=open_phys)
            sliced = fn(*args, open_phys=open_phys, slice_phys=True)
            assert float(jnp.abs(direct - sliced).max()) < 1e-13, (fn.__name__, open_phys)


def test_rdm2x3_loop_equals_direct(converged):
    st, env = converged
    args = ((0, 0), st.sites, st.vertexToSite, env.C, env.T)
    direct = rdm_patch.rdm2x3_open1234(*args)
    looped = rdm_patch.rdm2x3_open1234_loop(*args)
    assert float(jnp.abs(direct - looped).max()) < 1e-13


def test_rdm3x2_loop_equals_direct(converged):
    st, env = converged
    args = ((0, 0), st.sites, st.vertexToSite, env.C, env.T)
    direct = rdm_patch.rdm3x2_open1234(*args)
    looped = rdm_patch.rdm3x2_open1234_loop(*args)
    assert float(jnp.abs(direct - looped).max()) < 1e-13


def test_rdm2x2_open_sliced(converged):
    st, env = converged
    args = ((0, 0), st.sites, st.vertexToSite, env.C, env.T)
    direct = rdm_patch.rdm2x2_open(*args, open_sites=(0, 3))
    sliced = rdm_patch.rdm2x2_open(*args, open_sites=(0, 3), slice_phys=True)
    assert float(jnp.abs(direct - sliced).max()) < 1e-13


@pytest.mark.slow
def test_large_d_corner_runs():
    """Capability: a d=64 (maple-leaf-sized) corner that would
    materialize a chi^2 D^4 d intermediate runs in sliced mode."""
    d, D, chi = 64, 2, 16
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.rand(d, D, D, D, D) - 0.5)
    A = A / jnp.linalg.norm(A)
    st = IPEPS({(0, 0): A}, lX=1, lY=1)
    env = init_env(st, chi, "CTMRG")
    c = corner_lu((0, 0), st.sites, st.vertexToSite, env.C, env.T,
                  open_phys=True, slice_phys=True)
    assert np.isfinite(np.asarray(c)).all()


def test_rdm2x3_compressed_physical():
    """Compressed 2x3 ring-exchange RDM (rdm_looped.py compressed
    counterpart): on a converged physical state the CTM-projector
    compression tracks the full contraction closely even at strong
    compression."""
    from tpeps.ctm.generic.rdm_patch import (
        rdm2x3_open1234, rdm2x3_open1234_compressed)
    from tpeps.ipeps.ipeps import IPEPS_WEIGHTED
    from tpeps.itevol.simple_update import (
        all_nn_bonds, gate_from_hamiltonian, run_seq_2s)

    sites = {
        (0, 0): jnp.asarray(np.array([1.0, 0.1]).reshape(2, 1, 1, 1, 1)),
        (1, 0): jnp.asarray(np.array([0.1, 1.0]).reshape(2, 1, 1, 1, 1)),
        (0, 1): jnp.asarray(np.array([0.1, 1.0]).reshape(2, 1, 1, 1, 1)),
        (1, 1): jnp.asarray(np.array([1.0, 0.1]).reshape(2, 1, 1, 1, 1)),
    }
    state = IPEPS_WEIGHTED(sites=sites, lX=2, lY=2)
    Sz = np.diag([0.5, -0.5])
    Sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    SS = np.kron(Sz, Sz) + 0.5 * (np.kron(Sp, Sp.T) + np.kron(Sp.T, Sp))
    h2 = jnp.asarray(SS.reshape(2, 2, 2, 2))
    for tau, n in [(0.5, 20), (0.1, 20)]:
        g = gate_from_hamiltonian(h2, tau)
        for _ in range(n):
            state = run_seq_2s(state, [(b, g) for b in all_nn_bonds(state)],
                               max_D=2)
    st = state.absorb_weights()
    env, _ = run(st, init_env(st, 16),
                 CtmArgs(ctm_max_iter=100, ctm_conv_tol=1e-10))
    args = ((0, 0), st.sites, st.vertexToSite, env.C, env.T)
    full = np.array(rdm2x3_open1234(*args))
    n1 = full / np.trace(full.reshape(16, 16))
    comp = np.array(rdm2x3_open1234_compressed(*args, compressed_chi=16))
    n2 = comp / np.trace(comp.reshape(16, 16))
    assert np.abs(n1 - n2).max() < 1e-4

    # 3x2 compressed: the transpose delegate must track the direct 3x2
    # contraction the same way, and the compressed-chi sequence must
    # converge monotonically toward the full RDM
    from tpeps.ctm.generic.rdm_patch import (
        rdm3x2_open1234, rdm3x2_open1234_compressed, rdm_compressed_sequence)

    full32 = np.array(rdm3x2_open1234(*args))
    m1 = full32 / np.trace(full32.reshape(16, 16))
    seq = rdm_compressed_sequence(rdm3x2_open1234_compressed, *args,
                                  chi_sequence=(8, 16))
    errs = []
    for comp32 in seq:
        m2 = np.array(comp32) / np.trace(np.array(comp32).reshape(16, 16))
        errs.append(np.abs(m1 - m2).max())
    assert errs[-1] < 1e-4
    assert errs[-1] <= errs[0] + 1e-12
