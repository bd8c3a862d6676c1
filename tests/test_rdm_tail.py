"""Residual generic-RDM tail vs the torch oracle: aux_rdm{0x1,1x1,1x2},
norm_3x3, rdm2x2_id_overlap (closure_2x2), get_full_EH_spec_Ttensor."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpeps.ctm.generic import rdm as m_rdm
from tpeps.ctm.generic import transferops as m_top
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import IPEPS

from refutil import import_reference, reference_available

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


def _random_state(lX=2, lY=2, d=2, D=2, seed=0):
    rng = np.random.RandomState(seed)
    sites = {
        (x, y): jnp.asarray(rng.rand(d, D, D, D, D) - 0.5)
        for x in range(lX)
        for y in range(lY)
    }
    return IPEPS(sites, lX=lX, lY=lY)


@pytest.fixture(scope="module")
def ref():
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()

    class Ref:
        pass

    r = Ref()
    r.torch = __import__("torch")
    from ctm.generic import rdm, rdm_overlap, transferops
    from ctm.generic.env import ENV, init_env as r_init

    r.rdm = rdm
    r.rdm_overlap = rdm_overlap
    r.transferops = transferops
    r.ENV = ENV
    r.init_env = r_init
    return r


def _pair(state, chi, ref):
    env = init_env(state, chi, "CTMRG")
    rstate = __import__("ipeps.ipeps", fromlist=["IPEPS"]).IPEPS(
        {c: ref.torch.from_numpy(np.asarray(t)) for c, t in state.sites.items()},
        lX=state.lX, lY=state.lY,
    )
    renv = ref.ENV(chi, rstate)
    ref.init_env(rstate, renv)
    return env, rstate, renv


@needs_ref
def test_aux_rdms_vs_reference(ref):
    chi = 8
    state = _random_state(seed=5)
    env, rstate, renv = _pair(state, chi, ref)
    sites, site_of = state.sites, state.vertexToSite

    for coord in [(0, 0), (1, 0)]:
        mv = np.asarray(m_rdm.aux_rdm1x1(coord, sites, site_of, env.C, env.T))
        rv = ref.rdm.aux_rdm1x1(coord, rstate, renv).numpy()
        assert np.abs(mv - rv).max() < 1e-10

    # aux_rdm1x2: the reference builds BOTH columns from coord's env
    # tensors (rdm.py:2934-2935 calls _Lhalf/_Rhalf with the same
    # coord), which only equals the true two-column network on 1-site
    # cells; this repo uses each column's own tensors, so compare there.
    state1 = _random_state(lX=1, lY=1, seed=5)
    env1, rstate1, renv1 = _pair(state1, chi, ref)
    mv = np.asarray(m_rdm.aux_rdm1x2((0, 0), state1.sites,
                                     state1.vertexToSite, env1.C, env1.T))
    rv = ref.rdm.aux_rdm1x2((0, 0), rstate1, renv1).numpy()
    assert np.abs(mv - rv).max() < 1e-10

    try:
        rv = ref.rdm.aux_rdm0x1((0, 0), rstate, renv).numpy()
    except Exception as e:  # oe/path-engine dependent in the reference
        pytest.skip(f"reference aux_rdm0x1 unavailable here: {e}")
    mv = np.asarray(m_rdm.aux_rdm0x1((0, 0), sites, site_of, env.C, env.T))
    assert np.abs(mv - rv).max() < 1e-10


@needs_ref
def test_norm_3x3_vs_reference(ref):
    chi = 8
    state = _random_state(seed=7)
    env, rstate, renv = _pair(state, chi, ref)
    mv = float(m_rdm.norm_3x3((0, 0), state.sites, state.vertexToSite,
                              env.C, env.T))
    rv = float(ref.rdm.norm_3x3((0, 0), rstate, renv))
    assert abs(mv - rv) < 1e-8 * max(abs(rv), 1.0), (mv, rv)


@needs_ref
def test_closure_2x2_vs_reference_overlap(ref):
    from tpeps.ctm.generic.overlap import closure_2x2

    chi = 8
    state1 = _random_state(seed=3)
    state2 = _random_state(seed=4)
    env, rstate1, renv = _pair(state1, chi, ref)
    rstate2 = __import__("ipeps.ipeps", fromlist=["IPEPS"]).IPEPS(
        {c: ref.torch.from_numpy(np.asarray(t)) for c, t in state2.sites.items()},
        lX=2, lY=2,
    )
    mv = complex(closure_2x2((0, 0), state1, state2, env))
    rv = complex(ref.rdm_overlap.rdm2x2_id_overlap((0, 0), rstate1, rstate2, renv))
    assert abs(mv - rv) < 1e-8 * max(abs(rv), 1.0), (mv, rv)


def test_full_eh_spec_matches_iterative():
    """The dense full-EH spectrum's leading values agree with the
    Arnoldi-based get_EH_spec_Ttensor on a converged 1-site env."""
    from tpeps.config import CtmArgs
    from tpeps.ctm.generic import ctmrg

    rng = np.random.RandomState(2)
    A = jnp.asarray(rng.rand(2, 2, 2, 2, 2) - 0.5)
    state = IPEPS({(0, 0): A}, lX=1, lY=1)
    chi = 8
    env = init_env(state, chi, "CTMRG")
    env, _ = ctmrg.run(state, env, CtmArgs(ctm_max_iter=40, ctm_conv_tol=1e-8))
    full = m_top.get_full_EH_spec_Ttensor(3, (0, 0), (1, 0), state, env)
    it = m_top.get_EH_spec_Ttensor(4, 3, (0, 0), (1, 0), state, env)
    it_c = it[:, 0] + 1j * it[:, 1]
    assert np.abs(np.abs(full[:4]) - np.abs(it_c)).max() < 1e-6
