"""MPO-expectation RDM evaluator tests: cross-checked against dense RDM
contractions and single-site expectations on random states."""

import numpy as np
import pytest

import tpeps  # noqa: F401
import jax.numpy as jnp

from tpeps.config import CtmArgs
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ctm.generic import rdm as rdm_gen
from tpeps.ctm.generic.rdm_mpo import (
    eval_mpo_rdm1x3,
    eval_mpo_rdm2x2,
    eval_mpo_rdm3x1,
    mpo_from_gate,
)
from tpeps.ipeps.ipeps import IPEPS


@pytest.fixture(scope="module")
def state_env():
    rng = np.random.RandomState(17)
    sites = {(x, y): jnp.asarray(rng.rand(2, 2, 2, 2, 2) - 0.5)
             for x in range(2) for y in range(2)}
    sites = {c: t / jnp.linalg.norm(t) for c, t in sites.items()}
    state = IPEPS(sites=sites, lX=2, lY=2)
    env = init_env(state, 12, "CTMRG")
    env, _ = run(state, env, CtmArgs(ctm_max_iter=300, ctm_conv_tol=1e-12))
    return state, env


def _id_mpo(n, d=2):
    I = jnp.eye(d).reshape(1, d, 1, d)
    return (I,) * n


def test_mpo_rdm2x2_matches_dense(state_env):
    state, env = state_env
    sites, site_of = dict(state.sites), state.vertexToSite
    rng = np.random.RandomState(3)
    H = rng.rand(16, 16) - 0.5
    H = H + H.T
    mpo = mpo_from_gate(H, 4, 2)
    for coord in ((0, 0), (1, 0), (0, 1)):
        num = eval_mpo_rdm2x2(coord, sites, site_of, env.C, env.T, mpo)
        den = eval_mpo_rdm2x2(coord, sites, site_of, env.C, env.T, _id_mpo(4))
        rho = rdm_gen.rdm2x2(coord, sites, site_of, env.C, env.T)
        ref = jnp.einsum("ijklabcd,ijklabcd", rho,
                         jnp.asarray(H).reshape((2,) * 8))
        assert abs(float(num / den) - float(ref)) < 1e-10, coord


def test_mpo_strip_single_site_ops(state_env):
    """<op x I x I> on a strip equals the 1x1 RDM expectation."""
    state, env = state_env
    sites, site_of = dict(state.sites), state.vertexToSite
    rng = np.random.RandomState(5)
    op = jnp.asarray(rng.rand(2, 2))
    op = op + op.T
    # op acts on the ket (input) index: MPO tensor [1, ket, 1, bra]
    mpo_1 = (jnp.asarray(op).T.reshape(1, 2, 1, 2),) + _id_mpo(2)
    for coord in ((0, 0), (1, 1)):
        rho = rdm_gen.rdm1x1(coord, sites, site_of, env.C, env.T)
        ref = float(jnp.trace(rho @ op))
        num = eval_mpo_rdm1x3(coord, sites, site_of, env.C, env.T, mpo_1)
        den = eval_mpo_rdm1x3(coord, sites, site_of, env.C, env.T, _id_mpo(3))
        assert abs(float(num / den) - ref) < 5e-6, ("h", coord)  # cross-network: finite-chi patch inconsistency
        num = eval_mpo_rdm3x1(coord, sites, site_of, env.C, env.T, mpo_1)
        den = eval_mpo_rdm3x1(coord, sites, site_of, env.C, env.T, _id_mpo(3))
        assert abs(float(num / den) - ref) < 5e-6, ("v", coord)


def test_mpo_strip_two_site_matches_rdm2x1(state_env):
    """A 2-site gate embedded as a 3-site MPO (gate x I) equals the
    rdm2x1/rdm1x2 expectation."""
    state, env = state_env
    sites, site_of = dict(state.sites), state.vertexToSite
    rng = np.random.RandomState(7)
    h2 = rng.rand(4, 4) - 0.5
    h2 = h2 + h2.T
    mpo2 = mpo_from_gate(h2, 2, 2) + _id_mpo(1)
    coord = (0, 0)
    r21 = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
    ref = float(jnp.einsum("ijab,ijab", r21, jnp.asarray(h2).reshape(2, 2, 2, 2)))
    num = eval_mpo_rdm1x3(coord, sites, site_of, env.C, env.T, mpo2)
    den = eval_mpo_rdm1x3(coord, sites, site_of, env.C, env.T, _id_mpo(3))
    assert abs(float(num / den) - ref) < 5e-6
    r12 = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
    ref_v = float(jnp.einsum("ijab,ijab", r12, jnp.asarray(h2).reshape(2, 2, 2, 2)))
    num = eval_mpo_rdm3x1(coord, sites, site_of, env.C, env.T, mpo2)
    den = eval_mpo_rdm3x1(coord, sites, site_of, env.C, env.T, _id_mpo(3))
    assert abs(float(num / den) - ref_v) < 5e-6
