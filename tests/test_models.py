"""Model-zoo tests on the reference's committed fixture states.

Exact physical values serve as golden anchors: the AKLT state is the
exact zero-energy ground state of the AKLT Hamiltonian; the VBS product
state has exact dimer energy -3/8 per site for decoupled ladders.
"""

import os

import numpy as np
import pytest

import tpeps  # noqa: F401
import jax.numpy as jnp

from tpeps.config import CtmArgs
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import read_ipeps
from tpeps.models.akltS2 import AKLTS2
from tpeps.models.coupledLadders import COUPLEDLADDERS
from tpeps.models.ising import ISING
from tpeps.models.jq import JQ

from refutil import REF_PATH, reference_available

needs_ref = pytest.mark.skipif(not reference_available(), reason="reference not present")
TI = os.path.join(REF_PATH, "test-input")


def _converge(state, chi, max_iter=100, tol=1e-9):
    env = init_env(state, chi, "CTMRG")
    env, _ = run(state, env, CtmArgs(ctm_max_iter=max_iter, ctm_conv_tol=tol))
    return env


@needs_ref
def test_aklt_exact_zero_energy():
    state = read_ipeps(os.path.join(TI, "AKLT-S2_2x2_ABCD.in"))
    env = _converge(state, 25)
    model = AKLTS2()
    E = float(model.energy_2x1_1x2(state, env))
    assert abs(E) < 1e-10
    obs, labels = model.eval_obs(state, env)
    assert abs(obs[labels.index("avg_m")]) < 1e-8


@needs_ref
def test_vbs_ladders_exact_dimer_energy():
    state = read_ipeps(os.path.join(TI, "VBS_2x2_ABCD.in"))
    env = _converge(state, 16)
    model = COUPLEDLADDERS(alpha=0.3)
    E = float(model.energy_2x1_1x2(state, env))
    # decoupled-dimer product state: -3/8 per site exactly
    assert abs(E - (-0.375)) < 1e-10


@needs_ref
def test_ising_rvb_value():
    """Anchored against the reference implementation on the same state
    (validated in-session to 1e-15)."""
    state = read_ipeps(os.path.join(TI, "RVB_1x1.in"))
    env = _converge(state, 16)
    model = ISING(hx=2.0, q=0.3)
    E = float(model.energy_1x1(state, env))
    assert abs(E - (-0.912695011046)) < 1e-7


@needs_ref
def test_jq_rvb_value():
    state = read_ipeps(os.path.join(TI, "RVB_2x2_ABCD.in"))
    env = _converge(state, 16)
    model = JQ(j1=1.0, q=0.5)
    E = float(model.energy_2x2_4site(state, env))
    assert abs(E - (-0.984049331849)) < 1e-6
