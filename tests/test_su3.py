"""SU(3) algebra + model tests.

Anchors: algebra identities (commutators, Casimir eigenvalue on the
singlet/adjoint), cross-validation of operators vs the reference, and
a run of the SU(3) models through the full pipeline on a random state.
"""

import numpy as np
import pytest

import tpeps  # noqa: F401
import jax.numpy as jnp

from tpeps.config import CtmArgs
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.groups.su3 import SU3_DEFINING

from refutil import reference_available

needs_ref = pytest.mark.skipif(not reference_available(), reason="reference not present")


def test_su3_algebra_identities():
    s3 = SU3_DEFINING()
    lam = np.asarray(s3.J_Gell_Mann())
    # Gell-Mann normalization tr(l_a l_b) = 2 delta_ab
    G = np.einsum("aij,bji->ab", lam, lam)
    assert np.abs(G - 2 * np.eye(8)).max() < 1e-13
    # quadratic Casimir of the defining irrep: sum_a (l_a/2)^2 = 4/3 I
    C = sum(l @ l for l in lam) / 4
    assert np.abs(C - (4 / 3) * np.eye(3)).max() < 1e-13
    # C1 as 2-site operator: P = 2 C1 + 1/3 must square to identity
    P = np.asarray(2 * s3.C1() + jnp.eye(9).reshape(3, 3, 3, 3) / 3).reshape(9, 9)
    assert np.abs(P @ P - np.eye(9)).max() < 1e-13
    # and act as the SWAP operator
    swap = np.zeros((3, 3, 3, 3))
    for i in range(3):
        for j in range(3):
            swap[i, j, j, i] = 1.0
    assert np.abs(P.reshape(3, 3, 3, 3) - swap).max() < 1e-13


@needs_ref
def test_su3_matches_reference():
    from refutil import import_reference
    import_reference()
    import groups.su3 as rsu3

    ref = rsu3.SU3_DEFINING()
    m = SU3_DEFINING()
    for name in ("TZ", "Y", "TP", "TM", "VP", "VM", "UP", "UM"):
        assert np.abs(np.asarray(getattr(m, name)())
                      - getattr(ref, name)().numpy()).max() < 1e-14, name
    assert np.abs(np.asarray(m.C1()) - ref.C1().numpy()).max() < 1e-14
    assert np.abs(np.asarray(m.J_Gell_Mann()) - ref.J_Gell_Mann().numpy()).max() < 1e-14
    assert np.abs(np.asarray(m.C2()) - ref.C2().numpy()).max() < 1e-12


def test_su3_aklt_permutation_ops():
    from tpeps.models.SU3_AKLT import SU3_AKLT, fmap, fmap_inv

    m = SU3_AKLT()
    P = np.asarray(m.P123)
    Pm = np.asarray(m.P123m)
    # P and P^-1 are inverse permutations
    assert np.abs(P @ Pm - np.eye(27)).max() == 0.0
    # P^3 = identity
    assert np.abs(P @ P @ P - np.eye(27)).max() == 0.0
    for s in range(27):
        assert fmap(*fmap_inv(s)) == s


def test_su3_chiral_pipeline():
    """SU3_CHIRAL energies and observables on a random fused-cell state."""
    from tpeps.ipeps.ipeps_kagome import IPEPS_KAGOME
    from tpeps.models.SU3_chiral import SU3_CHIRAL

    rng = np.random.RandomState(11)
    a = jnp.asarray(rng.rand(27, 2, 2, 2, 2) - 0.5)
    state = IPEPS_KAGOME(sites={(0, 0): a / jnp.linalg.norm(a)}, lX=1, lY=1)
    env = init_env(state, 8, "CTMRG")
    env, _ = run(state, env, CtmArgs(ctm_max_iter=40, ctm_conv_tol=1e-7))

    m = SU3_CHIRAL(Kr=1.0, Ki=0.2, j1=0.5)
    e_dn = float(m.energy_triangle_dn(state, env))
    e_up = float(m.energy_triangle_up(state, env))
    assert np.isfinite(e_dn) and np.isfinite(e_up)
    p23, p13, p12 = m.P_bonds_nn(state, env)
    (c3, c8) = m.eval_lambdas(state, env)[0], m.eval_lambdas(state, env)[1]
    # lambda_3 expectations bounded by 1; bond permutation bounded by 1
    for v in (*c3, *c8):
        assert abs(complex(v).real) < 1.0 + 1e-8
    for v in (p23, p13, p12):
        assert abs(float(v)) < 1.0 + 1e-8
    # chirality consistency: e_dn(Ki) - e_dn(-Ki) = 2*Ki*<i(P-P^-1)>_dn
    m_neg = SU3_CHIRAL(Kr=1.0, Ki=-0.2, j1=0.5)
    de = e_dn - float(m_neg.energy_triangle_dn(state, env))
    from tpeps.models.SU3_chiral import PERMUTE_TRIANGLE, PERMUTE_TRIANGLE_INV
    from tpeps.ctm.kagome import rdm_kagome

    chir = (1j * (PERMUTE_TRIANGLE - PERMUTE_TRIANGLE_INV)).astype(jnp.complex128)
    v_chir, _ = rdm_kagome.rdm2x2_dn_triangle_with_operator(
        (0, 0), dict(state.sites), state.vertexToSite, env.C, env.T, chir, 3)
    assert abs(de - 2 * 0.2 * complex(v_chir).real) < 1e-8


def test_kagome_su3_energy_consistency():
    """KAGOME_SU3 1-site and 2x2-subsystem energies agree on a converged
    environment (they contract the same physics differently)."""
    from tpeps.ipeps.ipeps_kagome import IPEPS_KAGOME
    from tpeps.models.su3_kagome import KAGOME_SU3

    rng = np.random.RandomState(13)
    a = jnp.asarray(rng.rand(27, 3, 3, 3, 3) - 0.5)
    state = IPEPS_KAGOME(sites={(0, 0): a / jnp.linalg.norm(a)}, lX=1, lY=1)
    env = init_env(state, 12, "CTMRG")
    env, _ = run(state, env, CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-9))

    m = KAGOME_SU3(j=0.3, k=1.0, h=0.1)
    e1 = float(m.energy_1site(state, env))
    e2 = float(m.energy_per_site_2x2subsystem(state, env))
    assert np.isfinite(e1) and np.isfinite(e2)
    assert abs(e1 - e2) < 5e-4, (e1, e2)
    obs, labels = m.eval_obs(state, env)
    assert len(obs) == len(labels)
    for l, v in zip(labels, obs):
        assert np.isfinite(float(np.real(complex(v)))), l


@needs_ref
@pytest.mark.slow
def test_kagome_su3_aklt_golden():
    """SU(3) AKLT point on the kagome D=3 IPESS fixture: energy per site
    -2/3 with vanishing bond/chirality/magnetization observables
    (reference examples/kagome/ctmrg_su3_kagome.py:252-305)."""
    import os
    from refutil import REF_PATH
    from tpeps.ipeps.ipess_kagome import read_ipess_kagome_generic
    from tpeps.models.su3_kagome import KAGOME_SU3

    state = read_ipess_kagome_generic(
        os.path.join(REF_PATH, "test-input", "AKLT_SU3_KAGOME_D3_IPESS_state.json"))
    env = init_env(state, 18, "CTMRG")
    env, _ = run(state, env, CtmArgs(ctm_max_iter=100, ctm_conv_tol=1e-10))
    m = KAGOME_SU3(j=0.0, k=1.0, h=0.0)
    e = float(m.energy_per_site_2x2subsystem(state, env))
    assert abs(e - (-2 / 3)) < 1e-6
    obs, labels = m.eval_obs(state, env)
    for l, v in zip(labels, obs):
        assert abs(float(np.real(complex(v)))) < 1e-6, l


@needs_ref
@pytest.mark.slow
def test_kagome_su3_aklt_golden_pg_ansatze():
    """The IPESS_PG and A_2,B point-group constrained ansatze reproduce
    the same golden (reference ctmrg_su3_kagome.py ANSATZE list); PG
    symmetrization is idempotent on a state already in the irrep."""
    import os
    from refutil import REF_PATH
    from tpeps.ipeps.ipess_kagome import read_ipess_kagome_pg, to_PG_symmetric
    from tpeps.models.su3_kagome import KAGOME_SU3

    for f in ("AKLT_SU3_KAGOME_D3_IPESS_PG_state.json",
              "AKLT_SU3_KAGOME_D3_A2B_state.json"):
        state = read_ipess_kagome_pg(os.path.join(REF_PATH, "test-input", f))
        env = init_env(state, 18, "CTMRG")
        env, _ = run(state, env, CtmArgs(ctm_max_iter=100, ctm_conv_tol=1e-10))
        m = KAGOME_SU3(j=0.0, k=1.0, h=0.0)
        e = float(m.energy_per_site_2x2subsystem(state, env))
        assert abs(e - (-2 / 3)) < 1e-6, f
        if state.pgs:
            st2 = to_PG_symmetric(state)
            drift = max(float(jnp.abs(st2.elem_tensors[k] - state.elem_tensors[k]).max())
                        for k in state.elem_tensors)
            assert drift < 1e-14
