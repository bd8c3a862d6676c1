"""Abelian block-sparse stack tests.

Strategy (SURVEY.md §4): (1) algebraic invariants of the tensor core,
(2) the dense engine as oracle — the abelian CTM must reproduce dense
results on the *same* state to machine/convergence precision, (3) the
reference's committed U(1) states as golden fixtures
(test-input/abelian/c4v, energy golden
examples/j1j2/abelian/ctmrg_j1j2_u1.py:218).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpeps.config import CtmArgs
from tpeps.ctm.generic import ctmrg as ctmrg_d
from tpeps.ctm.generic import env as env_d
from tpeps.ctm.generic import rdm as rdm_d
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_ab
from tpeps.ctm.generic_abelian import env as env_ab
from tpeps.ctm.generic_abelian import rdm as rdm_ab
from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN
from tpeps.models.abelian.j1j2 import J1J2_ABELIAN
from tpeps.models.j1j2 import J1J2
from tpeps.sym.io import read_ipeps_abelian, write_ipeps_abelian
from tpeps.sym.tensor import AbelianTensor, leg

from refutil import REF_PATH, reference_available

U1_D3_STATE = os.path.join(
    REF_PATH,
    "test-input/abelian/c4v/BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_blocks_2site_state.json",
)

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


def bipartite(coord):
    vx = (coord[0] + abs(coord[0]) * 2) % 2
    vy = abs(coord[1])
    return ((vx + vy) % 2, 0)


def random_u1_state(seed=0, backend="np"):
    """Random 1-site U(1) iPEPS, D=3 (sectors {0:1, +-1:1} on aux legs)."""
    key = jax.random.PRNGKey(seed)
    phys = leg({-1: 1, 1: 1})
    aux = leg({-1: 1, 0: 1, 1: 1})
    a = AbelianTensor.random(
        key, "U1", (-1, -1, -1, 1, 1), (phys, aux, aux, aux, aux), n=1,
        backend=backend,
    )
    return IPEPS_ABELIAN("U1", {(0, 0): a})


# ----------------------------------------------------------------- core


def test_fuse_pair_contraction_invariant():
    """Contracting two tensors over a fused pair equals contracting the
    unfused legs (the property the CTM init relies on)."""
    st = random_u1_state(3)
    a = st.site((0, 0))
    # double layer traced over phys+u: legs (l,d,r,l',d',r')
    t = a.tensordot(a.conj(), ((0, 1), (0, 1)))
    t2 = t.transpose((0, 3, 1, 4, 2, 5))  # (l,l',d,d',r,r')
    # contract r-pair of t2 with l-pair of the same network one site over
    s = a.tensordot(a.conj(), ((0, 1), (0, 1))).transpose((0, 3, 1, 4, 2, 5))
    direct = t2.tensordot(s, ((4, 5), (0, 1)))
    tf = t2.fuse_pair(4)
    sf = s.fuse_pair(0)
    fused = tf.tensordot(sf, ((4,), (0,)))
    assert float((direct.fuse_pair(0).fuse_pair(1) + (-1.0) * fused.fuse_pair(0).fuse_pair(1)).norm()) < 1e-13


def test_io_roundtrip(tmp_path):
    st = random_u1_state(5)
    p = str(tmp_path / "state.json")
    write_ipeps_abelian(st, p)
    st2 = read_ipeps_abelian(p)
    a, b = st.site((0, 0)), st2.site((0, 0))
    assert a.signature == b.signature and a.n == b.n
    assert set(a.blocks) == set(b.blocks)
    for q in a.blocks:
        assert np.allclose(np.asarray(a.blocks[q]), np.asarray(b.blocks[q]))


# --------------------------------------------------- dense-oracle checks


def test_init_env_rdms_match_dense():
    """Abelian init env + RDMs == dense init env + RDMs (same network,
    chi >= D^2 so the dense init does not truncate)."""
    st = random_u1_state(7)
    dense = st.to_dense()
    chi = 9
    eA = env_ab.init_env(st, chi)
    eD = env_d.init_env(dense, chi)
    args_d = (dense.sites, dense.vertexToSite, eD.C, eD.T)
    for name, f_ab, f_d in (
        ("rdm1x1", rdm_ab.rdm1x1, rdm_d.rdm1x1),
        ("rdm2x1", rdm_ab.rdm2x1, rdm_d.rdm2x1),
        ("rdm1x2", rdm_ab.rdm1x2, rdm_d.rdm1x2),
        ("rdm2x2", rdm_ab.rdm2x2, rdm_d.rdm2x2),
        ("rdm2x2_NNN_11", rdm_ab.rdm2x2_NNN_11, rdm_d.rdm2x2_NNN_11),
        ("rdm2x2_NNN_1n1", rdm_ab.rdm2x2_NNN_1n1, rdm_d.rdm2x2_NNN_1n1),
    ):
        coord = (0, 0) if "1n1" not in name else (0, 1)
        ra = f_ab(coord, st, eA)
        rd = f_d(coord, *args_d)
        assert float(jnp.abs(ra - rd).max()) < 1e-12, name


@needs_ref
def test_converged_energy_matches_dense():
    """Abelian CTMRG converged energy == dense CTMRG converged energy on
    the same committed U(1) state (engine cross-consistency, the
    reference's *_to_dense.py test pattern)."""
    st = read_ipeps_abelian(U1_D3_STATE, vertexToSite=bipartite)
    dense = st.to_dense()
    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-9)
    chi = 24

    eA, _ = ctmrg_ab.run(st, env_ab.init_env(st, chi), cfg)
    model_ab = J1J2_ABELIAN(j1=1.0, j2=0.0)
    e_ab = float(model_ab.energy_per_site(st, eA))

    eD, _ = ctmrg_d.run(dense, env_d.init_env(dense, chi), cfg)
    model_d = J1J2(j1=1.0, j2=0.0)
    e_d = float(model_d.energy_per_site(dense, eD))
    assert abs(e_ab - e_d) < 1e-8


# -------------------------------------------------------- C4v abelian


def test_c4v_abelian_move_equals_dense_on_trivial_charges():
    """With all charges trivial the native C4v abelian move must equal
    the (oracle-validated) dense C4v move exactly, every iteration —
    isolates contraction geometry from charge bookkeeping."""
    import jax.numpy as jnp

    from tpeps.ctm.c4v.ctmrg import ctm_move_sl as dense_move
    from tpeps.ctm.c4v.env import init_env as init_dense
    from tpeps.ctm.c4v_abelian import env as env_c4v
    from tpeps.ctm.c4v_abelian.ctmrg import ctm_move_sl
    from tpeps.ipeps.ipeps_c4v import symmetrize_c4v

    d, D, chi = 2, 3, 9
    rng = np.random.RandomState(0)
    ad = np.asarray(symmetrize_c4v(jnp.asarray(rng.rand(d, D, D, D, D) - 0.5), normalize=True))
    lp, la = leg({0: d}), leg({0: D})
    A = AbelianTensor("U1", (1, 1, 1, 1, 1), (lp, la, la, la, la), 0,
                      {(0, 0, 0, 0, 0): ad}, jnp.float64)
    st = IPEPS_ABELIAN("U1", {(0, 0): A})
    eA = env_c4v.init_env(st, chi)
    eD = init_dense(jnp.asarray(ad), chi, "CTMRG")
    pk = dict(svd_reltol=0.0, eps_multiplet=1e-12)
    for i in range(6):
        eA = ctm_move_sl(A, eA, pk)
        eD, spec, _P = dense_move(jnp.asarray(ad), eD)
        s1 = np.sort(np.linalg.svd(np.asarray(eA.C.to_dense()), compute_uv=False))[::-1]
        s1 /= s1[0]
        s2 = np.sort(np.abs(np.asarray(spec)))[::-1]
        s2 /= s2[0]
        n = min(len(s1), len(s2))
        assert np.abs(s1[:n] - s2[:n]).max() < 1e-12, f"move {i+1}"


@needs_ref
def test_golden_c4v_u1_d4():
    """Reference golden: C4v U(1) 1-site D=4 chi=36, j2=0.1 — energy/site
    -0.6283009062904991 (examples/j1j2/abelian/ctmrg_j1j2_c4v_u1.py:195),
    via the native single-corner C4v abelian engine."""
    from tpeps.ctm.c4v_abelian import ctmrg as ctmrg_c4v
    from tpeps.ctm.c4v_abelian import env as env_c4v

    f = os.path.join(
        REF_PATH,
        "test-input/abelian/c4v/BFGS100LS_U1B_D4-chi97-j20.0-run0-iU1BD4j20chi97n0_blocks_1site_state.json",
    )
    st = read_ipeps_abelian(f)
    model = J1J2_ABELIAN(j1=1.0, j2=0.1)
    cfg = CtmArgs(ctm_max_iter=80, ctm_conv_tol=1e-10)
    env, _ = ctmrg_c4v.run(st, env_c4v.init_env(st, 36), cfg)
    st_bp, eg = env_c4v.as_generic(st, env)
    e = float(model.energy_per_site(st_bp, eg))
    assert abs(e - (-0.6283009062904991)) < 1e-6


@needs_ref
@pytest.mark.slow
def test_c4v_u1_d8_chi160_converges():
    """Capability proof: converge the largest committed reference state
    (U(1) C4v D=8 chi=160, test-input/abelian/c4v/ABU1C_BFGSLS_D8-...)."""
    import jax.numpy as jnp

    from tpeps.ctm.c4v_abelian import ctmrg as ctmrg_c4v
    from tpeps.ctm.c4v_abelian import env as env_c4v
    from tpeps.ctm.generic_abelian.rdm import rdm2x1

    f = os.path.join(
        REF_PATH,
        "test-input/abelian/c4v/ABU1C_BFGSLS_D8-chi160-j20.0-run0-ctme12-c4NEELch147n1_blocks_1site_state.json",
    )
    st = read_ipeps_abelian(f)
    # measured on this box: ~25-40 s/move; 40 moves bring the NN energy
    # to the known D=8 Heisenberg value (-0.66942, measured at 60 moves:
    # 2<SS> = -0.669423, corner-spectra dist 9.5e-7)
    cfg = CtmArgs(ctm_max_iter=40, ctm_conv_tol=1e-8)
    env, hist = ctmrg_c4v.run(st, env_c4v.init_env(st, 160), cfg)
    assert hist["conv_crit"][-1] < 1e-3
    st_bp, eg = env_c4v.as_generic(st, env)
    model = J1J2_ABELIAN(j1=1.0, j2=0.0)
    rho = rdm2x1((0, 0), st_bp, eg)
    e = 2.0 * float(jnp.einsum("ijab,ijab", rho, model.SS).real)
    # D=8 ground-state-quality energy (literature J1 Heisenberg ~ -0.6694)
    assert -0.6720 < e < -0.6660


# ------------------------------------------------------------- goldens


@needs_ref
def test_golden_u1_d3_bipartite():
    """Reference golden: U(1) 2-site D=3 chi=32, j2=0 — energy/site
    -0.6645979511667757 and observables
    (examples/j1j2/abelian/ctmrg_j1j2_u1.py:218-225)."""
    st = read_ipeps_abelian(U1_D3_STATE, vertexToSite=bipartite)
    model = J1J2_ABELIAN(j1=1.0, j2=0.0)
    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-9)
    env, _ = ctmrg_ab.run(st, env_ab.init_env(st, 32), cfg)
    e = float(model.energy_per_site(st, env))
    assert abs(e - (-0.6645979511667757)) < 1e-6

    obs, labels = model.eval_obs(st, env)
    od = dict(zip(labels, obs))
    for c in ((0, 0), (1, 0)):
        assert abs(od[f"m{c}"] - 0.3713621967866411) < 1e-6
        assert abs(abs(complex(od[f"sz{c}"]).real) - 0.37136219678664095) < 1e-6
        assert abs(od[f"SS2x1{c}"] - (-0.33229727696449596)) < 1e-6
        assert abs(od[f"SS1x2{c}"] - (-0.3322972769393827)) < 1e-6


def test_kagome_abelian_rdms_match_dense():
    """Abelian kagome RDMs == dense kagome RDMs on the same (random U(1))
    iPESS state with PBC-init environments (machine precision: the envs
    differ only by the fused-basis ordering = a chi-leg gauge)."""
    from tpeps.ctm.generic import env as env_d
    from tpeps.ctm.kagome import rdm_kagome as rdm_dense
    from tpeps.ctm.kagome_abelian import rdm_kagome as rdm_ab
    from tpeps.ipeps.ipeps import IPEPS
    from tpeps.ipeps.ipess_kagome_abelian import IPESS_KAGOME_ABELIAN

    key = jax.random.PRNGKey(3)
    phys = leg({-1: 1, 1: 1})
    bond = leg({-1: 1, 0: 1, 1: 1})

    def rnd(sub, sig, legs_, n=0):
        return AbelianTensor.random(sub, "U1", sig, legs_, n=n, backend="np")

    keys = jax.random.split(key, 5)
    td = {
        "T_u": rnd(keys[0], (-1, 1, 1), (bond, bond, bond)),
        "T_d": rnd(keys[1], (1, -1, -1), (bond, bond, bond)),
        "B_c": rnd(keys[2], (1, -1, 1), (phys, bond, bond), n=1),
        "B_b": rnd(keys[3], (1, 1, -1), (phys, bond, bond), n=1),
        "B_a": rnd(keys[4], (1, 1, -1), (phys, bond, bond), n=-1),
    }
    st = IPESS_KAGOME_ABELIAN("U1", td)
    fused = st.fused()

    # dense oracle: SAME tensors densified; phys fused by plain reshape
    a7d = st.to_dense7()[(0, 0)]
    d = a7d.shape[0]
    D = a7d.shape[3]
    a5d = a7d.reshape(d ** 3, D, D, D, D)
    stD = IPEPS({(0, 0): jnp.asarray(a5d / jnp.abs(a5d).max())})

    from tpeps.ctm.generic_abelian import env as env_ab

    envA = env_ab.init_env(fused, 16)
    envD = env_d.init_env(stD, 16, "CTMRG")

    # 1x1 down-triangle RDM
    rA = rdm_ab.rdm1x1_kagome((0, 0), st, envA)
    rD = rdm_dense.rdm1x1_kagome((0, 0), stD.sites, stD.vertexToSite,
                                 envD.C, envD.T, d)
    assert np.abs(np.asarray(rA) - np.asarray(rD)).max() < 1e-10

    # up-triangle RDM over the 2x2 patch
    uA = rdm_ab.rdm2x2_up_triangle_open((0, 0), st, envA)
    uD = rdm_dense.rdm2x2_up_triangle_open((0, 0), stD.sites, stD.vertexToSite,
                                           envD.C, envD.T, d)
    assert np.abs(np.asarray(uA) - np.asarray(uD)).max() < 1e-10

    # down-triangle operator expectation (normalized)
    rng = np.random.default_rng(0)
    op = rng.standard_normal((d ** 3, d ** 3))
    op = op + op.T
    vA, nA_ = rdm_ab.rdm2x2_dn_triangle_with_operator((0, 0), st, envA, jnp.asarray(op))
    vD, nD_ = rdm_dense.rdm2x2_dn_triangle_with_operator(
        (0, 0), stD.sites, stD.vertexToSite, envD.C, envD.T, jnp.asarray(op), d)
    assert abs(complex(vA) - complex(vD)) < 1e-10

    # 1x1 trace with operator (normalized ratio)
    tA_op = rdm_ab.trace1x1_dn_kagome((0, 0), st, envA, jnp.asarray(op))
    tA_id = rdm_ab.trace1x1_dn_kagome((0, 0), st, envA, jnp.asarray(np.eye(d ** 3)))
    tD_op = rdm_dense.trace1x1_dn_kagome((0, 0), stD.sites, stD.vertexToSite,
                                         envD.C, envD.T, jnp.asarray(op), d)
    tD_id = rdm_dense.trace1x1_dn_kagome((0, 0), stD.sites, stD.vertexToSite,
                                         envD.C, envD.T, jnp.asarray(np.eye(d ** 3)), d)
    assert abs(complex(tA_op / tA_id) - complex(tD_op / tD_id)) < 1e-10


def test_kagome_u1_model_converged_energy_matches_dense():
    """KAGOME_U1 (abelian adapter) energy through a CONVERGED abelian CTM
    == dense S_HALF_KAGOME energy through the converged dense CTM on the
    densified state."""
    from tpeps.ctm.generic import ctmrg as ctmrg_d
    from tpeps.ctm.generic import env as env_d
    from tpeps.ctm.generic_abelian import ctmrg as ctmrg_a
    from tpeps.ctm.generic_abelian import env as env_a
    from tpeps.ipeps.ipeps import IPEPS
    from tpeps.ipeps.ipess_kagome_abelian import IPESS_KAGOME_ABELIAN
    from tpeps.models.abelian.kagome_u1 import KAGOME_U1
    from tpeps.models.spin_half_kagome import S_HALF_KAGOME
    from tpeps.ipeps.ipeps_kagome import IPEPS_KAGOME

    key = jax.random.PRNGKey(9)
    phys = leg({-1: 1, 1: 1})
    bond = leg({0: 1, 1: 1})

    def rnd(sub, sig, legs_, n=0):
        return AbelianTensor.random(sub, "U1", sig, legs_, n=n, backend="np")

    keys = jax.random.split(key, 5)
    td = {
        "T_u": rnd(keys[0], (-1, 1, 1), (bond, bond, bond)),
        "T_d": rnd(keys[1], (1, -1, -1), (bond, bond, bond)),
        "B_c": rnd(keys[2], (1, -1, 1), (phys, bond, bond), n=1),
        "B_b": rnd(keys[3], (1, 1, -1), (phys, bond, bond), n=1),
        "B_a": rnd(keys[4], (1, 1, -1), (phys, bond, bond), n=-1),
    }
    st = IPESS_KAGOME_ABELIAN("U1", td)
    fused = st.fused()

    a7d = st.to_dense7()[(0, 0)]
    d = a7d.shape[0]
    D = a7d.shape[3]
    a5d = np.asarray(a7d).reshape(d ** 3, D, D, D, D)
    stD = IPEPS_KAGOME({(0, 0): jnp.asarray(a5d / np.abs(a5d).max())}, lX=1, lY=1)

    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-10)
    envA, _ = ctmrg_a.run(fused, env_a.init_env(fused, 12), cfg)
    envD, _ = ctmrg_d.run(stD, env_d.init_env(stD, 12, "CTMRG"), cfg)

    model_a = KAGOME_U1(j1=1.0)
    model_d = S_HALF_KAGOME(j1=1.0)
    eA = float(model_a.energy_per_site(st, envA))
    eD = float(model_d.energy_per_site(stD, envD))
    assert abs(eA - eD) < 1e-7, (eA, eD)

    # SU(3)-style adapter path smoke (same RDM plumbing, different model)
    from tpeps.models.abelian.su3_kagome import KAGOME_SU3_U1xU1  # noqa: F401


def test_densify_bridge_triangular():
    """densify(state, env): the dense J1-J2-J4 evaluation over the
    converged ABELIAN environment must match the all-dense pipeline."""
    from tpeps.ctm.generic import ctmrg as ctmrg_d
    from tpeps.ctm.generic import env as env_d
    from tpeps.ctm.generic_abelian import ctmrg as ctmrg_a
    from tpeps.ctm.generic_abelian import env as env_a
    from tpeps.ipeps.ipeps import IPEPS
    from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN
    from tpeps.models.abelian.spin_triangular import J1J2J4_1SITE_ABELIAN
    from tpeps.models.spin_triangular import J1J2J4_1SITE

    key = jax.random.PRNGKey(12)
    phys = leg({-1: 1, 1: 1})
    aux = leg({-1: 1, 0: 1, 1: 1})
    a = AbelianTensor.random(key, "U1", (1, 1, 1, -1, -1),
                             (phys, aux, aux, aux, aux), n=1, backend="np")
    st = IPEPS_ABELIAN("U1", {(0, 0): a})
    stD = IPEPS({(0, 0): a.to_dense()})

    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-10)
    envA, _ = ctmrg_a.run(st, env_a.init_env(st, 12), cfg)
    envD, _ = ctmrg_d.run(stD, env_d.init_env(stD, 12, "CTMRG"), cfg)

    model_a = J1J2J4_1SITE_ABELIAN(j1=1.0, j2=0.2, j4=0.1)
    model_d = J1J2J4_1SITE(j1=1.0, j2=0.2, j4=0.1)
    eA = float(model_a.energy_per_site(st, envA))
    eD = float(model_d.energy_per_site(stD, envD))
    assert abs(eA - eD) < 1e-7, (eA, eD)
