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


@needs_ref
def test_j1j2lambda_hamiltonian_matches_reference():
    """Chiral-term + plaquette Hamiltonian tensors agree elementwise with
    the reference construction (models/j1j2lambda.py:66-122)."""
    from refutil import import_reference
    import_reference()
    import torch
    import config as rcfg
    rcfg.global_args.dtype = "complex128"
    rcfg.global_args.torch_dtype = torch.complex128
    from models.j1j2lambda import J1J2LAMBDA_C4V_BIPARTITE as REF_M

    from tpeps.models.j1j2lambda import J1J2LAMBDA_C4V_BIPARTITE

    kw = dict(j1=1.0, j2=0.37, j3=0.11, hz_stag=0.23, delta_zz=0.9, lmbd=0.45)
    ref = REF_M(**kw)
    m = J1J2LAMBDA_C4V_BIPARTITE(**kw)
    assert np.abs(np.asarray(m.hp_rot) - ref.hp.numpy()).max() < 1e-14
    assert np.abs(np.asarray(m.hp_chiral_rot) - ref.hp_chiral.numpy()).max() < 1e-14
    assert np.abs(np.asarray(m.SS_rot) - ref.SS_rot.numpy()).max() < 1e-14


def test_j1j2lambda_reduces_to_j1j2():
    """At lmbd=0 the chiral model's energy equals the plain C4v J1-J2."""
    import jax
    from tpeps.ctm.c4v.env import init_env as init_env_c4v
    from tpeps.ctm.c4v.ctmrg import converge_env
    from tpeps.ipeps.ipeps_c4v import symmetrize_c4v
    from tpeps.models.j1j2 import J1J2_C4V_BIPARTITE
    from tpeps.models.j1j2lambda import J1J2LAMBDA_C4V_BIPARTITE

    a = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 2, 2, 2),
                          dtype=jnp.float64)
    a = symmetrize_c4v(a)
    a = (a / jnp.abs(a).max()).astype(jnp.complex128)
    env = init_env_c4v(a, 8)
    env = converge_env(a, env, CtmArgs(ctm_max_iter=80, ctm_conv_tol=1e-10))
    m0 = J1J2_C4V_BIPARTITE(j1=1.0, j2=0.4, dtype=jnp.complex128)
    m1 = J1J2LAMBDA_C4V_BIPARTITE(j1=1.0, j2=0.4, lmbd=0.0)
    e0 = float(m0.energy_1x1(a, env))
    e1 = float(m1.energy_1x1(a, env))
    assert abs(e0 - e1) < 1e-10
    obs, labels = m1.eval_obs(a, env)
    assert all(np.isfinite(np.real(np.complex128(o))) for o in obs)


def test_coupledchains_isotropic_matches_hb():
    """At j1_x=j1_y, k1_x=k1_y COUPLEDCHAINS reduces to the isotropic HB
    model; both energy forms must agree on a converged random 2x2 state."""
    import jax
    from tpeps.models.hb import HB
    from tpeps.models.hb_anisotropy import COUPLEDCHAINS
    from tpeps.ipeps.ipeps import IPEPS

    rng = np.random.RandomState(7)
    sites = {(x, y): jnp.asarray(rng.rand(3, 2, 2, 2, 2) - 0.5)
             for x in range(2) for y in range(2)}
    sites = {c: t / jnp.linalg.norm(t) for c, t in sites.items()}
    state = IPEPS(sites=sites, lX=2, lY=2)
    env = _converge(state, 12, tol=1e-8)

    iso = HB(spin_s=3, j1=1.0, k1=0.3)
    ani = COUPLEDCHAINS(phys_dim=3, j1_x=1.0, j1_y=1.0, k1_x=0.3, k1_y=0.3)
    e_iso = float(iso.energy_2x1_1x2(state, env))
    e_ani = float(ani.energy_2x1_1x2(state, env))
    assert abs(e_iso - e_ani) < 1e-12
    # plaquette form agrees with the bond form (reference convention:
    # energy_2x2_4site returns the per-bond average = half the per-site)
    e_p = float(ani.energy_2x2_4site(state, env).real)
    assert abs(2 * e_p - e_ani) < 1e-6
    obs, labels = ani.eval_obs(state, env)
    assert len(obs) == len(labels) and np.isfinite(float(np.real(obs[0])))


def test_coupledchains_hamiltonian_matches_reference():
    from refutil import import_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    import torch
    from models.hb_anisotropy import COUPLEDCHAINS as REF_M
    from tpeps.models.hb_anisotropy import COUPLEDCHAINS

    ref = REF_M(phys_dim=3, j1_x=1.0, j1_y=0.4, k1_x=0.2, k1_y=0.05)
    m = COUPLEDCHAINS(phys_dim=3, j1_x=1.0, j1_y=0.4, k1_x=0.2, k1_y=0.05)
    for name in ("h2_x", "h2_y", "hp_h", "hp_v"):
        assert np.abs(np.asarray(getattr(m, name))
                      - getattr(ref, name).numpy()).max() < 1e-14
    assert np.abs(np.asarray(m.Q) - ref.get_Q().numpy()).max() < 1e-14


def test_spin1_kagome_p_bonds():
    """P_bonds_nn on a fused-site kagome state returns real SWAP
    expectations bounded by 1."""
    import jax
    from tpeps.models.spin1_kagome import S1_KAGOME
    from tpeps.ipeps.ipeps_kagome import IPEPS_KAGOME

    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(27, 2, 2, 2, 2) - 0.5)
    state = IPEPS_KAGOME(sites={(0, 0): a / jnp.linalg.norm(a)}, lX=1, lY=1)
    env = _converge(state, 8, max_iter=40, tol=1e-7)
    model = S1_KAGOME(j1=1.0)
    e = float(model.energy_per_site(state, env))
    assert np.isfinite(e)
    p23, p13, p12 = model.P_bonds_nn(state, env)
    for p in (p23, p13, p12):
        assert np.isfinite(float(p)) and abs(float(p)) < 1.0 + 1e-8


def test_d2_ladders_rung_singlet():
    """D2 ansatz: a rung product state (identity parent on the strong
    'down' bond) gives exactly -3/8 per site at alpha=0, and the weak
    bonds add alpha * (-3/4)/2 when alpha > 0 is evaluated on the same
    state's odd rows (zero here since odd rungs are uncorrelated)."""
    from tpeps.ipeps.ipeps_c4v import IPEPS_D2SYM
    from tpeps.models.coupledLadders import COUPLEDLADDERS_D2_BIPARTITE

    P = np.zeros((2, 2, 2, 2, 2))
    for s in range(2):
        P[s, 0, 0, s, 0] = 1.0
    state = IPEPS_D2SYM(jnp.asarray(P))
    # D2 structure: sites[(0,1)] is the u<->d transpose
    assert float(jnp.abs(state.sites[(0, 1)]
                         - state.sites[(0, 0)].transpose(0, 3, 2, 1, 4)).max()) == 0.0
    env = _converge(state, 8, max_iter=60, tol=1e-9)
    for alpha in (0.0, 0.5):
        model = COUPLEDLADDERS_D2_BIPARTITE(alpha=alpha)
        e = float(model.energy_2x1_1x2(state, env))
        assert abs(e - (-0.375)) < 1e-8, (alpha, e)


def test_batiocu2po4_neel_product():
    """BaTiOCu2Po4 on a Neel product state: every NN <S.S> = -1/4 and
    every diagonal <S.S> = +1/4, so the 4x2-cell energy is exactly
    2*(j1*4*(-1/4) + j2*2*(1/4)) + [jp-plaquettes]: each weak plaquette
    contributes jp11*(-1/4) + jp12*(-1/4) + jp2*2*(1/4)."""
    from tpeps.ipeps.ipeps import IPEPS
    from tpeps.models.baTiOCu2Po4 import BaTiOCu2Po4

    up = np.zeros((2, 1, 1, 1, 1)); up[0] = 1.0
    dn = np.zeros((2, 1, 1, 1, 1)); dn[1] = 1.0
    sites = {}
    for x in range(4):
        for y in range(2):
            sites[(x, y)] = jnp.asarray(up if (x + y) % 2 == 0 else dn)
    state = IPEPS(sites, vertexToSite=lambda c: (c[0] % 4, c[1] % 2), lX=4, lY=2)
    env = _converge(state, 4, max_iter=6, tol=1e-12)

    j1, j2, jp2, jp11, jp12 = 1.0, 0.3, 0.2, 0.15, 0.1
    model = BaTiOCu2Po4(j1=j1, j2=j2, jp2=jp2, jp11=jp11, jp12=jp12)
    e = float(model.energy_2x2_8site(state, env))
    e_exact = 2 * (j1 * 4 * (-0.25) + j2 * 2 * 0.25) \
        + 4 * (jp11 * (-0.25) + jp12 * (-0.25) + jp2 * 2 * 0.25)
    assert abs(e - e_exact) < 1e-9, (e, e_exact)

    obs, labels = model.eval_obs(state, env)
    assert abs(obs[labels.index("avg_m")] - 0.5) < 1e-9


def test_dimer_dimer_corrf_product_state():
    """On a Neel product state every horizontal/vertical dimer operator
    <S.S> factorizes to (-1/4) per dimer, so the dimer-dimer correlators
    are exactly 1/16 at every distance."""
    from tpeps.ctm.generic import corrf
    from tpeps.groups import su2
    from tpeps.ipeps.ipeps import IPEPS

    up = np.zeros((2, 1, 1, 1, 1)); up[0] = 1.0
    dn = np.zeros((2, 1, 1, 1, 1)); dn[1] = 1.0
    sites = {(0, 0): jnp.asarray(up), (1, 0): jnp.asarray(dn),
             (0, 1): jnp.asarray(dn), (1, 1): jnp.asarray(up)}
    state = IPEPS(sites, vertexToSite=lambda c: (c[0] % 2, c[1] % 2), lX=2, lY=2)
    env = _converge(state, 4, max_iter=6, tol=1e-12)

    s2 = su2.SU2(2)
    SS = s2.SS()  # [s0, s1, s0', s1']
    vals_h = corrf.corrf_2sOH2sOH_E1(
        (0, 0), (1, 0), state.sites, state.vertexToSite, env.C, env.T,
        SS, lambda r: SS, 3,
    )
    assert np.allclose(np.asarray(vals_h), 1.0 / 16.0, atol=1e-10), vals_h
    vals_v = corrf.corrf_2sOV2sOV_E2(
        (0, 0), (1, 0), state.sites, state.vertexToSite, env.C, env.T,
        SS, lambda r: SS, 3,
    )
    assert np.allclose(np.asarray(vals_v), 1.0 / 16.0, atol=1e-10), vals_v


def test_c4v_width2_transfer_spec():
    """Width-2 C4v transfer spectrum: finite, ordered, and gapless-free
    sanity on a random symmetric state; on a product state the leading
    width-2 eigenvalue is non-degenerate and normalized to 1."""
    import jax

    from tpeps.ctm.c4v.ctmrg import run_fixed_point
    from tpeps.ctm.c4v.env import init_env as init_env_c4v
    from tpeps.ctm.c4v.transferops import get_Top2_spec_c4v, get_Top_spec_c4v
    from tpeps.ipeps.ipeps_c4v import symmetrize_c4v

    rng = np.random.RandomState(3)
    a = symmetrize_c4v(jnp.asarray(rng.rand(2, 2, 2, 2, 2) - 0.5), normalize=True)
    env0 = init_env_c4v(a, 8, "CTMRG")
    env, *_ = run_fixed_point(a, env0, max_iter=60, conv_tol=1e-10)
    w1 = np.asarray(get_Top_spec_c4v(3, a, env))
    w2 = np.asarray(get_Top2_spec_c4v(3, a, env))
    lam1 = np.abs(w1[:, 0] + 1j * w1[:, 1])
    lam2 = np.abs(w2[:, 0] + 1j * w2[:, 1])
    assert np.all(np.isfinite(lam1)) and np.all(np.isfinite(lam2))
    assert abs(lam2[0] - 1.0) < 1e-10
    assert np.all(np.diff(lam2) < 1e-8)  # descending magnitudes


def test_c4v_dimer_dimer_matches_generic():
    """C4v corrf_2sOH2sOH_E1 / corrf_2sOV2sOV_E2 against the generic
    implementations on the identical (1x1-cell) environment via
    env_c4v_to_generic — the contraction chains are mathematically the
    same, so agreement is exact."""
    from tpeps.ctm.c4v import corrf as corrf_c4v
    from tpeps.ctm.c4v.ctmrg import run_fixed_point
    from tpeps.ctm.c4v.env import env_c4v_to_generic
    from tpeps.ctm.c4v.env import init_env as init_env_c4v
    from tpeps.ctm.generic import corrf as corrf_g
    from tpeps.groups import su2
    from tpeps.ipeps.ipeps_c4v import symmetrize_c4v

    rng = np.random.RandomState(7)
    a = symmetrize_c4v(jnp.asarray(rng.rand(2, 2, 2, 2, 2) - 0.5), normalize=True)
    env0 = init_env_c4v(a, 8, "CTMRG")
    env, *_ = run_fixed_point(a, env0, max_iter=80, conv_tol=1e-11)
    sites, site_of, C, T = env_c4v_to_generic(a, env)

    SS = su2.SU2(2).SS()
    dist = 3
    vh_c = np.asarray(corrf_c4v.corrf_2sOH2sOH_E1(a, env, SS, lambda r: SS, dist))
    vh_g = np.asarray(corrf_g.corrf_2sOH2sOH_E1(
        (0, 0), (1, 0), sites, site_of, C, T, SS, lambda r: SS, dist))
    assert np.allclose(vh_c, vh_g, atol=1e-10), (vh_c, vh_g)

    vv_c = np.asarray(corrf_c4v.corrf_2sOV2sOV_E2(a, env, SS, lambda r: SS, dist))
    vv_g = np.asarray(corrf_g.corrf_2sOV2sOV_E2(
        (0, 0), (1, 0), sites, site_of, C, T, SS, lambda r: SS, dist))
    assert np.allclose(vv_c, vv_g, atol=1e-10), (vv_c, vv_g)
