"""Simple-update imaginary-time evolution tests.

Physical anchors: SU on the Heisenberg antiferromagnet from a random
state must approach the known D=2 variational energy regime; SU on the
strong-field TFIM must polarize the state.
"""

import numpy as np
import pytest

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp

from tpeps.config import CtmArgs
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.groups.su2 import SU2, get_rot_op
from tpeps.ipeps.ipeps import IPEPS, IPEPS_WEIGHTED
from tpeps.itevol.simple_update import all_nn_bonds, apply_gate_2s, gate_from_hamiltonian, run_seq_2s
from tpeps.models.j1j2 import J1J2


@pytest.mark.slow
def test_su_heisenberg_energy():
    D = 2
    rng = np.random.RandomState(0)
    sites = {
        (x, y): jnp.asarray(rng.rand(2, D, D, D, D) - 0.5)
        for x in range(2) for y in range(2)
    }
    state = IPEPS_WEIGHTED(sites=sites, lX=2, lY=2)

    s2 = SU2(2)
    # SS() is already in the [s0, s1, s0', s1'] operator layout
    h2 = s2.SS()
    bonds = all_nn_bonds(state)
    for tau, n in ((0.1, 150), (0.02, 100), (0.005, 60)):
        gate = gate_from_hamiltonian(h2, tau)
        for _ in range(n):
            run_seq_2s(state, [(b, gate) for b in bonds], max_D=D)

    plain = state.absorb_weights()
    plain.sites = {c: t / jnp.linalg.norm(t) for c, t in plain.sites.items()}
    env = init_env(plain, 16, "CTMRG")
    env, _ = run(plain, env, CtmArgs(ctm_max_iter=120, ctm_conv_tol=1e-9))
    model = J1J2(j1=1.0)
    e = float(model.energy_per_site(plain, env))
    # the D=2 simple-update fixed point of this protocol lands at
    # E/site ~ -0.561 (clearly quantum; classical Neel is -0.5).
    # Rigorous per-step correctness is anchored by the exact Vidal-iTEBD
    # equivalence test below.
    assert e < -0.55, f"SU failed to lower the energy, E={e}"


def test_su_matches_vidal_itebd_on_chain():
    """Exact per-step equivalence with canonical Vidal iTEBD: embed an
    MPS chain as a PEPS with trivial vertical bonds and co-evolve; the
    bond weight spectra must agree to machine precision at every scale."""
    import numpy as np
    from scipy.linalg import expm

    d, D = 2, 2
    sz = np.diag([0.5, -0.5])
    sp = np.array([[0, 1], [0, 0.0]])
    SSm = np.kron(sz, sz) + 0.5 * (np.kron(sp, sp.T) + np.kron(sp.T, sp))

    rng = np.random.RandomState(5)
    G = [rng.rand(D, d, D) - 0.5 for _ in range(2)]
    lam = [np.ones(D), np.ones(D)]

    A = [jnp.asarray(G[i].transpose(1, 0, 2).reshape(d, 1, D, 1, D)) for i in range(2)]
    state = IPEPS_WEIGHTED(sites={(0, 0): A[0], (1, 0): A[1]}, lX=2, lY=1)
    for k in (((0, 0), (1, 0)), ((1, 0), (-1, 0))):
        state.weights[k] = jnp.asarray(lam[0])
    for k in (((1, 0), (1, 0)), ((0, 0), (-1, 0))):
        state.weights[k] = jnp.asarray(lam[1])

    def vidal_step(i, g):
        j = 1 - i
        th = np.einsum("a,aub,b,bvc,c->auvc", lam[j], G[i], lam[i], G[j], lam[j])
        th = np.einsum("UVuv,auvc->aUVc", g, th)
        M = th.reshape(D * d, d * D)
        U, S, Vh = np.linalg.svd(M, full_matrices=False)
        U, S, Vh = U[:, :D].copy(), S[:D].copy(), Vh[:D].copy()
        lam[i] = S / np.max(S)
        inv = lambda x: np.where(x > 1e-12, 1 / np.where(x > 1e-12, x, 1), 0)
        G[i] = np.einsum("a,aub->aub", inv(lam[j]), U.reshape(D, d, D))
        G[j] = np.einsum("aub,b->aub", Vh.reshape(D, d, D), inv(lam[j]))

    bonds = [((0, 0), (1, 0), (1, 0)), ((1, 0), (1, 0), (2, 0))]
    for tau, n in ((0.1, 50), (0.02, 30)):
        g = expm(-tau * SSm).reshape(d, d, d, d)
        gj = jnp.asarray(g)
        for _ in range(n):
            vidal_step(0, g)
            vidal_step(1, g)
            apply_gate_2s(state, bonds[0], gj, max_D=D)
            apply_gate_2s(state, bonds[1], gj, max_D=D)
        w0 = np.asarray(state.weights[((0, 0), (1, 0))])
        assert np.abs(w0 / w0.max() - lam[0] / lam[0].max()).max() < 1e-8


def test_su_tfim_polarizes():
    """Strong transverse field: gate drives every spin to the x-product
    state regardless of the initial state."""
    D = 2
    rng = np.random.RandomState(1)
    sites = {(0, 0): jnp.asarray(rng.rand(2, D, D, D, D) - 0.5),
             (1, 0): jnp.asarray(rng.rand(2, D, D, D, D) - 0.5)}
    state = IPEPS_WEIGHTED(sites=sites, lX=2, lY=1)
    s2 = SU2(2)
    sx = 0.5 * (s2.SP() + s2.SM())
    I = s2.I()
    # h = -2 (sx_0 + sx_1) dominant field term
    h2 = -(jnp.einsum("ia,jb->ijab", sx, I) + jnp.einsum("ia,jb->ijab", I, sx))
    gate = gate_from_hamiltonian(h2, 0.3)
    bonds = all_nn_bonds(state)
    for _ in range(50):
        run_seq_2s(state, [(b, gate) for b in bonds], max_D=D)
    plain = state.absorb_weights()
    plain.sites = {c: t / jnp.linalg.norm(t) for c, t in plain.sites.items()}
    env = init_env(plain, 8, "CTMRG")
    env, _ = run(plain, env, CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-8))
    from tpeps.ctm.generic.rdm import rdm1x1

    rho = rdm1x1((0, 0), plain.sites, plain.vertexToSite, env.C, env.T)
    mx = float(jnp.trace(rho @ sx).real)
    assert mx > 0.49, f"<sx> = {mx}, expected ~0.5"


def test_abelian_su_matches_dense():
    """Abelian U(1) simple update == dense simple update on the same
    state/gates (same global truncation decisions for a non-degenerate
    XXZ spectrum), compared through converged CTM energies."""
    import numpy as np

    from tpeps.groups import su2
    from tpeps.itevol import su_abelian
    from tpeps.itevol.simple_update import all_nn_bonds, gate_from_hamiltonian, run_seq_2s
    from tpeps.models.j1j2 import J1J2
    from tpeps.sym.tensor import AbelianTensor, leg
    from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN
    from tpeps.config import CtmArgs
    from tpeps.ctm.generic import ctmrg as ctmrg_d
    from tpeps.ctm.generic.env import init_env as init_env_d

    # random U(1) 2x2 bipartite start (staggered total charge)
    import jax

    key = jax.random.PRNGKey(7)
    phys = leg({-1: 1, 1: 1})
    aux = leg({-1: 1, 0: 1, 1: 1})
    sites = {}
    for i, coord in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
        key, sub = jax.random.split(key)
        n = 1 if (coord[0] + coord[1]) % 2 == 0 else -1
        sites[coord] = AbelianTensor.random(
            sub, "U1", (1, 1, 1, -1, -1), (phys, aux, aux, aux, aux), n=n,
            backend="np",
        )
    stA = su_abelian.IPEPS_ABELIAN_WEIGHTED(
        sym="U1", sites=sites, lX=2, lY=2,
    )

    # XXZ gate (breaks SU(2) multiplets -> unambiguous truncation)
    s2 = su2.SU2(2)
    delta = 1.3
    SS = delta * jnp.einsum("ij,ab->iajb", s2.SZ(), s2.SZ()) + 0.5 * (
        jnp.einsum("ij,ab->iajb", s2.SP(), s2.SM())
        + jnp.einsum("ij,ab->iajb", s2.SM(), s2.SP())
    )
    tau, D = 0.1, 3
    gate_d = gate_from_hamiltonian(SS, tau)
    gate_a = su_abelian.gate_from_hamiltonian(SS, tau, phys, "U1")

    from tpeps.ipeps.ipeps import IPEPS_WEIGHTED

    stD = IPEPS_WEIGHTED(
        sites={c: t.to_dense() for c, t in sites.items()}, lX=2, lY=2,
    )

    bonds = all_nn_bonds(stA)
    for _ in range(4):
        stA = su_abelian.run_seq_2s(stA, [(b, gate_a) for b in bonds], D)
        stD = run_seq_2s(stD, [(b, gate_d) for b in bonds], D)

    # compare via converged dense CTM energies of the absorbed states
    model = J1J2(j1=1.0, delta_zz=delta)
    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-9)

    def energy(dense_state):
        env = init_env_d(dense_state, 8)
        env, _ = ctmrg_d.run(dense_state, env, cfg)
        return float(model.energy_2x2_4site(dense_state, env))

    eA = energy(stA.absorb_weights().to_dense())
    eD = energy(stD.absorb_weights())
    assert np.isfinite(eA) and np.isfinite(eD)
    assert abs(eA - eD) < 5e-7, (eA, eD)


def test_quasi_canonical_gauge():
    """IPEPS_WEIGHTED.gauge() (reference ipeps/ipeps.py:672-762):
    the quasi-canonical regauge is (i) physically exact — per-bond
    G_l^T diag(S) G_r == diag(W) — and (ii) idempotent at its fixed
    point.  Verified through converged CTM energies of the absorbed
    states on an SU-evolved Heisenberg state."""
    from tpeps.models.j1j2 import J1J2
    from tpeps.ctm.generic.env import init_env
    from tpeps.ctm.generic.ctmrg import run as run_ctm

    sites = {
        (0, 0): jnp.asarray(np.array([1.0, 0.1]).reshape(2, 1, 1, 1, 1)),
        (1, 0): jnp.asarray(np.array([0.1, 1.0]).reshape(2, 1, 1, 1, 1)),
        (0, 1): jnp.asarray(np.array([0.1, 1.0]).reshape(2, 1, 1, 1, 1)),
        (1, 1): jnp.asarray(np.array([1.0, 0.1]).reshape(2, 1, 1, 1, 1)),
    }
    state = IPEPS_WEIGHTED(sites=sites, lX=2, lY=2)
    model = J1J2(j1=1.0, j2=0.0)
    Sz = np.diag([0.5, -0.5])
    Sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    SS = np.kron(Sz, Sz) + 0.5 * (np.kron(Sp, Sp.T) + np.kron(Sp.T, Sp))
    h2 = jnp.asarray(SS.reshape(2, 2, 2, 2))
    for tau, n in [(0.5, 20), (0.1, 20)]:
        g = gate_from_hamiltonian(h2, tau)
        for _ in range(n):
            state = run_seq_2s(state, [(b, g) for b in all_nn_bonds(state)], max_D=2)

    gauged = state.gauge()
    # idempotence: weights are already at the quasi-canonical fixed point
    g2 = gauged.gauge()
    for k in gauged.weights:
        w1 = np.asarray(gauged.weights[k]) / np.asarray(gauged.weights[k])[0]
        w2 = np.asarray(g2.weights[k]) / np.asarray(g2.weights[k])[0]
        assert np.abs(w1 - w2).max() < 1e-6

    cfg = CtmArgs(ctm_max_iter=80, ctm_conv_tol=1e-9)
    E = []
    for s in [state.absorb_weights(), gauged.absorb_weights()]:
        env = init_env(s, 16)
        env, _ = run_ctm(s, env, cfg)
        E.append(float(np.real(model.energy_per_site(s, env))))
    assert abs(E[0] - E[1]) < 1e-8, f"gauge changed the state: {E}"


@pytest.mark.slow
def test_kagome_itebd_hosvd():
    """3-site iTEBD/HOSVD for kagome iPESS (reference
    itevol/itebd_ipess_kagome_abelian.py + hosvd_abelian.py): imaginary
    time evolution of the kagome Heisenberg AFM from a random D=3
    state reaches the simple-update energy (~ -0.417/site at D=3)."""
    from tpeps.ctm.generic.ctmrg import run as run_ctm
    from tpeps.ipeps.ipess_kagome import IPESS_KAGOME_GENERIC
    from tpeps.itevol.itebd_kagome import init_lambdas, itebd
    from tpeps.models.spin_half_kagome import S_HALF_KAGOME

    rng = np.random.default_rng(5)
    D = 3
    td = {
        "T_u": jnp.asarray(rng.standard_normal((D, D, D))),
        "T_d": jnp.asarray(rng.standard_normal((D, D, D))),
        "B_a": jnp.asarray(rng.standard_normal((2, D, D))),
        "B_b": jnp.asarray(rng.standard_normal((2, D, D))),
        "B_c": jnp.asarray(rng.standard_normal((2, D, D))),
    }
    lam = init_lambdas(td)
    s2 = SU2(2)
    SS = (jnp.kron(s2.SZ(), s2.SZ())
          + 0.5 * (jnp.kron(s2.SP(), s2.SM()) + jnp.kron(s2.SM(), s2.SP())))
    I2 = jnp.eye(2)
    h3 = (jnp.kron(SS, I2) + jnp.kron(I2, SS)
          + jnp.kron(jnp.kron(s2.SZ(), I2), s2.SZ())
          + 0.5 * (jnp.kron(jnp.kron(s2.SP(), I2), s2.SM())
                   + jnp.kron(jnp.kron(s2.SM(), I2), s2.SP())))
    for tau, dt in [(2.0, 0.5), (2.0, 0.2), (2.0, 0.1)]:
        td, lam = itebd(td, lam, h3, tau, dt, D)
    st = IPESS_KAGOME_GENERIC({(0, 0): td})
    env = init_env(st, 18)
    env, _ = run_ctm(st, env, CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-8))
    e = float(np.real(S_HALF_KAGOME(j1=1.0).energy_per_site(st, env)))
    assert e < -0.41, e


def test_kagome_itebd_abelian_matches_dense():
    """Block-sparse 3-site iTEBD (tpeps/itevol/itebd_kagome_abelian.py,
    reference itevol/itebd_ipess_kagome_abelian.py) against the dense
    HOSVD evolution from the same committed U(1) RVB D=3 state, with an
    XXZ-anisotropic triangle gate (multiplet-free truncation): the
    CTM energies after the same schedule must agree, and the evolved
    state must keep its U(1) block structure."""
    import os

    from tpeps.ctm.generic.ctmrg import run as run_ctm
    from tpeps.ipeps.ipess_kagome import IPESS_KAGOME_GENERIC
    from tpeps.ipeps.ipess_kagome_abelian import (
        IPESS_KAGOME_ABELIAN,
        read_ipess_kagome_abelian,
    )
    from tpeps.itevol import itebd_kagome as ikd
    from tpeps.itevol import itebd_kagome_abelian as ika
    from tpeps.models.spin_half_kagome import S_HALF_KAGOME

    path = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "IPESS_KAGOME_RVB_D3_abelian-U1_state.json")
    if not os.path.isfile(path):
        import pytest

        pytest.skip("reference test-input not available")

    st = read_ipess_kagome_abelian(path)
    tdA = dict(st.ipess_tensors[(0, 0)])
    tdD = {k: jnp.asarray(v.to_dense()) for k, v in tdA.items()}

    s2 = SU2(2)
    delta = 1.3
    SS = (delta * jnp.kron(s2.SZ(), s2.SZ())
          + 0.5 * (jnp.kron(s2.SP(), s2.SM()) + jnp.kron(s2.SM(), s2.SP())))
    I2 = jnp.eye(2)
    h3 = (jnp.kron(SS, I2) + jnp.kron(I2, SS)
          + delta * jnp.kron(jnp.kron(s2.SZ(), I2), s2.SZ())
          + 0.5 * (jnp.kron(jnp.kron(s2.SP(), I2), s2.SM())
                   + jnp.kron(jnp.kron(s2.SM(), I2), s2.SP())))

    D, tau, dt = 3, 0.4, 0.2
    lamA = ika.init_lambdas_abelian(tdA)
    lamD = ikd.init_lambdas(tdD)
    tdA, lamA = ika.itebd(tdA, lamA, h3, tau, dt, D)
    tdD, lamD = ikd.itebd(tdD, lamD, h3, tau, dt, D)

    model = S_HALF_KAGOME(j1=1.0)
    cfg = CtmArgs(ctm_max_iter=80, ctm_conv_tol=1e-9)

    # the evolved abelian tensors must still assemble block-sparse
    stA = IPESS_KAGOME_ABELIAN("U1", tdA)
    assert stA.site7((0, 0)).blocks

    def energy_of_dense_td(td):
        st = IPESS_KAGOME_GENERIC({(0, 0): {k: jnp.asarray(v) for k, v in td.items()}})
        env = init_env(st, 18)
        env, _ = run_ctm(st, env, cfg)
        return float(np.real(model.energy_per_site(st, env)))

    eA = energy_of_dense_td({k: v.to_dense() for k, v in tdA.items()})
    eD = energy_of_dense_td(tdD)
    assert np.isfinite(eA) and np.isfinite(eD)
    assert abs(eA - eD) < 5e-6, (eA, eD)
