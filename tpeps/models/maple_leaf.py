"""Coarse-grained maple-leaf Heisenberg antiferromagnet.

Counterpart of the inline model of reference
examples/maple_leaf/optim_maple_leaf.py:29-165: six spin-1/2 sites of
the maple-leaf lattice are coarse-grained into one site of an effective
triangular lattice (physical dimension d = 2^6 = 64); the Hamiltonian
becomes three two-site operators h_k on the three inequivalent bonds
of the triangular lattice,

    H = sum_i h_0(i, i+(1,0)) + h_1(i, i+(0,1)) + h_2(i, i+(1,-1)),

with a 120-degree spin rotation (R_y(2pi/3) on each of the 6 spins)
conjugating the second site of every bond.  Couplings: Jd (dimer), Jt
(triangle), Jh (hexagon).

TPU design: the 64-dim two-site gates are never applied through open
d^2 RDMs — each h_k is SVD-split into a compact two-site MPO
(:func:`tpeps.ctm.generic.rdm_mpo.mpo_from_gate`, the reference uses
``rdm.get_exact_mps``) and threaded through the double layer
(``eval_mpo_rdm2x1 / 1x2 / 2x2_NNN_1n1``), keeping the peak
intermediate at O(chi^2 D^4 k) instead of O(chi^2 D^4 d^2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ctm.generic import rdm_mpo

_SZ = np.array([[0.5, 0.0], [0.0, -0.5]])
_SP = np.array([[0.0, 1.0], [0.0, 0.0]])
_SM = np.array([[0.0, 0.0], [1.0, 0.0]])
_ISY = np.array([[0.0, 1.0], [-1.0, 0.0]])


def _op6(op, s, L=6):
    """Single-spin operator embedded at site s (1-indexed) of a 6-spin
    block (64 x 64 — cheap)."""
    m = np.eye(2 ** (s - 1))
    m = np.kron(np.kron(m, op), np.eye(2 ** (L - s)))
    return m


def _ss6(J, s1, s2):
    """J * S_s1 . S_s2 within one 6-spin block (64 x 64)."""
    return J * (
        _op6(_SZ, s1) @ _op6(_SZ, s2)
        + 0.5 * _op6(_SP, s1) @ _op6(_SM, s2)
        + 0.5 * _op6(_SM, s1) @ _op6(_SP, s2)
    )


def _ss_cross(J, s1, s2):
    """J * S_s1 . S_s2 with s1 in block A (1..6), s2 in block B (7..12):
    a single kron of two 64-dim factors (the reference's
    ``make_hamil_mat`` builds the same operator through a chain of
    2^12-sized krons — this is ~30x cheaper)."""
    sA, sB = s1, s2 - 6
    return J * (
        np.kron(_op6(_SZ, sA), _op6(_SZ, sB))
        + 0.5 * np.kron(_op6(_SP, sA), _op6(_SM, sB))
        + 0.5 * np.kron(_op6(_SM, sA), _op6(_SP, sB))
    )


def build_h_eff(Jd=1.0, Jh=1.0, Jt=1.0):
    """The three bond Hamiltonians h_k (4096 x 4096 each) and the
    6-spin rotation unitary (reference optim_maple_leaf.py:29-165;
    same intra/inter coupling tables)."""
    intra = [
        (1, 2, Jd / 6), (3, 4, Jd / 6), (5, 6, Jd / 6),
        (2, 4, Jt / 6), (4, 6, Jt / 6), (6, 2, Jt / 6),
        (2, 3, Jh / 6), (4, 5, Jh / 6), (6, 1, Jh / 6),
    ]
    inter10 = [(5, 7, Jt), (5, 8, Jh)]
    inter0_1 = [(1, 9, Jt), (1, 10, Jh)]
    inter_11 = [(3, 11, Jt), (3, 12, Jh)]

    h6 = np.zeros((64, 64))
    for s1, s2, J in intra:
        h6 += _ss6(J, s1, s2)
    I64 = np.eye(64)
    h_intra = np.kron(h6, I64) + np.kron(I64, h6)

    h = [h_intra.copy() for _ in range(3)]
    for s1, s2, J in inter10:
        h[0] += _ss_cross(J, s1, s2)
    for s1, s2, J in inter0_1:
        h[1] += _ss_cross(J, s1, s2)
    for s1, s2, J in inter_11:
        h[2] += _ss_cross(J, s1, s2)

    theta = 2.0 * np.pi / 3.0
    u1 = np.eye(2) * np.cos(theta / 2.0) - _ISY * np.sin(theta / 2.0)
    u = np.array([[1.0]])
    for _ in range(6):
        u = np.kron(u, u1)
    return h, u


class MAPLE_LEAF:
    """Energy evaluator on the 1-site effective-triangular iPEPS."""

    def __init__(self, Jd=1.0, Jh=1.0, Jt=1.0, mpo_tol=1.0e-12):
        self.Jd, self.Jh, self.Jt = Jd, Jh, Jt
        self.phys_dim = 64
        h, u = build_h_eff(Jd=Jd, Jh=Jh, Jt=Jt)
        self.h_eff = h
        self.u = u

        d = self.phys_dim

        def rotate_second(g):
            # conjugate site 2 of the gate with the rotation (reference
            # optim_maple_leaf.py get_energy_mps: U applied to both the
            # ket and bra legs of the second mps site; u is real)
            g4 = g.reshape(d, d, d, d)  # [s0 s1, s0' s1']
            return np.einsum("absd,bq,dr->aqsr", g4, u, u).reshape(d * d, d * d)

        g10 = rotate_second(h[0])
        g01 = rotate_second(h[1])
        g1n1 = rotate_second(h[2])
        # the gates are sums of ~21 two-spin terms: MPO rank <= 4*21
        mr = 96
        self.mpo10 = rdm_mpo.mpo_from_gate(g10, 2, d, tol=mpo_tol, max_rank=mr)
        self.mpo01 = rdm_mpo.mpo_from_gate(g01, 2, d, tol=mpo_tol, max_rank=mr)
        # anti-diagonal evaluator wants site order (upper-right,
        # lower-left); the gate acts with s0 = lower-left
        g1n1_T = (
            g1n1.reshape(d, d, d, d).transpose(1, 0, 3, 2).reshape(d * d, d * d)
        )
        self.mpo1n1 = rdm_mpo.mpo_from_gate(g1n1_T, 2, d, tol=mpo_tol, max_rank=mr)
        eye = jnp.asarray(np.eye(d).reshape(1, d, 1, d))
        self.mpo_id2 = (eye, eye)

    def energy_1site(self, state, env):
        """Sum of the three normalized bond energies (the reference's
        ``loss = sum(e_bonds)``)."""
        sites, site_of = state.sites, state.vertexToSite
        C, T = env.C, env.T
        e10 = rdm_mpo.eval_mpo_rdm2x1((0, 0), sites, site_of, C, T, self.mpo10)
        n10 = rdm_mpo.eval_mpo_rdm2x1((0, 0), sites, site_of, C, T, self.mpo_id2)
        e01 = rdm_mpo.eval_mpo_rdm1x2((0, 0), sites, site_of, C, T, self.mpo01)
        n01 = rdm_mpo.eval_mpo_rdm1x2((0, 0), sites, site_of, C, T, self.mpo_id2)
        e11 = rdm_mpo.eval_mpo_rdm2x2_NNN_1n1((0, 0), sites, site_of, C, T, self.mpo1n1)
        n11 = rdm_mpo.eval_mpo_rdm2x2_NNN_1n1((0, 0), sites, site_of, C, T, None)
        e = e10 / n10 + e01 / n01 + e11 / n11
        return e.real if jnp.iscomplexobj(e) else e

    def eval_obs(self, state, env):
        """Per-spin <S^z> of the six coarse-grained spins (reference
        f_obs_opt)."""
        from ..ctm.generic import rdm as rdm_gen

        sites, site_of = state.sites, state.vertexToSite
        rho = rdm_gen.rdm1x1((0, 0), sites, site_of, env.C, env.T)
        rho = np.asarray(rho).reshape((2,) * 12)
        obs, labels = [], []
        for i in range(6):
            ket = list(range(6))
            bra = list(range(6))
            bra[i] = 6  # replace i-th ket index in the bra by a fresh one
            tr = np.einsum(rho, ket + bra, [i, 6])
            obs.append(float(np.trace(tr @ _SZ).real))
            labels.append(f"sz{i}")
        return obs, labels


def mf_product_state(noise=0.0, bond_dim=1, seed=0):
    """Neel mean-field product state of the 6 underlying spins
    (reference ipeps_init_type='MF'), optionally noised/extended."""
    import jax

    from ..ipeps.ipeps import IPEPS, extend_bond_dim

    v = np.array([1.0])
    for i in range(6):
        s = np.array([1.0, 0.0]) if i % 2 == 0 else np.array([0.0, 1.0])
        v = np.kron(v, s)
    a = jnp.asarray(v.reshape((64, 1, 1, 1, 1)))
    state = IPEPS({(0, 0): a})
    if bond_dim > 1:
        state = extend_bond_dim(state, bond_dim)
    if noise > 0:
        key = jax.random.PRNGKey(seed)
        sites = {
            c: t + noise * jax.random.uniform(key, t.shape, minval=-0.5, maxval=0.5)
            for c, t in state.sites.items()
        }
        state = IPEPS(sites)
    return state
