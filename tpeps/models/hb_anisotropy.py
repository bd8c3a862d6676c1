"""Spin-S bilinear-biquadratic J-K model with x/y anisotropy (coupled
chains).  Counterpart of reference models/hb_anisotropy.py:12-465
(``COUPLEDCHAINS``):

.. math::
    H = \\sum_{ij} [J_x S.S_{x} + K_x (S.S_x)^2]
      + \\sum_{ij} [J_y S.S_{y} + K_y (S.S_y)^2]
"""

from __future__ import annotations

from math import sqrt

import jax.numpy as jnp

from ..ctm.generic import corrf as corrf_gen
from ..ctm.generic import rdm as rdm_gen
from ..groups import su2


class COUPLEDCHAINS:
    """Anisotropic BLBQ spin-S chains (reference hb_anisotropy.py:12)."""

    def __init__(self, phys_dim=3, j1_x=1.0, j1_y=1.0, k1_x=0.0, k1_y=0.0,
                 dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = phys_dim
        self.j1_x, self.j1_y = j1_x, j1_y
        self.k1_x, self.k1_y = k1_x, k1_y
        self.obs_ops = self.get_obs_ops()
        self.h2_x, self.h2_y, self.hp_h, self.hp_v, self.hp = self.get_h()
        self.Q = self.get_Q()
        # sign pattern making the quadrupole matrix real-valued
        self.flip = jnp.asarray(
            [[1.0, -1.0, 1.0], [-1.0, 1.0, -1.0], [1.0, -1.0, 1.0]], dtype=dtype
        )

    def get_obs_ops(self):
        irrep = su2.SU2(self.phys_dim, dtype=self.dtype)
        ops = {"sz": irrep.SZ(), "sp": irrep.SP(), "sm": irrep.SM(), "I": irrep.I()}
        ops["sx"] = 0.5 * (ops["sp"] + ops["sm"])
        ops["isy"] = 0.5 * (ops["sp"] - ops["sm"])
        ops["SS"] = irrep.SS()
        ops["SS_square"] = jnp.einsum("ijab,abkl->ijkl", ops["SS"], ops["SS"])
        return ops

    def get_h(self):
        """Direction-resolved 2-site terms + plaquette aggregates
        (reference hb_anisotropy.py:64-96)."""
        pd = self.phys_dim
        idp = jnp.eye(pd**2, dtype=self.dtype).reshape(pd, pd, pd, pd)
        SS = self.obs_ops["SS"].reshape(pd**2, pd**2)
        SS2 = SS @ SS
        h2_x = (self.j1_x * SS + self.k1_x * SS2).reshape(pd, pd, pd, pd)
        h2_y = (self.j1_y * SS + self.k1_y * SS2).reshape(pd, pd, pd, pd)

        h2x2_x = jnp.einsum("ijab,klcd->ijklabcd", h2_x, idp)
        h2x2_y = jnp.einsum("ijab,klcd->ijklabcd", h2_y, idp)
        hp_h = h2x2_x + h2x2_x.transpose(2, 3, 0, 1, 6, 7, 4, 5)
        hp_v = h2x2_y.transpose(0, 2, 1, 3, 4, 6, 5, 7) \
            + h2x2_y.transpose(2, 0, 3, 1, 6, 4, 7, 5)
        return h2_x, h2_y, hp_h, hp_v, hp_h + hp_v

    # ------------------------------------------------------------ energies
    def energy_2x1_1x2(self, state, env):
        """NN bond energies per site (reference hb_anisotropy.py:98-147)."""
        sites, site_of = dict(state.sites), state.vertexToSite
        e = 0.0
        for coord in state.sites:
            r21 = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            r12 = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            e = e + jnp.einsum("ijab,ijab", r21, self.h2_x)
            e = e + jnp.einsum("ijab,ijab", r12, self.h2_y)
        return e / len(state.sites)

    def energy_2x2_4site(self, state, env):
        """Plaquette form over the 2x2 cell (reference hb_anisotropy.py:149-193)."""
        sites, site_of = dict(state.sites), state.vertexToSite
        r = {c: rdm_gen.rdm2x2(c, sites, site_of, env.C, env.T)
             for c in ((0, 0), (1, 0), (0, 1), (1, 1))}
        e = jnp.einsum("ijklabcd,ijklabcd", r[(0, 0)], self.hp_h)
        e = e + jnp.einsum("ijklabcd,ijklabcd", r[(1, 0)], self.hp_v)
        e = e + jnp.einsum("ijklabcd,ijklabcd", r[(0, 1)], self.hp_v)
        e = e + jnp.einsum("ijklabcd,ijklabcd", r[(1, 1)], self.hp_h)
        # NOTE: the reference divides by 8 (hb_anisotropy.py:192), which is
        # the number of bond terms — i.e. this returns the average *bond*
        # energy, half of energy_2x1_1x2.  Kept verbatim for parity; the
        # reference's examples only ever call energy_2x1_1x2.
        return e / 8.0

    # ---------------------------------------------------------- observables
    def get_Q(self):
        """Real-valued quadrupole operator matrix
        (reference hb_anisotropy.py:313-345)."""
        spin_s = (self.phys_dim - 1) / 2
        rows = []
        for i in ["sx", "isy", "sz"]:
            row = []
            for j in ["sx", "isy", "sz"]:
                op = self.obs_ops[i] @ self.obs_ops[j] \
                    + self.obs_ops[j] @ self.obs_ops[i]
                if i == j:
                    shift = 2 / 3 * spin_s * (spin_s + 1) * self.obs_ops["I"]
                    op = op + shift if i == "isy" else op - shift
                row.append(op)
            rows.append(jnp.stack(row))
        return jnp.stack(rows)

    def eval_dimer_operator(self, state, env, direction=(1, 0)):
        """D = |<S.S>_bond1 - <S.S>_bond2| (reference hb_anisotropy.py:280-311)."""
        assert direction in ((1, 0), (0, 1)), "Invalid direction"
        sites, site_of = dict(state.sites), state.vertexToSite
        ss = []
        for coord in state.sites:
            if direction == (1, 0):
                rho = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            else:
                rho = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            ss.append(jnp.einsum("ijab,abij", rho, self.obs_ops["SS"]))
        return jnp.abs(ss[0] - ss[1])

    def eval_obs(self, state, env):
        """Magnetization, quadrupole moments, NN SS/(SS)^2, dimer order
        (reference hb_anisotropy.py:195-253)."""
        sites, site_of = dict(state.sites), state.vertexToSite
        obs = {"avg_m": 0.0, "avg_II_Q": 0.0, "avg_III_Q": 0.0, "anti_fm": 0.0}
        for coord in state.sites:
            rho = rdm_gen.rdm1x1(coord, sites, site_of, env.C, env.T)
            for label in ["sz", "sp", "sm"]:
                obs[f"{label}{coord}"] = jnp.trace(rho @ self.obs_ops[label])
            obs[f"m{coord}"] = sqrt(abs(
                obs[f"sz{coord}"] ** 2 + obs[f"sp{coord}"] * obs[f"sm{coord}"]))
            obs["avg_m"] += obs[f"m{coord}"]
            Qc = jnp.einsum("ab,ijba->ij", rho, self.Q)
            obs[f"avg_II_Q{coord}"] = -0.5 * jnp.trace((Qc * self.flip) @ Qc)
            obs[f"avg_III_Q{coord}"] = -jnp.linalg.det(Qc)
            obs["avg_II_Q"] += obs[f"avg_II_Q{coord}"]
            obs["avg_III_Q"] += obs[f"avg_III_Q{coord}"]
        n = len(state.sites)
        for k in ("avg_m", "avg_II_Q", "avg_III_Q"):
            obs[k] = obs[k] / n

        ss_labels = []
        for coord in state.sites:
            r21 = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            r12 = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            obs[f"SS_2x1{coord}"] = jnp.einsum("ijab,abij", r21, self.obs_ops["SS"])
            obs[f"SS_1x2{coord}"] = jnp.einsum("ijab,abij", r12, self.obs_ops["SS"])
            obs[f"SS2_2x1{coord}"] = jnp.einsum("ijab,abij", r21, self.obs_ops["SS_square"])
            obs[f"SS2_1x2{coord}"] = jnp.einsum("ijab,abij", r12, self.obs_ops["SS_square"])
            ss_labels += [f"SS_2x1{coord}", f"SS2_2x1{coord}",
                          f"SS_1x2{coord}", f"SS2_1x2{coord}"]
        obs["dimer_op"] = self.eval_dimer_operator(state, env)

        labels = ["avg_m", "avg_II_Q", "avg_III_Q", "anti_fm", "dimer_op"] + ss_labels
        return [obs[l] for l in labels], labels

    def eval_corrf_SS(self, coord, direction, state, env, dist):
        """Spin-spin correlators along a row/column
        (reference hb_anisotropy.py:347-426)."""
        ops = self.obs_ops

        def op_sz(r):
            return ops["sz"]

        def get_op_sx(r):
            return 0.5 * (ops["sp"] + ops["sm"])

        Sz0szR = corrf_gen.corrf_1sO1sO(
            coord, direction, state, env, ops["sz"], op_sz, dist)
        Sx0sxR = corrf_gen.corrf_1sO1sO(
            coord, direction, state, env, 0.5 * (ops["sp"] + ops["sm"]), get_op_sx, dist)
        return {"ss": Sz0szR + Sx0sxR, "szsz": Sz0szR, "sxsx": Sx0sxR}
