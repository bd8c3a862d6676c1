"""Spin-1/2 Hamiltonian on the kagome lattice.

Counterpart of reference models/spin_half_kagome.py:16-439
(``S_HALF_KAGOME``):

H = J1 sum_<ij> S_i.S_j (+DM) + j1sq (S.S)^2 - Jtrip sum_t (S x S).S
    + Jperm sum_t P_t + Jperm* sum_t P^-1_t + h sum_i Sz_i

with sums over up/down triangles, evaluated on the square-lattice-mapped
kagome iPEPS through :mod:`tpeps.ctm.kagome.rdm_kagome`.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ctm.kagome import rdm_kagome
from ..groups import su2


def _cast_to_real(t):
    return t.real if jnp.iscomplexobj(t) else t


class S_HALF_KAGOME:
    def __init__(self, j1=1.0, JD=0.0, j1sq=0.0, j2=0.0, j2sq=0.0, jtrip=0.0,
                 jperm=0 + 0j, h=0.0, phys_dim=2, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = phys_dim
        self.j1, self.JD, self.j1sq = j1, JD, j1sq
        self.j2, self.j2sq, self.jtrip = j2, j2sq, jtrip
        self.jperm = complex(jperm)
        self.h = h

        irrep = su2.SU2(phys_dim, dtype=dtype)
        Id1 = irrep.I()
        self.Id3_t = jnp.eye(phys_dim**3, dtype=dtype)
        SS = irrep.SS()
        if abs(JD) == 0:
            SS_JD = j1 * SS
        else:
            SS_JD = irrep.SS(xyz=(j1, j1 + 1j * JD, j1 - 1j * JD))
        self.SSnnId = jnp.einsum("ijkl,ab->ijaklb", SS_JD, Id1)
        SSnn_t = (
            self.SSnnId
            + self.SSnnId.transpose(1, 2, 0, 4, 5, 3)
            + self.SSnnId.transpose(2, 0, 1, 5, 3, 4)
        )
        SS2 = jnp.einsum("ijab,abkl->ijkl", SS, SS)
        SS2nnId = jnp.einsum("ijkl,ab->ijaklb", SS2, Id1)
        SS2nn_t = (
            SS2nnId
            + SS2nnId.transpose(1, 2, 0, 4, 5, 3)
            + SS2nnId.transpose(2, 0, 1, 5, 3, 4)
        )
        mag = jnp.einsum("ij,kl,ab->ikajlb", irrep.SZ(), Id1, Id1)
        mag = mag + mag.transpose(1, 2, 0, 4, 5, 3) + mag.transpose(2, 0, 1, 5, 3, 4)

        h_tri = SSnn_t + self.j1sq * SS2nn_t + self.h * mag

        if jtrip != 0:
            assert jnp.issubdtype(dtype, jnp.complexfloating), "jtrip requires complex dtype"
            Svec = irrep.S()
            eps3 = np.zeros((3, 3, 3))
            eps3[0, 1, 2] = eps3[1, 2, 0] = eps3[2, 0, 1] = 1.0
            eps3[0, 2, 1] = eps3[2, 1, 0] = eps3[1, 0, 2] = -1.0
            SxSS_t = jnp.einsum("abc,bij,ckl,amn->ikmjln", jnp.asarray(eps3, dtype=dtype), Svec, Svec, Svec)
            h_tri = h_tri + jtrip * SxSS_t

        P = np.zeros([phys_dim] * 6, dtype=complex if abs(self.jperm) else float)
        Pinv = np.zeros_like(P)
        for i in range(phys_dim):
            for j in range(phys_dim):
                for k in range(phys_dim):
                    P[i, j, k, j, k, i] = 1.0
                    Pinv[i, j, k, k, i, j] = 1.0
        self.P_triangle = jnp.asarray(P, dtype=dtype)
        self.P_triangle_inv = jnp.asarray(Pinv, dtype=dtype)
        if abs(self.jperm) > 0:
            assert jnp.issubdtype(dtype, jnp.complexfloating), "jperm requires complex dtype"
            h_tri = h_tri + self.jperm * self.P_triangle \
                + np.conj(self.jperm) * self.P_triangle_inv
        self.h_triangle = h_tri

        szId2 = jnp.einsum("ij,kl,ab->ikajlb", irrep.SZ(), Id1, Id1)
        spId2 = jnp.einsum("ij,kl,ab->ikajlb", irrep.SP(), Id1, Id1)
        smId2 = jnp.einsum("ij,kl,ab->ikajlb", irrep.SM(), Id1, Id1)
        self.obs_ops = {
            "sz_0": szId2, "sp_0": spId2, "sm_0": smId2,
            "sz_1": szId2.transpose(2, 0, 1, 5, 3, 4),
            "sp_1": spId2.transpose(2, 0, 1, 5, 3, 4),
            "sm_1": smId2.transpose(2, 0, 1, 5, 3, 4),
            "sz_2": szId2.transpose(1, 2, 0, 4, 5, 3),
            "sp_2": spId2.transpose(1, 2, 0, 4, 5, 3),
            "sm_2": smId2.transpose(1, 2, 0, 4, 5, 3),
        }

    # ------------------------------------------------------------------
    def energy_triangle_dn(self, state, env):
        """<h_triangle> on down triangles (reference spin_half_kagome.py:133-151)."""
        d = state.get_physical_dim()
        e_dn, norms = {}, {}
        for coord in state.sites:
            val, norm = rdm_kagome.rdm2x2_dn_triangle_with_operator(
                coord, state.sites, state.vertexToSite, env.C, env.T,
                self.h_triangle, d,
            )
            e_dn[coord] = _cast_to_real(val)
            norms[coord] = norm
        return e_dn, norms

    def energy_triangle_up(self, state, env):
        """<h_triangle> on up triangles (reference spin_half_kagome.py:176-200)."""
        d = state.get_physical_dim()
        e_up, norms = {}, {}
        for coord in state.sites:
            rho = rdm_kagome.rdm2x2_up_triangle_open(
                coord, state.sites, state.vertexToSite, env.C, env.T, d
            )
            norms[coord] = jnp.einsum("ijkijk", rho)
            e_up[coord] = _cast_to_real(jnp.einsum("ijkmno,mnoijk", rho, self.h_triangle))
        return e_up, norms

    def energy_per_site(self, state, env):
        """(e_up + e_dn) / (3 n_sites) — the per-kagome-site energy
        (reference examples/kagome/ctmrg_spin_half_kagome.py:172-180)."""
        e_dn, _ = self.energy_triangle_dn(state, env)
        e_up, _ = self.energy_triangle_up(state, env)
        return (sum(e_up.values()) + sum(e_dn.values())) / (3 * len(state.sites))

    def eval_obs(self, state, env):
        """Per-DoF magnetizations via the down-triangle trace
        (reference spin_half_kagome.py:280-340)."""
        d = state.get_physical_dim()
        obs = {}
        for coord in state.sites:
            norm = rdm_kagome.trace1x1_dn_kagome(
                coord, state.sites, state.vertexToSite, env.C, env.T, self.Id3_t, d
            )
            for label, op in self.obs_ops.items():
                obs[f"{label}{coord}"] = complex(
                    rdm_kagome.trace1x1_dn_kagome(
                        coord, state.sites, state.vertexToSite, env.C, env.T, op, d
                    )
                    / norm
                )
        labels = [f"{l}{c}" for c in state.sites for l in self.obs_ops]
        return [obs[l] for l in labels], labels
