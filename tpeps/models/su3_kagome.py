"""SU(3) model on the kagome lattice (trimerized phases).

Counterpart of reference models/su3_kagome.py:16-393 (``KAGOME_SU3``):

.. math::
    H = J \\sum_{<ij>} P_{ij}
      + K \\sum_t (P_{ijk} + P^{-1}_{ijk})
      + ih \\sum_t (P_{ijk} - P^{-1}_{ijk})

with 2-site permutations P_ij = 2 C1 + 1/3 and 3-site ring exchanges
built as products of transpositions.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ctm.kagome import rdm_kagome
from ..groups.su3 import SU3_DEFINING


def _cast_to_real(t):
    return t.real if jnp.iscomplexobj(t) else t


class KAGOME_SU3:
    """(reference su3_kagome.py:16)."""

    def __init__(self, phys_dim=3, j=0.0, k=1.0, h=0.0, dtype=jnp.complex128):
        self.dtype = dtype
        self.phys_dim = phys_dim
        self.j, self.k, self.h = j, k, h
        self.obs_ops = self.get_obs_ops()
        (self.perm2_tri, self.perm3_l, self.perm3_r,
         self.h2_tri, self.h3_tri, self.h_tri) = self.get_h()

    def get_obs_ops(self):
        irrep = SU3_DEFINING(dtype=self.dtype)
        return {
            "tz": irrep.TZ(), "tp": irrep.TP(), "tm": irrep.TM(),
            "vp": irrep.VP(), "vm": irrep.VM(), "up": irrep.UP(),
            "um": irrep.UM(), "y": irrep.Y(), "J": irrep.J_Gell_Mann(),
        }

    def get_h(self):
        """2-site permutation P = 2 C1 + 1/3 and ring exchanges
        (reference su3_kagome.py:73-92)."""
        pd = self.phys_dim
        idp = jnp.eye(pd, dtype=self.dtype)
        irrep = SU3_DEFINING(dtype=self.dtype)
        perm2 = 2 * irrep.C1() + jnp.eye(pd**2, dtype=self.dtype).reshape(pd, pd, pd, pd) / 3
        perm3_l = jnp.einsum("ijal,lkbc->ijkabc", perm2, perm2)
        perm3_r = jnp.einsum("ijal,klbc->ikjabc", perm2, perm2)

        perm2_tri = (jnp.einsum("ijab,kc->ijkabc", perm2, idp)
                     + jnp.einsum("ikac,jb->ijkabc", perm2, idp)
                     + jnp.einsum("jkbc,ia->ijkabc", perm2, idp))
        h2_tri = self.j * perm2_tri
        h3_tri = (self.k + 1j * self.h) * perm3_l + (self.k - 1j * self.h) * perm3_r
        return perm2_tri, perm3_l, perm3_r, h2_tri, h3_tri, h2_tri + h3_tri

    # ------------------------------------------------------------ energies
    def energy_1site(self, state, env):
        """Down triangle from the 1x1 subsystem + up triangle from the 2x2
        open-triangle RDM (reference su3_kagome.py:94-124)."""
        pd = self.phys_dim
        sites, site_of = dict(state.sites), state.vertexToSite
        idp3 = jnp.eye(pd**3, dtype=self.dtype)
        norm = rdm_kagome.trace1x1_dn_kagome(
            (0, 0), sites, site_of, env.C, env.T, idp3, pd)
        e = rdm_kagome.trace1x1_dn_kagome(
            (0, 0), sites, site_of, env.C, env.T, self.h_tri, pd) / norm
        rho_up = rdm_kagome.rdm2x2_up_triangle_open(
            (0, 0), sites, site_of, env.C, env.T, pd)
        e = e + jnp.einsum("ijkmno,mnoijk", rho_up, self.h_tri)
        return _cast_to_real(e / (len(state.sites) * 3.0))

    def energy_triangles_2x2subsystem(self, state, env):
        """Both triangles from 2x2 subsystems (reference su3_kagome.py:244-274)."""
        sites, site_of = dict(state.sites), state.vertexToSite
        pd = self.phys_dim
        e_dn, _ = rdm_kagome.rdm2x2_dn_triangle_with_operator(
            (0, 0), sites, site_of, env.C, env.T, self.h_tri, pd)
        rho_up = rdm_kagome.rdm2x2_up_triangle_open(
            (0, 0), sites, site_of, env.C, env.T, pd)
        e_up = jnp.einsum("ijkmno,mnoijk", rho_up, self.h_tri)
        return _cast_to_real(e_dn), _cast_to_real(e_up)

    def energy_per_site_2x2subsystem(self, state, env):
        """(reference su3_kagome.py:276-292)."""
        e_dn, e_up = self.energy_triangles_2x2subsystem(state, env)
        return (e_dn + e_up) / 3.0

    # ---------------------------------------------------------- observables
    def eval_generators(self, state, env):
        """Per-site Gell-Mann generator expectations and m2 = |<J>|^2
        (reference su3_kagome.py:294-325)."""
        pd = self.phys_dim
        sites, site_of = dict(state.sites), state.vertexToSite
        idp2 = jnp.eye(pd**2, dtype=self.dtype).reshape(pd, pd, pd, pd)
        idp3 = jnp.eye(pd**3, dtype=self.dtype)
        norm = _cast_to_real(rdm_kagome.trace1x1_dn_kagome(
            (0, 0), sites, site_of, env.C, env.T, idp3, pd))
        J = self.obs_ops["J"]
        embed = {
            "A": lambda op: jnp.einsum("ab,ijkl->aijbkl", op, idp2),
            "B": lambda op: jnp.einsum("ab,ijkl->iajkbl", op, idp2),
            "C": lambda op: jnp.einsum("ab,ijkl->ijaklb", op, idp2),
        }
        gens = {}
        for st, emb in embed.items():
            v = jnp.stack([
                _cast_to_real(rdm_kagome.trace1x1_dn_kagome(
                    (0, 0), sites, site_of, env.C, env.T,
                    emb(J[i]).reshape(pd**3, pd**3), pd)) / norm
                for i in range(J.shape[0])
            ])
            gens[st] = v
            gens[f"m2_{st}"] = jnp.dot(v, v)
        return gens

    def eval_obs(self, state, env):
        """Bond averages + chiralities + magnetizations
        (reference su3_kagome.py:125-169)."""
        pd = self.phys_dim
        sites, site_of = dict(state.sites), state.vertexToSite
        chirality = 1j * (self.perm3_l - self.perm3_r)
        idp3 = jnp.eye(pd**3, dtype=self.dtype)
        obs = {}
        norm = rdm_kagome.trace1x1_dn_kagome(
            (0, 0), sites, site_of, env.C, env.T, idp3, pd)
        obs["chirality_dn"] = _cast_to_real(rdm_kagome.trace1x1_dn_kagome(
            (0, 0), sites, site_of, env.C, env.T, chirality, pd) / norm)
        obs["avg_bonds_dn"] = _cast_to_real(rdm_kagome.trace1x1_dn_kagome(
            (0, 0), sites, site_of, env.C, env.T, self.perm2_tri, pd) / norm) / 3.0
        rho_up = rdm_kagome.rdm2x2_up_triangle_open(
            (0, 0), sites, site_of, env.C, env.T, pd)
        chir6 = chirality
        obs["chirality_up"] = _cast_to_real(
            jnp.einsum("ijkabc,ijkabc", rho_up, chir6))
        obs["avg_bonds_up"] = _cast_to_real(
            jnp.einsum("ijkabc,ijkabc", rho_up, self.perm2_tri)) / 3.0
        obs.update(self.eval_generators(state, env))
        labels = ["avg_bonds_dn", "avg_bonds_up", "chirality_dn", "chirality_up",
                  "m2_A", "m2_B", "m2_C"]
        return [obs[l] for l in labels], labels
