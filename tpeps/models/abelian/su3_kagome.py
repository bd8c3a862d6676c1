"""SU(3) trimerized kagome model over U(1)xU(1) block-sparse states.

Counterpart of reference models/abelian/su3_kagome.py:12-393
(``KAGOME_SU3_U1xU1``).  The dense Hamiltonian machinery of
:class:`tpeps.models.su3_kagome.KAGOME_SU3` is inherited; expectation
values run through the abelian kagome RDMs
(:mod:`tpeps.ctm.kagome_abelian.rdm_kagome`) — for d = 3 the operator
insertions stay block-sparse end to end (trace1x1/2x2-dn never open a
27^2-sized physical pair).  Methods take
``(state: IPESS_KAGOME_ABELIAN, env: ENV_ABELIAN)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ctm.kagome_abelian import rdm_kagome as rdm_ab
from ..su3_kagome import KAGOME_SU3, _cast_to_real


class KAGOME_SU3_U1xU1(KAGOME_SU3):
    def energy_1site(self, state, env):
        pd = self.phys_dim
        idp3 = jnp.eye(pd ** 3, dtype=self.dtype)
        norm = rdm_ab.trace1x1_dn_kagome((0, 0), state, env, idp3)
        e = rdm_ab.trace1x1_dn_kagome((0, 0), state, env, self.h_tri) / norm
        rho_up = rdm_ab.rdm2x2_up_triangle_open((0, 0), state, env)
        e = e + jnp.einsum("ijkmno,mnoijk", rho_up, self.h_tri)
        return _cast_to_real(e / (len(state.sites7) * 3.0))

    def energy_triangles_2x2subsystem(self, state, env):
        e_dn, _ = rdm_ab.rdm2x2_dn_triangle_with_operator(
            (0, 0), state, env, self.h_tri
        )
        rho_up = rdm_ab.rdm2x2_up_triangle_open((0, 0), state, env)
        e_up = jnp.einsum("ijkmno,mnoijk", rho_up, self.h_tri)
        return _cast_to_real(e_dn), _cast_to_real(e_up)

    def energy_per_site_2x2subsystem(self, state, env):
        e_dn, e_up = self.energy_triangles_2x2subsystem(state, env)
        return (e_dn + e_up) / 3.0

    def eval_obs(self, state, env):
        pd = self.phys_dim
        chirality = 1j * (self.perm3_l - self.perm3_r)
        idp3 = jnp.eye(pd ** 3, dtype=self.dtype)
        obs = {}
        norm = rdm_ab.trace1x1_dn_kagome((0, 0), state, env, idp3)
        obs["chirality_dn"] = _cast_to_real(
            rdm_ab.trace1x1_dn_kagome((0, 0), state, env, chirality) / norm
        )
        obs["avg_bonds_dn"] = _cast_to_real(
            rdm_ab.trace1x1_dn_kagome((0, 0), state, env, self.perm2_tri) / norm
        ) / 3.0
        labels = ["avg_bonds_dn", "chirality_dn"]
        return [obs[l] for l in labels], labels
