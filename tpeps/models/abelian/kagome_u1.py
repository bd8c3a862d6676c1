"""Spin-1/2 kagome model over U(1) block-sparse states.

Counterpart of reference models/abelian/kagome_u1.py:13-342
(``KAGOME_U1``).  The abelian kagome RDMs
(:mod:`tpeps.ctm.kagome_abelian.rdm_kagome`) return dense rho /
normalized scalars, so the dense Hamiltonian machinery of
:class:`tpeps.models.spin_half_kagome.S_HALF_KAGOME` is inherited; only
the RDM source changes.  Methods take
``(state: IPESS_KAGOME_ABELIAN, env: ENV_ABELIAN)`` where ``env`` is
the CTM environment of ``state.fused()``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ctm.kagome_abelian import rdm_kagome as rdm_ab
from ..spin_half_kagome import S_HALF_KAGOME, _cast_to_real


class KAGOME_U1(S_HALF_KAGOME):
    def energy_triangle_dn(self, state, env):
        e_dn, norms = {}, {}
        for coord in state.sites7:
            val, norm = rdm_ab.rdm2x2_dn_triangle_with_operator(
                coord, state, env, self.h_triangle
            )
            e_dn[coord] = _cast_to_real(val)
            norms[coord] = norm
        return e_dn, norms

    def energy_triangle_up(self, state, env):
        e_up, norms = {}, {}
        for coord in state.sites7:
            rho = rdm_ab.rdm2x2_up_triangle_open(coord, state, env)
            norms[coord] = jnp.einsum("ijkijk", rho)
            e_up[coord] = _cast_to_real(jnp.einsum("ijkmno,mnoijk", rho, self.h_triangle))
        return e_up, norms

    def energy_per_site(self, state, env):
        e_dn, _ = self.energy_triangle_dn(state, env)
        e_up, _ = self.energy_triangle_up(state, env)
        return (sum(e_up.values()) + sum(e_dn.values())) / (3 * len(state.sites7))

    def eval_obs(self, state, env):
        obs = {}
        for coord in state.sites7:
            norm = rdm_ab.trace1x1_dn_kagome(coord, state, env, self.Id3_t)
            for label, op in self.obs_ops.items():
                obs[f"{label}{coord}"] = complex(
                    rdm_ab.trace1x1_dn_kagome(coord, state, env, op) / norm
                )
        labels = [f"{l}{c}" for c in state.sites7 for l in self.obs_ops]
        return [obs[l] for l in labels], labels
