"""Coupled ladders over abelian (U(1)) block-sparse states.

Counterpart of reference models/abelian/coupledLadders.py:22-352
(``COUPLEDLADDERS_NOSYM`` / ``COUPLEDLADDERS_U1``).  As with
:mod:`tpeps.models.abelian.j1j2`, the abelian RDMs return dense rho so
the dense Hamiltonian machinery of
:class:`tpeps.models.coupledLadders.COUPLEDLADDERS` is inherited —
only the RDM source changes.
"""

from __future__ import annotations

from math import sqrt

import jax.numpy as jnp

from ...ctm.generic_abelian import rdm as rdm_ab
from ..coupledLadders import COUPLEDLADDERS, _cast_to_real


class COUPLEDLADDERS_ABELIAN(COUPLEDLADDERS):
    """Energies/observables from abelian environments; methods take
    ``(state: IPEPS_ABELIAN, env: ENV_ABELIAN)``."""

    def energy_2x1_1x2(self, state, env):
        """(reference models/abelian/coupledLadders.py:87-170)."""
        energy = 0.0
        for coord in state.sites:
            r21 = rdm_ab.rdm2x1(coord, state, env)
            r12 = rdm_ab.rdm1x2(coord, state, env)
            energy = energy + jnp.einsum("ijab,ijab", r21, self.h2)
            scale = 1.0 if coord[1] % 2 == 0 else self.alpha
            energy = energy + scale * jnp.einsum("ijab,ijab", r12, self.h2)
            energy = energy + self.bz(coord) * jnp.einsum("ijab,ijab", r12, self.h1)
        return _cast_to_real(energy / len(state.sites))

    def eval_obs(self, state, env):
        """(reference models/abelian/coupledLadders.py:172-246)."""
        obs = {"avg_m": 0.0}
        for coord in state.sites:
            rho = rdm_ab.rdm1x1(coord, state, env)
            for label, op in self.obs_ops.items():
                obs[f"{label}{coord}"] = complex(jnp.trace(rho @ op))
            obs[f"m{coord}"] = sqrt(
                abs(obs[f"sz{coord}"] ** 2 + obs[f"sp{coord}"] * obs[f"sm{coord}"])
            )
            obs["avg_m"] += obs[f"m{coord}"]
        obs["avg_m"] /= len(state.sites)
        for coord in state.sites:
            r21 = rdm_ab.rdm2x1(coord, state, env)
            r12 = rdm_ab.rdm1x2(coord, state, env)
            obs[f"SS2x1{coord}"] = complex(jnp.einsum("ijab,ijab", r21, self.h2)).real
            obs[f"SS1x2{coord}"] = complex(jnp.einsum("ijab,ijab", r12, self.h2)).real
        labels = (
            ["avg_m"]
            + [f"m{c}" for c in state.sites]
            + [f"{l}{c}" for c in state.sites for l in self.obs_ops]
            + [f"SS2x1{c}" for c in state.sites]
            + [f"SS1x2{c}" for c in state.sites]
        )
        return [obs[l] for l in labels], labels
