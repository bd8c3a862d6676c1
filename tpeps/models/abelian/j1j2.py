"""J1-J2 model over abelian (U(1)) block-sparse states.

Counterpart of reference models/abelian/j1j2.py:16-377 ``J1J2_NOSYM``.
The reference builds Hamiltonian operators densely ("with no symmetry
structure", its docstring) and contracts them with abelian RDMs
converted on the fly; here the abelian RDMs of
:mod:`tpeps.ctm.generic_abelian.rdm` return dense rho directly, so the
whole dense Hamiltonian machinery of :class:`tpeps.models.j1j2.J1J2` is
inherited unchanged — only the RDM source differs.
"""

from __future__ import annotations

from math import sqrt

import jax.numpy as jnp

from ...ctm.generic_abelian import rdm as rdm_ab
from ..j1j2 import J1J2, _cast_to_real


class J1J2_ABELIAN(J1J2):
    """J1-J2 energies/observables evaluated from abelian environments.

    Methods take ``(state: IPEPS_ABELIAN, env: ENV_ABELIAN)``.
    """

    def energy_per_site(self, state, env):
        """Average 2x2-plaquette energy (reference models/abelian/
        j1j2.py:149-217 ``energy_2x1_or_2Lx2site_2x2rdms`` semantics —
        all J1/J2 terms aggregated per plaquette)."""
        assert self.lmbd == 0 and self.j3 == 0
        e = 0.0
        for coord in state.sites:
            rho = rdm_ab.rdm2x2(coord, state, env)
            e = e + jnp.einsum("ijklabcd,ijklabcd", rho, self.get_hp(coord))
        return _cast_to_real(e / len(state.sites))

    def eval_obs(self, state, env):
        """Per-site magnetizations + NN bond <S.S> (reference
        models/abelian/j1j2.py:219-286)."""
        obs = {}
        for coord in state.sites:
            rho = rdm_ab.rdm1x1(coord, state, env)
            for label, op in self.obs_ops.items():
                obs[f"{label}{coord}"] = complex(jnp.trace(rho @ op))
            obs[f"m{coord}"] = sqrt(
                abs(obs[f"sz{coord}"] ** 2 + obs[f"sp{coord}"] * obs[f"sm{coord}"])
            )
        for coord in state.sites:
            rho_h = rdm_ab.rdm2x1(coord, state, env)
            rho_v = rdm_ab.rdm1x2(coord, state, env)
            obs[f"SS2x1{coord}"] = complex(
                jnp.einsum("ijab,ijab", rho_h, self.SS_delta_zz)
            ).real
            obs[f"SS1x2{coord}"] = complex(
                jnp.einsum("ijab,ijab", rho_v, self.SS_delta_zz)
            ).real
        labels = (
            [f"m{c}" for c in state.sites]
            + [f"{l}{c}" for c in state.sites for l in self.obs_ops]
            + [f"SS2x1{c}" for c in state.sites]
            + [f"SS1x2{c}" for c in state.sites]
        )
        return [obs[l] for l in labels], labels
