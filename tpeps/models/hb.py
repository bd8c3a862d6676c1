"""Generic spin-S Heisenberg + biquadratic model.

Counterpart of reference models/hb.py:9-214 (``HB``):
H = sum_<ij> j1 S_i.S_j + k1 (S_i.S_j)^2.
"""

from __future__ import annotations

from math import sqrt

import jax.numpy as jnp

from ..ctm.generic import rdm as rdm_gen
from ..groups import su2


def _cast_to_real(t):
    return t.real if jnp.iscomplexobj(t) else t


class HB:
    def __init__(self, spin_s=2, j1=1.0, k1=0.0, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = spin_s
        self.j1 = j1
        self.k1 = k1
        irrep = su2.SU2(self.phys_dim, dtype=dtype)
        pd = self.phys_dim
        SS = irrep.SS()
        SSm = SS.reshape(pd * pd, pd * pd)
        h2 = self.j1 * SSm + self.k1 * SSm @ SSm
        self.h2 = h2.reshape(pd, pd, pd, pd)
        idp = jnp.eye(pd * pd, dtype=dtype).reshape(pd, pd, pd, pd)
        h2x2 = jnp.einsum("ijab,klcd->ijklabcd", self.h2, idp)
        self.hp_h = h2x2 + h2x2.transpose(2, 3, 0, 1, 6, 7, 4, 5)
        self.hp_v = (
            h2x2.transpose(0, 2, 1, 3, 4, 6, 5, 7)
            + h2x2.transpose(2, 0, 3, 1, 6, 4, 7, 5)
        )
        self.hp = 0.5 * (self.hp_h + self.hp_v)
        self.obs_ops = {"sz": irrep.SZ(), "sp": irrep.SP(), "sm": irrep.SM()}

    def energy_2x1_1x2(self, state, env):
        """(reference hb.py:56-100)."""
        sites, site_of = state.sites, state.vertexToSite
        energy = 0.0
        for coord in sites:
            r21 = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            r12 = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            energy = energy + jnp.einsum("ijab,ijab", r21, self.h2)
            energy = energy + jnp.einsum("ijab,ijab", r12, self.h2)
        return _cast_to_real(energy / len(sites))

    def energy_2x2_4site(self, state, env):
        """(reference hb.py:101-160)."""
        sites, site_of = state.sites, state.vertexToSite
        C, T = env.C, env.T
        e = jnp.einsum("ijklabcd,ijklabcd", rdm_gen.rdm2x2((0, 0), sites, site_of, C, T), self.hp_h)
        e += jnp.einsum("ijklabcd,ijklabcd", rdm_gen.rdm2x2((1, 0), sites, site_of, C, T), self.hp_v)
        e += jnp.einsum("ijklabcd,ijklabcd", rdm_gen.rdm2x2((0, 1), sites, site_of, C, T), self.hp_v)
        e += jnp.einsum("ijklabcd,ijklabcd", rdm_gen.rdm2x2((1, 1), sites, site_of, C, T), self.hp_h)
        return _cast_to_real(e / 4.0)

    def eval_obs(self, state, env):
        sites, site_of = state.sites, state.vertexToSite
        obs = {"avg_m": 0.0}
        for coord in sites:
            rho = rdm_gen.rdm1x1(coord, sites, site_of, env.C, env.T)
            for label, op in self.obs_ops.items():
                obs[f"{label}{coord}"] = complex(jnp.trace(rho @ op))
            obs[f"m{coord}"] = sqrt(
                abs(obs[f"sz{coord}"] ** 2 + obs[f"sp{coord}"] * obs[f"sm{coord}"])
            )
            obs["avg_m"] += obs[f"m{coord}"]
        obs["avg_m"] /= len(sites)
        for coord in sites:
            r21 = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            r12 = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            obs[f"SS2x1{coord}"] = complex(jnp.einsum("ijab,ijab", r21, self.h2)).real
            obs[f"SS1x2{coord}"] = complex(jnp.einsum("ijab,ijab", r12, self.h2)).real
        labels = (
            ["avg_m"]
            + [f"m{c}" for c in sites]
            + [f"SS2x1{c}" for c in sites]
            + [f"SS1x2{c}" for c in sites]
        )
        return [obs[l] for l in labels], labels
