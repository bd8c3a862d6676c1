"""J-Q model: Heisenberg + 4-site plaquette singlet-projector term.

Counterpart of reference models/jq.py:16-309 (``JQ``):
H = j1 sum_<ij> S_i.S_j - q sum_p (S_i.S_j - 1/4)(S_k.S_l - 1/4) + h.c. plaquette pairs.
"""

from __future__ import annotations

from math import sqrt

import jax.numpy as jnp

from ..ctm.generic import rdm as rdm_gen
from ..groups import su2


def _cast_to_real(t):
    return t.real if jnp.iscomplexobj(t) else t


class JQ:
    def __init__(self, j1=0.0, q=1.0, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 2
        self.j1 = j1
        self.q = q
        s2 = su2.SU2(self.phys_dim, dtype=dtype)
        id2 = jnp.eye(4, dtype=dtype).reshape(2, 2, 2, 2)
        SS = s2.SS()
        SSp = SS - 0.25 * id2
        SSpSSp = jnp.einsum("ijab,klcd->ijklabcd", SSp, SSp)
        SSpSSp = SSpSSp + SSpSSp.transpose(0, 2, 1, 3, 4, 6, 5, 7)
        h2x2_SS = jnp.einsum("ijab,klcd->ijklabcd", SS, id2)
        # (reference jq.py:58-73)
        self.h2 = SS
        self.h4 = SSpSSp
        self.hp_h_q = j1 * (h2x2_SS + h2x2_SS.transpose(2, 3, 0, 1, 6, 7, 4, 5)) - q * SSpSSp
        self.hp_v_q = (
            j1 * (
                h2x2_SS.transpose(0, 2, 1, 3, 4, 6, 5, 7)
                + h2x2_SS.transpose(2, 0, 3, 1, 6, 4, 7, 5)
            )
            - q * SSpSSp
        )
        self.obs_ops = {"sz": s2.SZ(), "sp": s2.SP(), "sm": s2.SM()}

    def energy_2x2_4site(self, state, env):
        """Alternating horizontal/vertical plaquette operators over the
        2x2 cell (reference jq.py:83-140)."""
        sites, site_of = state.sites, state.vertexToSite
        C, T = env.C, env.T
        e = jnp.einsum(
            "ijklabcd,ijklabcd", rdm_gen.rdm2x2((0, 0), sites, site_of, C, T), self.hp_h_q
        )
        e += jnp.einsum(
            "ijklabcd,ijklabcd", rdm_gen.rdm2x2((1, 0), sites, site_of, C, T), self.hp_v_q
        )
        e += jnp.einsum(
            "ijklabcd,ijklabcd", rdm_gen.rdm2x2((0, 1), sites, site_of, C, T), self.hp_v_q
        )
        e += jnp.einsum(
            "ijklabcd,ijklabcd", rdm_gen.rdm2x2((1, 1), sites, site_of, C, T), self.hp_h_q
        )
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
