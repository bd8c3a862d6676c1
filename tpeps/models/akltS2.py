"""S=2 AKLT model on the square lattice.

Counterpart of reference models/akltS2.py:14-350: the Hamiltonian is the
projector onto total spin S=4 of a bond, expressed as a quartic
polynomial in S.S; the AKLT state is its exact zero-energy ground state.
"""

from __future__ import annotations

from math import sqrt

import jax.numpy as jnp

from ..ctm.c4v import rdm as rdm_c4v
from ..ctm.generic import rdm as rdm_gen
from ..groups import su2


def _cast_to_real(t):
    return t.real if jnp.iscomplexobj(t) else t


def _aklt_h(dtype):
    pd = 5
    s5 = su2.SU2(pd, dtype=dtype)
    SS = s5.SS()
    SSm = SS.reshape(pd * pd, pd * pd)
    h = (1.0 / 14) * (
        SSm
        + (7.0 / 10.0) * SSm @ SSm
        + (7.0 / 45.0) * SSm @ SSm @ SSm
        + (1.0 / 90.0) * SSm @ SSm @ SSm @ SSm
    )
    return h.reshape(pd, pd, pd, pd), SS


class AKLTS2:
    """Generic-cell AKLT (reference akltS2.py:14-169)."""

    def __init__(self, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 5
        self.h, self.SS = _aklt_h(dtype)
        s5 = su2.SU2(self.phys_dim, dtype=dtype)
        self.obs_ops = {"sz": s5.SZ(), "sp": s5.SP(), "sm": s5.SM()}

    def energy_2x1_1x2(self, state, env):
        """Sum of <h> over horizontal+vertical bonds / n_sites
        (reference akltS2.py:66-119)."""
        sites, site_of = state.sites, state.vertexToSite
        energy = 0.0
        for coord in sites:
            r21 = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            r12 = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            energy = energy + jnp.einsum("ijab,ijab", r21, self.h)
            energy = energy + jnp.einsum("ijab,ijab", r12, self.h)
        return _cast_to_real(energy / len(sites))

    def eval_obs(self, state, env):
        """(reference akltS2.py:121-169)."""
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
            obs[f"SS2x1{coord}"] = complex(jnp.einsum("ijab,ijab", r21, self.SS)).real
            obs[f"SS1x2{coord}"] = complex(jnp.einsum("ijab,ijab", r12, self.SS)).real
        labels = (
            ["avg_m"]
            + [f"m{c}" for c in sites]
            + [f"{l}{c}" for c in sites for l in self.obs_ops]
            + [f"SS2x1{c}" for c in sites]
            + [f"SS1x2{c}" for c in sites]
        )
        return [obs[l] for l in labels], labels


class AKLTS2_C4V_BIPARTITE:
    """One-site C4v AKLT with bipartite rotation
    (reference akltS2.py:170-350)."""

    def __init__(self, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 5
        h, SS = _aklt_h(dtype)
        s5 = su2.SU2(self.phys_dim, dtype=dtype)
        rot = s5.BP_rot()
        # rotate physical space of the second site (reference akltS2.py:200-208)
        self.h2_rot = jnp.einsum("jl,ilak,kb->ijab", rot, h, rot)
        self.SS = SS
        self.SS_rot = jnp.einsum("jl,ilak,kb->ijab", rot, SS, rot)
        self.obs_ops = {"sz": s5.SZ(), "sp": s5.SP(), "sm": s5.SM()}

    def energy_1x1(self, a, env):
        """Single bond <h_rot> (reference akltS2.py:218-247)."""
        rho = rdm_c4v.rdm2x1_sl(a, env)
        return _cast_to_real(jnp.einsum("ijab,ijab", rho, self.h2_rot))

    def eval_obs(self, a, env):
        obs = {}
        rho21 = rdm_c4v.rdm2x1_sl(a, env)
        obs["SS2x1"] = complex(jnp.einsum("ijab,ijab", rho21, self.SS_rot)).real
        rho1 = jnp.einsum("ijaj->ia", rho21)
        rho1 = rho1 / jnp.trace(rho1)
        for label, op in self.obs_ops.items():
            obs[label] = complex(jnp.trace(rho1 @ op))
        obs["m"] = sqrt(abs(obs["sz"] ** 2 + obs["sp"] * obs["sm"]))
        labels = ["m", "sz", "sp", "sm", "SS2x1"]
        return [obs[l] for l in labels], labels
