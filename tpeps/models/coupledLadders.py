"""Coupled two-leg spin-1/2 ladders (counterpart of reference
models/coupledLadders.py:17-556).

H = sum_(rungs+legs) S.S + alpha * sum_(inter-ladder) S.S
    - sum_i (-1)^i Bz Sz_i  (staggered field)

Ladders run horizontally: all horizontal bonds are strong; vertical
bonds alternate strong (y even) / alpha-weak (y odd).
"""

from __future__ import annotations

from math import sqrt

import jax.numpy as jnp

from ..ctm.generic import rdm as rdm_gen
from ..groups import su2


def _cast_to_real(t):
    return t.real if jnp.iscomplexobj(t) else t


class StaggeredLocalField:
    """(-1)^(x+y) B (reference coupledLadders.py:17-25)."""

    def __init__(self, B):
        self.B = B

    def __call__(self, coord):
        x, y = coord
        return self.B * (-1) ** ((x + y) % 2)


class COUPLEDLADDERS:
    def __init__(self, alpha=0.0, bz_val=0.0, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 2
        self.alpha = alpha
        self.bz = StaggeredLocalField(bz_val)
        s2 = su2.SU2(self.phys_dim, dtype=dtype)
        self.h2 = s2.SS()
        self.h1 = jnp.einsum("ij,ab->iajb", s2.SZ(), s2.I())
        self.obs_ops = {"sz": s2.SZ(), "sp": s2.SP(), "sm": s2.SM()}

    def energy_2x1_1x2(self, state, env):
        """(reference coupledLadders.py:83-147)."""
        sites, site_of = state.sites, state.vertexToSite
        energy = 0.0
        for coord in sites:
            r21 = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            r12 = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            energy = energy + jnp.einsum("ijab,ijab", r21, self.h2)
            scale = 1.0 if coord[1] % 2 == 0 else self.alpha
            energy = energy + scale * jnp.einsum("ijab,ijab", r12, self.h2)
            energy = energy + self.bz(coord) * jnp.einsum("ijab,ijab", r12, self.h1)
        return _cast_to_real(energy / len(sites))

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
            + [f"{l}{c}" for c in sites for l in self.obs_ops]
            + [f"SS2x1{c}" for c in sites]
            + [f"SS1x2{c}" for c in sites]
        )
        return [obs[l] for l in labels], labels


class COUPLEDLADDERS_D2_BIPARTITE:
    """Coupled ladders over the D2-symmetric 1x2 ansatz: AFM pattern
    realized by rotated operators instead of a 2x2 cell
    (reference models/coupledLadders.py:317-431)."""

    def __init__(self, alpha=0.0, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 2
        self.alpha = alpha
        s2 = su2.SU2(self.phys_dim, dtype=dtype)
        self.h2 = s2.SS()
        rot = s2.BP_rot()
        self.h2_rot = jnp.einsum("ki,kjcb,ca->ijab", rot, self.h2, rot)
        self.obs_ops = {"sz": s2.SZ(), "sp": s2.SP(), "sm": s2.SM()}

    def energy_2x1_1x2(self, state, env):
        """(reference coupledLadders.py:370-431): strong rungs on even
        rows, weak (alpha) bonds on odd rows with reversed orientation."""
        sites, site_of = dict(state.sites), state.vertexToSite
        e = 0.0
        for coord in state.sites:
            r21 = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            r12 = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            e = e + jnp.einsum("ijab,ijab", r21, self.h2_rot)
            if coord[1] % 2 == 0:
                e = e + jnp.einsum("ijab,ijab", r12, self.h2_rot)
            else:
                e = e + jnp.einsum("ijab,jiba", r12, self.alpha * self.h2_rot)
        e = e / len(state.sites)
        return _cast_to_real(e)

    def eval_obs(self, state, env):
        """Per-site magnetizations + rotated NN bond <S.S>
        (reference coupledLadders.py:433-516 ``eval_obs`` of the D2
        ansatz: sublattice rotation absorbed into the bond operators)."""
        sites, site_of = state.sites, state.vertexToSite
        obs = {"avg_m": 0.0}
        for coord in sites:
            rho = rdm_gen.rdm1x1(coord, sites, site_of, env.C, env.T)
            norm = jnp.trace(rho)
            for label, op in self.obs_ops.items():
                obs[f"{label}{coord}"] = complex(jnp.trace(rho @ op) / norm)
            obs[f"m{coord}"] = sqrt(
                abs(obs[f"sz{coord}"] ** 2 + obs[f"sp{coord}"] * obs[f"sm{coord}"])
            )
            obs["avg_m"] += obs[f"m{coord}"]
        obs["avg_m"] /= len(sites)
        for coord in sites:
            r21 = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            r12 = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            obs[f"SS2x1{coord}"] = complex(
                jnp.einsum("ijab,ijab", r21, self.h2_rot)).real
            obs[f"SS1x2{coord}"] = complex(
                jnp.einsum("ijab,ijab", r12, self.h2_rot)).real
        labels = (
            ["avg_m"]
            + [f"m{c}" for c in sites]
            + [f"{l}{c}" for c in sites for l in self.obs_ops]
            + [f"SS2x1{c}" for c in sites]
            + [f"SS1x2{c}" for c in sites]
        )
        return [obs[l] for l in labels], labels
