"""Transverse-field Ising model (+ plaquette term).

Counterpart of reference models/ising.py:13-330 (``ISING``,
``ISING_C4V``): H = -sum_<ij> 4Sz_i Sz_j + q sum_p 16(Sz)^4_p - hx sum_i 2Sx_i.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ctm.c4v import rdm as rdm_c4v
from ..ctm.generic import rdm as rdm_gen
from ..groups import su2


def _cast_to_real(t):
    return t.real if jnp.iscomplexobj(t) else t


class ISING:
    """Generic-cell TFIM (reference models/ising.py:13-155)."""

    def __init__(self, hx=0.0, q=0.0, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 2
        self.hx = hx
        self.q = q
        s2 = su2.SU2(self.phys_dim, dtype=dtype)
        id2 = jnp.eye(4, dtype=dtype).reshape(2, 2, 2, 2)
        SzSz = 4 * jnp.einsum("ij,ab->iajb", s2.SZ(), s2.SZ())
        SzSzIdId = jnp.einsum("ijab,klcd->ijklabcd", SzSz, id2)
        SzSzSzSz = jnp.einsum("ijab,klcd->ijklabcd", SzSz, SzSz)
        Sx = s2.SP() + s2.SM()
        SxIdIdId = jnp.einsum("ia,jb,kc,ld->ijklabcd", Sx, s2.I(), s2.I(), s2.I())
        self.h2 = SzSz
        self.h4 = SzSzSzSz
        self.h1 = Sx
        self.hp = (
            -SzSzIdId
            - SzSzIdId.transpose(0, 2, 1, 3, 4, 6, 5, 7)
            - q * SzSzSzSz
            - hx * SxIdIdId
        )
        self.obs_ops = {"sz": 2 * s2.SZ(), "sp": 2 * s2.SP(), "sm": 2 * s2.SM()}

    def energy_1x1(self, state, env):
        """<hp> from a single 2x2 plaquette (reference ising.py:70-91)."""
        rho = rdm_gen.rdm2x2((0, 0), state.sites, state.vertexToSite, env.C, env.T)
        return _cast_to_real(jnp.einsum("ijklabcd,ijklabcd", rho, self.hp))

    def eval_obs(self, state, env):
        """(reference ising.py:92-125)."""
        sites, site_of = state.sites, state.vertexToSite
        obs = {}
        for coord in sites:
            rho = rdm_gen.rdm1x1(coord, sites, site_of, env.C, env.T)
            for label, op in self.obs_ops.items():
                obs[f"{label}{coord}"] = complex(jnp.trace(rho @ op)).real
            obs[f"sx{coord}"] = 0.5 * (obs[f"sp{coord}"] + obs[f"sm{coord}"])
        for coord in sites:
            r21 = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            r12 = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            r22 = rdm_gen.rdm2x2(coord, sites, site_of, env.C, env.T)
            obs[f"SzSz2x1{coord}"] = complex(jnp.einsum("ijab,ijab", r21, self.h2)).real
            obs[f"SzSz1x2{coord}"] = complex(jnp.einsum("ijab,ijab", r12, self.h2)).real
            obs[f"SzSzSzSz{coord}"] = complex(
                jnp.einsum("ijklabcd,ijklabcd", r22, self.h4)
            ).real
        labels = [f"{l}{c}" for c in sites for l in ("sz", "sx")]
        labels += [f"SzSz2x1{c}" for c in sites]
        labels += [f"SzSz1x2{c}" for c in sites]
        labels += [f"SzSzSzSz{c}" for c in sites]
        return [obs[l] for l in labels], labels


class ISING_C4V:
    """One-site C4v TFIM (reference models/ising.py:156-330)."""

    def __init__(self, hx=0.0, q=0.0, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 2
        self.hx = hx
        self.q = q
        s2 = su2.SU2(self.phys_dim, dtype=dtype)
        id2 = jnp.eye(4, dtype=dtype).reshape(2, 2, 2, 2)
        SzSz = 4 * jnp.einsum("ij,ab->iajb", s2.SZ(), s2.SZ())
        SzSzIdId = jnp.einsum("ijab,klcd->ijklabcd", SzSz, id2)
        SzSzSzSz = jnp.einsum("ijab,klcd->ijklabcd", SzSz, SzSz)
        Sx = s2.SP() + s2.SM()
        SxId = jnp.einsum("ij,ab->iajb", Sx, s2.I())
        SxIdIdId = jnp.einsum("ia,jb,kc,ld->ijklabcd", Sx, s2.I(), s2.I(), s2.I())
        self.szsz = SzSz
        self.szszszsz = SzSzSzSz
        self.sx = Sx
        self.h2 = -SzSz - 0.5 * hx * SxId
        self.hp = (
            -SzSzIdId
            - SzSzIdId.transpose(0, 2, 1, 3, 4, 6, 5, 7)
            - q * SzSzSzSz
            - hx * SxIdIdId
        )
        self.obs_ops = {"sz": 2 * s2.SZ(), "sp": 2 * s2.SP(), "sm": 2 * s2.SM()}

    def energy_1x1_nn(self, a, env):
        """NN-only energy from rdm2x1 (reference ising.py:185-210)."""
        assert self.q == 0, "plaquette term requires energy_1x1_plaqette"
        rho = rdm_c4v.rdm2x1_sl(a, env)
        eSx = jnp.einsum("ijaj,ia", rho, self.sx)
        eSzSz = jnp.einsum("ijab,ijab", rho, self.szsz)
        return _cast_to_real(-2 * eSzSz - self.hx * eSx)

    def energy_1x1_plaqette(self, a, env):
        """Full plaquette energy from rdm2x2 (reference ising.py:211-233)."""
        rho = rdm_c4v.rdm2x2(a, env)
        return _cast_to_real(jnp.einsum("ijklabcd,ijklabcd", rho, self.hp))

    def eval_obs(self, a, env):
        obs = {}
        rho = rdm_c4v.rdm1x1(a, env)
        for label, op in self.obs_ops.items():
            obs[label] = complex(jnp.trace(rho @ op)).real
        obs["sx"] = 0.5 * (obs["sp"] + obs["sm"])
        rho22 = rdm_c4v.rdm2x2(a, env)
        obs["SzSzSzSz"] = complex(
            jnp.einsum("ijklabcd,ijklabcd", rho22, self.szszszsz)
        ).real
        labels = ["sz", "sx", "SzSzSzSz"]
        return [obs[l] for l in labels], labels
