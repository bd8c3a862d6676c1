"""Spin-1/2 BaTiOCu2Po4 frustrated magnet (counterpart of reference
models/baTiOCu2Po4.py:12-281 ``BaTiOCu2Po44``).

8-site (4x2) unit cell of alternating strong/weak plaquettes on the
square lattice: J1/J2 act on the strong plaquettes, Jp11/Jp12/Jp2 on
the weak ones; the energy sums eight plaquette operators evaluated on
``rdm2x2`` patches (reference energy_2x2_8site, baTiOCu2Po4.py:141-198).
"""

from __future__ import annotations

from math import sqrt

import jax.numpy as jnp

from ..ctm.generic import rdm as rdm_gen
from ..groups import su2


def _cast_to_real(t):
    return t.real if jnp.iscomplexobj(t) else t


class BaTiOCu2Po4:
    def __init__(self, j1=1.0, j2=0.0, jp2=0.0, jp11=0.0, jp12=0.0,
                 dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 2
        self.j1, self.j2 = j1, j2
        self.jp2, self.jp11, self.jp12 = jp2, jp11, jp12
        s2 = su2.SU2(2, dtype=dtype)
        self.obs_ops = {"sz": s2.SZ(), "sp": s2.SP(), "sm": s2.SM()}

        SS = s2.SS()
        id2 = jnp.eye(4, dtype=dtype).reshape(2, 2, 2, 2)
        h2x2_SS = jnp.einsum("ijab,klcd->ijklabcd", SS, id2)  # bond s0-s1
        # all four NN bonds of the plaquette (reference get_h)
        h2x2_nn = (
            h2x2_SS
            + h2x2_SS.transpose(2, 3, 0, 1, 6, 7, 4, 5)
            + h2x2_SS.transpose(0, 2, 1, 3, 4, 6, 5, 7)
            + h2x2_SS.transpose(2, 0, 3, 1, 6, 4, 7, 5)
        )
        # the two diagonals
        h2x2_nnn = (
            h2x2_SS.transpose(0, 3, 2, 1, 4, 7, 6, 5)
            + h2x2_SS.transpose(2, 0, 1, 3, 6, 4, 5, 7)
        )
        self.SS, self.SS_nn, self.SS_nnn = SS, h2x2_nn, h2x2_nnn

        plq = {}
        plq[4] = j1 * h2x2_nn + j2 * h2x2_nnn
        plq[6] = j1 * h2x2_nn + j2 * h2x2_nnn
        plq[5] = (jp2 * h2x2_nnn + jp11 * h2x2_SS
                  + jp12 * h2x2_SS.transpose(2, 3, 0, 1, 6, 7, 4, 5))
        plq[7] = (jp2 * h2x2_nnn + jp12 * h2x2_SS
                  + jp11 * h2x2_SS.transpose(2, 3, 0, 1, 6, 7, 4, 5))
        plq[0] = (jp2 * h2x2_nnn
                  + jp11 * h2x2_SS.transpose(0, 2, 1, 3, 4, 6, 5, 7)
                  + jp12 * h2x2_SS.transpose(2, 0, 3, 1, 6, 4, 7, 5))
        plq[2] = (jp2 * h2x2_nnn
                  + jp12 * h2x2_SS.transpose(0, 2, 1, 3, 4, 6, 5, 7)
                  + jp11 * h2x2_SS.transpose(2, 0, 3, 1, 6, 4, 7, 5))
        self.plq = plq

    def energy_2x2_8site(self, state, env):
        """Sum of the six distinct plaquette operators over the 4x2 cell
        (reference baTiOCu2Po4.py:141-198; same rdm2x2 anchor coords)."""
        sites, site_of = state.sites, state.vertexToSite
        C, T = env.C, env.T
        energy = 0.0
        for coord, k in (((0, 0), 4), ((2, 0), 6), ((1, 0), 5), ((3, 0), 7),
                         ((0, -1), 0), ((2, -1), 2)):
            rho = rdm_gen.rdm2x2(coord, sites, site_of, C, T)
            energy = energy + jnp.einsum("ijklabcd,ijklabcd", rho, self.plq[k])
        return _cast_to_real(energy)

    def eval_obs(self, state, env):
        """Average and per-site magnetization + spin components
        (reference baTiOCu2Po4.py:200-262)."""
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
        labels = (
            ["avg_m"]
            + [f"m{c}" for c in sites]
            + [f"{l}{c}" for c in sites for l in self.obs_ops]
        )
        return [obs[l] for l in labels], labels
