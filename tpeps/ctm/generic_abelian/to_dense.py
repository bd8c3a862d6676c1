"""Dense bridge for abelian environments.

``densify(state, env)`` embeds an abelian iPEPS + its converged
ENV_ABELIAN into the dense generic formats (charge-sorted basis on
every leg, (ket, bra) pairs fused ket-major) — after which EVERY dense
RDM / patch / correlator / model routine applies unchanged.  This is
the abelian stack's evaluation bridge: the block-sparse CTM does the
scaling work (its chi counts kept states, not padded dense dims), and
observables reuse the full dense zoo (reference keeps per-model abelian
mirrors instead, models/abelian/*).
"""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp

from ...ipeps.ipeps import IPEPS
from ..generic.env import ENV


def densify(state, env):
    """:return: ``(IPEPS, ENV)`` dense equivalents of an abelian state
    and its environment (same vertexToSite)."""
    sites = OrderedDict((c, t.to_dense()) for c, t in state.sites.items())
    dstate = IPEPS(sites, vertexToSite=state.vertexToSite, lX=state.lX, lY=state.lY)

    denv = ENV(env.chi)
    for k, c in env.C.items():
        denv.C[k] = c.to_dense()
    for (coord, dvec), t in env.T.items():
        td = t.to_dense()
        if dvec == (0, -1):     # (chi_l, Dk, Db, chi_r) -> (chi_l, D2, chi_r)
            td = td.reshape(td.shape[0], -1, td.shape[3])
        elif dvec == (-1, 0):   # (chi_u, chi_d, Dk, Db) -> (chi_u, chi_d, D2)
            td = td.reshape(td.shape[0], td.shape[1], -1)
        elif dvec == (0, 1):    # (Dk, Db, chi_l, chi_r) -> (D2, chi_l, chi_r)
            td = td.reshape(-1, td.shape[2], td.shape[3])
        elif dvec == (1, 0):    # (chi_u, Dk, Db, chi_d) -> (chi_u, D2, chi_d)
            td = td.reshape(td.shape[0], -1, td.shape[3])
        denv.T[(coord, dvec)] = td
    return dstate, denv
