"""Triangular-lattice J1-J2-J4-Jchi models over abelian states.

Counterpart of reference models/abelian/spin_triangular.py:14-618
(``J1J2J4_NOSYM`` / ``J1J2J4_1SITEQ_NOSYM``, which subclass the dense
model and feed it abelian data).  Here the abelian CTM environment is
embedded densely once per evaluation
(:func:`tpeps.ctm.generic_abelian.to_dense.densify`) and the full dense
patch machinery — including the 2x3/3x2 ring-exchange RDMs — runs
unchanged.
"""

from __future__ import annotations

from ...ctm.generic_abelian.to_dense import densify
from ..spin_triangular import J1J2J4, J1J2J4_1SITE, J1J2J4_1SITEQ


class _DenseBridge:
    def energy_per_site(self, state, env, **kwargs):
        dstate, denv = densify(state, env)
        return super().energy_per_site(dstate, denv, **kwargs)

    def eval_obs(self, state, env, **kwargs):
        dstate, denv = densify(state, env)
        return super().eval_obs(dstate, denv, **kwargs)


class J1J2J4_ABELIAN(_DenseBridge, J1J2J4):
    """J1-J2-J4 over abelian (state, env); reference
    models/abelian/spin_triangular.py:14 ``J1J2J4_NOSYM``."""


class J1J2J4_1SITE_ABELIAN(_DenseBridge, J1J2J4_1SITE):
    pass


class J1J2J4_1SITEQ_ABELIAN(_DenseBridge, J1J2J4_1SITEQ):
    """Spiral-q variant; reference models/abelian/spin_triangular.py:269."""
