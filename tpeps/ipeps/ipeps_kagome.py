"""Kagome lattice mapped onto the square lattice.

Counterpart of reference ipeps/ipeps_kagome.py:10-105: three kagome
degrees of freedom (down-triangle sites A, B, C) are fused into one
square-lattice site with physical dimension d^3.
"""

from __future__ import annotations

from . import ipeps as ipeps_mod


class IPEPS_KAGOME(ipeps_mod.IPEPS):
    def get_physical_dim(self):
        """Dimension of one kagome DoF (cube root of the fused dimension)."""
        d3 = next(iter(self.sites.values())).shape[0]
        d = round(d3 ** (1.0 / 3.0))
        assert d**3 == d3, "physical dimension is not a perfect cube"
        return d


def read_ipeps_kagome(jsonfile, vertexToSite=None, aux_seq=(0, 1, 2, 3)):
    state = ipeps_mod.read_ipeps(jsonfile, vertexToSite=vertexToSite, aux_seq=aux_seq,
                                 cls=IPEPS_KAGOME)
    return state
