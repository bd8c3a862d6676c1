"""Kagome S=1 model (counterpart of reference models/spin1_kagome.py:20-75).

Same Hamiltonian structure as the spin-1/2 kagome model with phys_dim=3:

.. math::
    H = J_1 \\sum_{<ij>} S_i.S_j + J_{1sq} (S_i.S_j)^2
      - J_{trip} \\sum_t (S_1 \\times S_2).S_3
      + J_{perm} \\sum_t P_t + J^*_{perm} \\sum_t P_t^{-1}
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ctm.generic import rdm as rdm_gen
from .spin_half_kagome import S_HALF_KAGOME


def fmap(n1, n2, n3, pd=3):
    """Fused index of three physical DoF (reference SU3_AKLT.py:14)."""
    return n3 + pd * n2 + pd * pd * n1


class S1_KAGOME(S_HALF_KAGOME):
    """S=1 kagome (reference spin1_kagome.py:20)."""

    def __init__(self, j1=1.0, JD=0.0, j1sq=0.0, j2=0.0, j2sq=0.0, jtrip=0.0,
                 jperm=0 + 0j, h=0.0, dtype=jnp.float64):
        super().__init__(j1=j1, JD=JD, j1sq=j1sq, j2=j2, j2sq=j2sq,
                         jtrip=jtrip, jperm=jperm, h=h, phys_dim=3, dtype=dtype)

    def P_bonds_nn(self, state, env):
        """Permutation (SWAP) expectation on the three intra-triangle
        bonds via 1x1 RDM of the fused site
        (reference spin1_kagome.py:52-76)."""
        pd = self.phys_dim
        pd3 = pd**3
        coord = (0, 0)
        rho = rdm_gen.rdm1x1(coord, state.sites, state.vertexToSite, env.C, env.T)
        norm = jnp.trace(rho)

        def bond_op(permuter):
            op = np.zeros((pd3, pd3))
            for i in range(pd):
                for j in range(pd):
                    for k in range(pd):
                        op[fmap(i, j, k, pd), fmap(*permuter(i, j, k), pd)] = 1.0
            return jnp.asarray(op, dtype=rho.dtype)

        vP_23 = jnp.trace(rho @ bond_op(lambda i, j, k: (i, k, j))) / norm
        vP_13 = jnp.trace(rho @ bond_op(lambda i, j, k: (k, j, i))) / norm
        vP_12 = jnp.trace(rho @ bond_op(lambda i, j, k: (j, i, k))) / norm
        return vP_23.real, vP_13.real, vP_12.real
