"""Linear-combination ansatz over *two* elementary-tensor families:
SU(2)-invariant site tensors + bond tensors
(counterpart of reference ipeps/ipeps_lc_bp.py:10-120 ``IPEPS_LC_BP``,
used by examples/su2_c4v/*_bp.py).

State = bipartite cell [[A, B],[B, A]] where ``A = sum_i c^site_i T_i``
and ``B`` is ``A`` dressed with the variational bond operator
``b = sum_j c^bond_j g_j`` on all four auxiliary legs — placing the
full bond matrix on one sublattice is gauge-equivalent to a symmetric
sqrt split across each bond.  Elementary tensors come from
:mod:`tpeps.su2sym.gen` (``import_sym_tensors`` / ``import_sym_bonds``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .ipeps import IPEPS


class IPEPS_LC_BP(IPEPS):
    """Site+bond linear-combination bipartite iPEPS."""

    def __init__(self, elem_tensors, coeffs, vertexToSite=None):
        """:param elem_tensors: ``{"site": [(meta, T)...], "bond": [(meta, g)...]}``
        :param coeffs: ``{"site": vec, "bond": vec}`` (jnp arrays)"""
        self.elem_tensors = elem_tensors
        self.coeffs = dict(coeffs)
        sites = self.build_onsite_tensors()
        if vertexToSite is None:
            def vertexToSite(coord):
                return ((coord[0] + coord[1]) % 2, 0)
        super().__init__(sites, vertexToSite=vertexToSite, lX=2, lY=2)

    def _stacked(self, family):
        return jnp.stack([t for _, t in self.elem_tensors[family]])

    def build_onsite_tensors(self):
        """A and the bond-dressed B (reference ipeps_lc_bp.py:102-134)."""
        A = jnp.einsum("i,ipuldr->puldr", self.coeffs["site"], self._stacked("site"))
        b = jnp.einsum("i,ilr->lr", self.coeffs["bond"], self._stacked("bond"))
        B = jnp.einsum("um,ln,dx,ry,pmnxy->puldr", b, b, b, b, A)
        return {(0, 0): A, (1, 0): B}

    def get_parameters(self):
        return {"site": self.coeffs["site"], "bond": self.coeffs["bond"]}

    def set_parameters(self, params):
        return IPEPS_LC_BP(self.elem_tensors, params, vertexToSite=self.vertexToSite)

    def add_noise(self, noise, key=None):
        import jax

        key = key if key is not None else jax.random.PRNGKey(0)
        ks, kb = jax.random.split(key)
        c = {
            "site": self.coeffs["site"]
            + noise * jax.random.uniform(ks, self.coeffs["site"].shape,
                                         minval=-0.5, maxval=0.5),
            "bond": self.coeffs["bond"]
            + noise * jax.random.uniform(kb, self.coeffs["bond"].shape,
                                         minval=-0.5, maxval=0.5),
        }
        return self.set_parameters(c)
