"""Triangular-lattice 1-site ansatz from two trivalent tensors
(counterpart of reference ipeps/ipeps_trgl_pg.py:9-473
``IPEPS_TRGL_1S_TTPHYS_PG``).

The on-site tensor splits into an auxiliary trivalent tensor
``t_aux[l, d, x]`` and a physical trivalent tensor ``t_phys[x, u, r, p]``
joined through the extra index x::

    a[p, u, l, d, r] = sum_x t_aux[l, d, x] t_phys[x, u, r, p]

Point-group symmetrization assigns irreps of the triangular lattice's
C3v-compatible subgroup to the elementary tensors: 'A_1' symmetrizes a
trivalent tensor under the exchange of its two lattice legs, 'A_2'
antisymmetrizes.
"""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp

from .ipeps import IPEPS

PG_A1 = {"t_aux": "A_1", "t_phys": "A_1"}


def _pg_symmetrize(pgs, elem):
    out = OrderedDict(elem)
    for name, irrep in (pgs or {}).items():
        t = out[name]
        if name == "t_aux":  # legs (l, d, x): exchange l <-> d
            perm = (1, 0, 2)
        else:  # t_phys (x, u, r, p): exchange u <-> r
            perm = (0, 2, 1, 3)
        if irrep == "A_1":
            out[name] = 0.5 * (t + t.transpose(perm))
        elif irrep == "A_2":
            out[name] = 0.5 * (t - t.transpose(perm))
        else:
            raise ValueError(f"unsupported irrep {irrep}")
    return out


class IPEPS_TRGL_1S_TTPHYS_PG(IPEPS):
    """1-site triangular ansatz with split aux/phys trivalent tensors."""

    def __init__(self, t_aux, t_phys, pgs=None, pg_symmetrize=False):
        self.elem_tensors = OrderedDict({"t_aux": t_aux, "t_phys": t_phys})
        self.pgs = dict(pgs) if pgs else {}
        if pg_symmetrize:
            self.elem_tensors = _pg_symmetrize(self.pgs, self.elem_tensors)
        super().__init__(self.build_onsite_tensors(), lX=1, lY=1)

    def build_onsite_tensors(self):
        a = jnp.einsum("ldx,xurp->puldr",
                       self.elem_tensors["t_aux"], self.elem_tensors["t_phys"])
        return {(0, 0): a}

    def get_parameters(self):
        return {"t_aux": self.elem_tensors["t_aux"],
                "t_phys": self.elem_tensors["t_phys"]}

    def set_parameters(self, params):
        return IPEPS_TRGL_1S_TTPHYS_PG(
            params["t_aux"], params["t_phys"], pgs=self.pgs,
            pg_symmetrize=bool(self.pgs),
        )
