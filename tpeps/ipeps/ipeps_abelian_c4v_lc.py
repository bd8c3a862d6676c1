"""U(1)-structured C4v linear-combination ansatz (counterpart of
reference ipeps/ipeps_abelian_c4v_lc.py:19-446 ``IPEPS_ABELIAN_C4V_LC``).

The on-site tensor is a linear combination ``a = sum_i c_i T_i`` of
DENSE C4v-A1 elementary tensors carrying a U(1) charge pattern: a list
of charges for the physical and auxiliary index VALUES
(``abelian_sym_data["abelian_charges"]``, length d + D) plus the total
tensor charge.  Each elementary tensor is converted ONCE to a static
block-sparse :class:`AbelianTensor` (charge-sorting the index values
into sectors, reference :80-144 ``build_onsite_tensors``); the
coefficient map ``c -> sum_i c_i T_i^blocks`` is then a traceable
blockwise weighted sum, so gradients flow from the frozen-structure
abelian CTM straight into the coefficients.

Convention: the built sites carry the uniform C4v signature
(1,1,1,1,1) (reference IPEPS_ABELIAN_C4V._REF_S_DIRS) — the native
convention of the C4v abelian engine (tpeps/ctm/c4v_abelian/env.py).
"""

from __future__ import annotations

import json
from collections import OrderedDict

import numpy as np

from ..sym.tensor import AbelianTensor, leg


def _sorted_leg(charges):
    """(permutation, leg) sorting index values into charge sectors."""
    order = sorted(range(len(charges)), key=lambda i: charges[i])
    dims = OrderedDict()
    for i in order:
        dims[charges[i]] = dims.get(charges[i], 0) + 1
    return order, leg(dict(dims))


def elem_to_abelian(T, charges, total_charge, sym="U1", phys_dim=2):
    """One dense elementary tensor ``T[s,u,l,d,r]`` -> block-sparse
    AbelianTensor under the charge pattern (generic signature).

    ``charges`` = d physical charges followed by D auxiliary charges.
    Every nonzero of ``T`` must satisfy the U(1) selection rule with
    ``total_charge`` (guaranteed by the generating filter); asserted.
    """
    c_p, c_a = list(charges[:phys_dim]), list(charges[phys_dim:])
    p_ord, p_leg = _sorted_leg(c_p)
    a_ord, a_leg = _sorted_leg(c_a)
    Td = np.asarray(T)[np.ix_(p_ord, a_ord, a_ord, a_ord, a_ord)]
    # file/C4v signature (1,1,1,1,1): sum of charges = n
    t = AbelianTensor.from_dense(
        Td, sym, (1, 1, 1, 1, 1), (p_leg,) + (a_leg,) * 4, n=total_charge)
    lost = float(np.linalg.norm(Td) ** 2) - float(t.norm()) ** 2
    assert abs(lost) < 1e-12, \
        f"elementary tensor violates the U(1) selection rule (lost {lost})"
    return t.to_backend("np")


class IPEPS_ABELIAN_C4V_LC:
    """1-site C4v LC state over a fixed U(1)-structured basis."""

    def __init__(self, sym, elem_tensors, coeffs, abelian_sym_data,
                 elem_abelian=None):
        """:param elem_tensors: list of ``(meta, dense_T)``
        :param coeffs: coefficient vector (array-like, one per tensor)
        :param abelian_sym_data: ``{"abelian_charges": [...],
            "total_abelian_charge": n}``
        :param elem_abelian: optional precomputed block-sparse basis
        """
        self.sym = sym
        self.elem_tensors = list(elem_tensors)
        self.coeffs = coeffs
        self.abelian_sym_data = dict(abelian_sym_data)
        d = int(self.elem_tensors[0][1].shape[0])
        if elem_abelian is None:
            elem_abelian = [
                elem_to_abelian(T, self.abelian_sym_data["abelian_charges"],
                                self.abelian_sym_data["total_abelian_charge"],
                                sym=sym, phys_dim=d)
                for _, T in self.elem_tensors
            ]
        self.elem_abelian = elem_abelian
        self.lX = self.lY = 1
        self.vertexToSite = lambda coord: (0, 0)
        self.sites = OrderedDict({(0, 0): self.build_onsite(coeffs)})

    def build_onsite(self, coeffs):
        """Traceable ``sum_i c_i T_i^blocks`` (reference :65-144)."""
        out = None
        for i, t in enumerate(self.elem_abelian):
            term = t * coeffs[i]
            out = term if out is None else out + term
        return out

    def site(self, coord=(0, 0)):
        return self.sites[(0, 0)]

    def set_coeffs(self, coeffs):
        return IPEPS_ABELIAN_C4V_LC(self.sym, self.elem_tensors, coeffs,
                                    self.abelian_sym_data,
                                    elem_abelian=self.elem_abelian)

    def write_to_file(self, outputfile, tol=1.0e-14):
        write_ipeps_c4v_lc(self, outputfile, tol=tol)


def read_ipeps_c4v_lc(jsonfile, sym="U1"):
    """Read the reference's abelian C4v LC format (reference
    ipeps_abelian_c4v_lc.py:330-415; e.g.
    test-input/abelian/c4v/BFGS100LS_U1B_D3-*_state.json: dense
    ``su2_tensors``/``elem_tensors`` records + ``coeffs`` +
    ``abelian_charges``/``total_abelian_charge``)."""
    import jax.numpy as jnp

    from .ipeps_lc import from_json_str

    with open(jsonfile) as f:
        raw = json.load(f)
    lc = from_json_str(json.dumps(raw))
    elem = [(m, t) for m, t in lc.elem_tensors]
    coeffs = jnp.asarray(np.asarray(lc.coeffs[(0, 0)]))
    sym_data = {"abelian_charges": raw["abelian_charges"],
                "total_abelian_charge": raw["total_abelian_charge"]}
    return IPEPS_ABELIAN_C4V_LC(sym, elem, coeffs, sym_data)


def write_ipeps_c4v_lc(state, outputfile, tol=1.0e-14):
    """(reference ipeps_abelian_c4v_lc.py:417-446): the dense LC record
    plus the abelian charge pattern."""
    from .ipeps_lc import IPEPS_LC_1SITE_PG

    lc = IPEPS_LC_1SITE_PG(state.elem_tensors, {(0, 0): state.coeffs})
    lc.write_to_file(outputfile, tol=tol)
    with open(outputfile) as f:
        raw = json.load(f)
    raw["abelian_charges"] = list(state.abelian_sym_data["abelian_charges"])
    raw["total_abelian_charge"] = state.abelian_sym_data["total_abelian_charge"]
    with open(outputfile, "w") as f:
        json.dump(raw, f, indent=4, separators=(",", ": "))
