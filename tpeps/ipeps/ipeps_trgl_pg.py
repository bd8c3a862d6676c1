"""Triangular-lattice 1-site ansatze built from trivalent tensors
(counterpart of reference ipeps/ipeps_trgl_pg.py:9-473
``IPEPS_TRGL_1S_TTPHYS_PG`` and :237-446 ``IPEPS_TRGL_1S_TBT_PG``).

``IPEPS_TRGL_1S_TTPHYS_PG`` splits the on-site tensor into an auxiliary
trivalent tensor ``t_aux[l, d, x]`` and a physical trivalent tensor
``t_phys[x, u, r, p]`` joined through the extra index x::

    a[p, u, l, d, r] = sum_x t_aux[l, d, x] t_phys[x, u, r, p]

``IPEPS_TRGL_1S_TBT_PG`` uses two copies of one auxiliary trivalent
tensor bridged by a physical bond tensor ``t_phys[x, y, p]``::

    a[p, u, l, d, r] = sum_xy t_aux[l, d, x] t_phys[x, y, p] t_aux[y, u, r]

Point-group symmetrization projects the elementary tensors onto C3v
irreps of the trivalent vertex: 'A_1' = cyclic average over the three
legs followed by reflection-symmetrization (+conj), 'A_2' the
reflection-antisymmetric partner (reference ipeps_trgl_pg.py:123-148);
the TBT bond tensor uses the two-leg 'A'/'B' (anti)symmetrization
(reference :351-386).
"""

from __future__ import annotations

import json
from collections import OrderedDict

import jax.numpy as jnp

from .ipeps import IPEPS

PG_A1 = {"t_aux": "A_1", "t_phys": "A_1"}


def _c3v_project(t, irrep, pd=()):
    """C3v projector on a trivalent tensor with legs (0,1,2) + trailing
    physical legs ``pd`` (reference ipeps_trgl_pg.py:128-145)."""
    extra = tuple(3 + i for i in range(len(pd)))
    cyc = (t + t.transpose((1, 2, 0) + extra) + t.transpose((2, 0, 1) + extra)) / 3.0
    refl = cyc.transpose((0, 2, 1) + extra).conj()
    if irrep == "A_1":
        return 0.5 * (cyc + refl)
    if irrep == "A_2":
        return 0.5 * (cyc - refl)
    raise ValueError(f"unsupported irrep {irrep}")


def _pg_symmetrize(pgs, elem):
    """TTPHYS projector table: both elementary tensors are trivalent
    (t_phys carries the trailing physical leg)."""
    out = OrderedDict(elem)
    for name, irrep in (pgs or {}).items():
        pd = (1,) if name == "t_phys" else ()
        out[name] = _c3v_project(out[name], irrep, pd=pd)
    return out


def _pg_symmetrize_tbt(pgs, elem):
    """TBT projector table: trivalent t_aux + two-leg bond t_phys
    (reference ipeps_trgl_pg.py:351-386)."""
    out = OrderedDict(elem)
    for name, irrep in (pgs or {}).items():
        if name == "t_aux":
            out[name] = _c3v_project(out[name], irrep)
        else:  # t_phys (x, y, p)
            t = out[name]
            refl = t.transpose(1, 0, 2).conj()
            if irrep == "A":
                out[name] = 0.5 * (t + refl)
            elif irrep == "B":
                out[name] = 0.5 * (t - refl)
            else:
                raise ValueError(f"unsupported irrep {irrep}")
    return out


class IPEPS_TRGL_1S_TTPHYS_PG(IPEPS):
    """1-site triangular ansatz with split aux/phys trivalent tensors."""

    PG_A1 = PG_A1

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
        return type(self)(
            params["t_aux"], params["t_phys"], pgs=self.pgs,
            pg_symmetrize=bool(self.pgs),
        )

    def write_to_file(self, outputfile, tol=1.0e-14, normalize=False):
        write_ipeps_trgl_1s_pg(self, outputfile, tol=tol, normalize=normalize)


class IPEPS_TRGL_1S_TBT_PG(IPEPS_TRGL_1S_TTPHYS_PG):
    """1-site triangular ansatz: one trivalent aux tensor used twice,
    bridged by a physical bond tensor (reference ipeps_trgl_pg.py:237)."""

    PG_A1_A = {"t_aux": "A_1", "t_phys": "A"}

    def __init__(self, t_aux, t_phys, pgs=None, pg_symmetrize=False):
        self.elem_tensors = OrderedDict({"t_aux": t_aux, "t_phys": t_phys})
        self.pgs = dict(pgs) if pgs else {}
        if pg_symmetrize:
            self.elem_tensors = _pg_symmetrize_tbt(self.pgs, self.elem_tensors)
        IPEPS.__init__(self, self.build_onsite_tensors(), lX=1, lY=1)

    def build_onsite_tensors(self):
        a = jnp.einsum("ldx,xyp,yur->puldr", self.elem_tensors["t_aux"],
                       self.elem_tensors["t_phys"], self.elem_tensors["t_aux"])
        return {(0, 0): a}


def write_ipeps_trgl_1s_pg(state, outputfile, tol=1.0e-14, normalize=False):
    """JSON with the named elementary tensors + the pg table (reference
    ipeps_trgl_pg.py:150-196 ``write_ipeps_trgl_1s_ttphys_pg`` /
    :432-446 ``write_ipeps_trgl_1s_pg``; legacy tensor records)."""
    from ..io.tensor_io import serialize_bare_tensor_legacy

    json_state = {"lX": state.lX, "lY": state.lY, "elem_tensors": {},
                  "pgs": state.pgs,
                  "ansatz": type(state).__name__}
    for t_id, t in state.elem_tensors.items():
        if normalize:
            t = t / jnp.abs(t).max()
        json_state["elem_tensors"][t_id] = serialize_bare_tensor_legacy(t)
    with open(outputfile, "w") as f:
        json.dump(json_state, f, indent=4, separators=(",", ": "))


def read_ipeps_trgl_1s_pg(jsonfile):
    """(reference ipeps_trgl_pg.py:196-235 / :398-431); the ``ansatz``
    field selects TTPHYS vs TBT."""
    from ..io.tensor_io import read_json_tensor

    with open(jsonfile) as j:
        raw = json.load(j)
    elem = {t_id: jnp.asarray(read_json_tensor(rec))
            for t_id, rec in raw["elem_tensors"].items()}
    cls = (IPEPS_TRGL_1S_TBT_PG
           if raw.get("ansatz") == "IPEPS_TRGL_1S_TBT_PG"
           or elem["t_phys"].ndim == 3 else IPEPS_TRGL_1S_TTPHYS_PG)
    return cls(elem["t_aux"], elem["t_phys"], pgs=raw.get("pgs") or {})
