"""Linear-combination iPEPS ansaetze.

Counterpart of reference ipeps/ipeps_lc.py:10-522: the on-site tensor is
a linear combination of fixed elementary tensors (representatives of
C4v point-group irreps, typically U(1)- or SU(2)-classified) with a
real variational coefficient vector:

.. math::
    a = \\sum_i c_i e_{A_1;i} + i \\sum_j c_j e_{A_2;j}

The coefficients are the only variational parameters — the natural
ansatz for symmetric-state optimization (reference README Ex. 3) and
for vmap-batched finite-difference gradients (coeff vectors batch
trivially).
"""

from __future__ import annotations

import json
from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

from .ipeps import IPEPS


class IPEPS_LC_1SITE_PG(IPEPS):
    """Single-site LC ansatz over C4v irrep representatives
    (reference ipeps_lc.py:70-256)."""

    def __init__(self, elem_tensors, coeffs, vertexToSite=None, lX=1, lY=1):
        self.elem_tensors = list(elem_tensors)
        self.coeffs = OrderedDict(coeffs)
        self.pg_irreps = set(m["meta"]["pg"] for m, _ in self.elem_tensors)
        sites = self.build_onsite_tensors()
        super().__init__(sites, vertexToSite=vertexToSite, lX=lX, lY=lY)

    def _stacked_basis(self):
        """Stack the elementary tensors, A_2 representatives entering
        with a factor i (reference ipeps_lc.py:184-199)."""
        if self.pg_irreps == {"A_1"}:
            return jnp.stack([t for _, t in self.elem_tensors])
        if self.pg_irreps == {"A_1", "A_2"}:
            a1 = [t for m, t in self.elem_tensors if m["meta"]["pg"] == "A_1"]
            a2 = [1.0j * t for m, t in self.elem_tensors if m["meta"]["pg"] == "A_2"]
            return jnp.stack(a1 + a2)
        raise NotImplementedError(f"unexpected point group irreps {self.pg_irreps}")

    def build_onsite_tensors(self):
        ts = self._stacked_basis()
        sites = {}
        for coord, c in self.coeffs.items():
            sites[coord] = jnp.einsum("i,ipuldr->puldr", c.astype(ts.dtype), ts)
        return sites

    # ---------------------------------------------------------- parameters
    def get_parameters(self):
        """Variational parameters = coefficient vectors (pytree)."""
        return dict(self.coeffs)

    def set_parameters(self, params):
        return IPEPS_LC_1SITE_PG(
            self.elem_tensors,
            OrderedDict((c, params[c]) for c in self.coeffs),
            vertexToSite=self.vertexToSite, lX=self.lX, lY=self.lY,
        )

    def get_checkpoint(self):
        return {"coeffs": {c: np.asarray(v) for c, v in self.coeffs.items()},
                "elem_tensors": [(m, np.asarray(t)) for m, t in self.elem_tensors]}

    def add_noise(self, noise, key=None):
        """Noise on the coefficient vector only (reference ipeps_lc.py:207-221)."""
        if noise == 0:
            return self
        rng = np.random.RandomState(0 if key is None else key)
        coeffs = OrderedDict()
        for c, v in self.coeffs.items():
            tmp = np.asarray(v) + noise * (rng.rand(v.shape[0]) - 0.5)
            coeffs[c] = jnp.asarray(tmp / np.abs(tmp).max())
        self.coeffs = coeffs
        self.sites = self.build_onsite_tensors()
        return self

    def get_aux_bond_dims(self):
        return [max(t.shape[1:]) for _, t in self.elem_tensors]

    def write_to_file(self, outputfile, tol=1.0e-14, normalize=False):
        write_ipeps_lc_1site_pg(self, outputfile, tol=tol, normalize=normalize)


def from_json_str(json_str, aux_seq=(0, 1, 2, 3)):
    """Build IPEPS_LC_1SITE_PG from the reference JSON format
    (reference ipeps_lc.py:295-421): ``sym_tensors``/``elem_tensors``
    list with sparse entries + per-site coefficient vectors."""
    raw = json.loads(json_str)
    ten_key = "sym_tensors"
    for k in ("elem_tensors", "su2_tensors"):
        if k in raw:
            ten_key = k
    elem_tensors = []
    for symt in raw[ten_key]:
        cplx = symt.get("dtype") == "complex128"
        dims = [symt["physDim"]] + [symt["auxDim"]] * 4
        t = np.zeros(dims, dtype=complex if cplx else float)
        for elem in symt["entries"]:
            tok = elem.split(" ")
            inds = tuple(int(i) for i in tok[:5])
            t[inds] = (float(tok[5]) + 1j * float(tok[6])) if cplx else float(tok[5])
        elem_tensors.append(({"meta": symt["meta"]}, jnp.asarray(t)))

    coeffs = OrderedDict()
    for ts in raw["map"]:
        coord = (ts["x"], ts["y"])
        t = None
        for s in raw["coeffs"]:
            if s["siteId"] == ts["siteId"]:
                t = s
        if t is None:
            raise KeyError(f'coeffs with siteId {ts["siteId"]} not found')
        cplx = t.get("dtype") == "complex128"
        X = np.zeros(t["numEntries"], dtype=complex if cplx else float)
        for entry in t["entries"]:
            tok = entry.split()
            X[int(tok[0])] = (float(tok[1]) + 1j * float(tok[2])) if cplx else float(tok[1])
        coeffs[coord] = jnp.asarray(X)
    return IPEPS_LC_1SITE_PG(elem_tensors, coeffs)


def read_ipeps_lc_1site_pg(jsonfile, aux_seq=(0, 1, 2, 3)):
    """(reference ipeps_lc.py:258-293)."""
    with open(jsonfile) as j:
        return from_json_str(j.read(), aux_seq=aux_seq)


def write_ipeps_lc_1site_pg(state, outputfile, tol=1.0e-14, normalize=False):
    """(reference ipeps_lc.py:423-506)."""
    json_state = {"lX": state.lX, "lY": state.lY,
                  "elem_tensors": [], "coeffs": []}
    for meta, t in state.elem_tensors:
        tn = np.asarray(t)
        entries = []
        it = np.argwhere(np.abs(tn) > tol)
        for inds in it:
            v = tn[tuple(inds)]
            entries.append(" ".join(str(i) for i in inds)
                           + f" {np.real(v):.14g} {np.imag(v):.14g}")
        json_state["elem_tensors"].append({
            "meta": meta["meta"], "physDim": tn.shape[0], "auxDim": tn.shape[1],
            "numEntries": len(entries), "dtype": str(tn.dtype), "entries": entries,
        })
    site_ids, site_map = [], []
    for nid, (coord, c) in enumerate(state.coeffs.items()):
        cn = np.asarray(c)
        if normalize:
            cn = cn / np.abs(cn).max()
        site_ids.append(f"A{nid}")
        site_map.append({"siteId": site_ids[-1], "x": coord[0], "y": coord[1]})
        entries = [f"{i} {np.real(v):.14g} {np.imag(v):.14g}" for i, v in enumerate(cn)]
        json_state["coeffs"].append({
            "siteId": site_ids[-1], "numEntries": len(cn),
            "dtype": str(cn.dtype), "entries": entries,
        })
    json_state["siteIds"] = site_ids
    json_state["map"] = site_map
    with open(outputfile, "w") as f:
        json.dump(json_state, f, indent=4, separators=(",", ": "))
