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

    def write_to_file(self, outputfile, tol=1.0e-14, normalize=False):
        write_ipeps_lc_bp(self, outputfile, tol=tol, normalize=normalize)


def write_ipeps_lc_bp(state, outputfile, tol=1.0e-14, normalize=False):
    """JSON with the two elementary-tensor families and the two
    coefficient vectors (reference ipeps_lc_bp.py:296-370
    ``write_ipeps_lc_bp``; sparse-entry tensor records as in
    :func:`tpeps.ipeps.ipeps_lc.write_ipeps_lc_1site_pg`)."""
    import json

    import numpy as np

    json_state = {"elem_tensors": {"site": [], "bond": []}, "coeffs": {}}
    for family, rank in (("site", 5), ("bond", 2)):
        for meta, t in state.elem_tensors[family]:
            tn = np.asarray(t)
            entries = []
            for inds in np.argwhere(np.abs(tn) > tol):
                v = tn[tuple(inds)]
                entries.append(" ".join(str(i) for i in inds)
                               + f" {np.real(v):.14g} {np.imag(v):.14g}")
            json_state["elem_tensors"][family].append({
                "meta": meta.get("meta", meta), "dims": list(tn.shape),
                "numEntries": len(entries), "dtype": str(tn.dtype),
                "entries": entries,
            })
    for family in ("site", "bond"):
        cn = np.asarray(state.coeffs[family])
        if normalize:
            cn = cn / np.abs(cn).max()
        json_state["coeffs"][family] = {
            "numEntries": len(cn), "dtype": str(cn.dtype),
            "entries": [f"{i} {np.real(v):.14g} {np.imag(v):.14g}"
                        for i, v in enumerate(cn)],
        }
    with open(outputfile, "w") as f:
        json.dump(json_state, f, indent=4, separators=(",", ": "))


def read_ipeps_lc_bp(jsonfile):
    """(reference ipeps_lc_bp.py:174-294 ``read_ipeps_lc_bp``)."""
    import json

    import numpy as np

    with open(jsonfile) as j:
        raw = json.load(j)
    elem_tensors = {"site": [], "bond": []}
    for family in ("site", "bond"):
        for symt in raw["elem_tensors"][family]:
            cplx = "complex" in symt.get("dtype", "float64")
            t = np.zeros(symt["dims"], dtype=complex if cplx else float)
            n_ind = len(symt["dims"])
            for elem in symt["entries"]:
                tok = elem.split(" ")
                inds = tuple(int(i) for i in tok[:n_ind])
                t[inds] = float(tok[n_ind]) + 1j * float(tok[n_ind + 1]) \
                    if cplx else float(tok[n_ind])
            elem_tensors[family].append(({"meta": symt["meta"]}, jnp.asarray(t)))
    coeffs = {}
    for family in ("site", "bond"):
        t = raw["coeffs"][family]
        cplx = "complex" in t.get("dtype", "float64")
        X = np.zeros(t["numEntries"], dtype=complex if cplx else float)
        for entry in t["entries"]:
            tok = entry.split()
            X[int(tok[0])] = (float(tok[1]) + 1j * float(tok[2])) if cplx \
                else float(tok[1])
        coeffs[family] = jnp.asarray(X)
    return IPEPS_LC_BP(elem_tensors, coeffs)
