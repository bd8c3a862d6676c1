"""iPESS ansatz for the kagome lattice.

Counterpart of reference ipeps/ipess_kagome.py:1-321: the unit cell is
described by five elementary tensors per site — two trivalent simplex
tensors ``T_u`` (up triangle), ``T_d`` (down triangle) and three bond
tensors ``B_a, B_b, B_c`` carrying the physical DoFs.  The square
lattice on-site tensor is assembled by
``A[(s_a s_b s_c), u, l, d, r] = T_u B_c T_d B_b B_a``
(reference ipess_kagome.py:62-84).
"""

from __future__ import annotations

import json
from collections import OrderedDict

import jax.numpy as jnp

from ..io.tensor_io import read_json_tensor
from .ipeps_kagome import IPEPS_KAGOME

IPESS_KEYS = ("T_u", "T_d", "B_a", "B_b", "B_c")


def build_onsite_tensors(ipess_tensors):
    """Assemble square-lattice tensors from elementary iPESS tensors
    (reference ipess_kagome.py:62-84)."""
    sites = {}
    for c, td in ipess_tensors.items():
        A = jnp.einsum(
            "iab,uji,jkl,vkc,wld->uvwabcd",
            td["T_u"], td["B_c"], td["T_d"], td["B_b"], td["B_a"],
        )
        total_phys = td["B_a"].shape[0] * td["B_b"].shape[0] * td["B_c"].shape[0]
        A = A.reshape(
            total_phys,
            td["T_u"].shape[1], td["T_u"].shape[2],
            td["B_b"].shape[2], td["B_a"].shape[2],
        )
        sites[c] = A / jnp.abs(A).max()
    return sites


class IPESS_KAGOME_GENERIC(IPEPS_KAGOME):
    """Generic 5-tensor iPESS (reference ipess_kagome.py:9-125)."""

    def __init__(self, ipess_tensors, vertexToSite=None, pattern=None, lX=None, lY=None):
        if set(ipess_tensors.keys()) == set(IPESS_KEYS):
            ipess_tensors = {(0, 0): ipess_tensors}
        self.ipess_tensors = OrderedDict(ipess_tensors)
        sites = build_onsite_tensors(self.ipess_tensors)
        super().__init__(sites, vertexToSite=vertexToSite, pattern=pattern, lX=lX, lY=lY)

    def get_parameters(self):
        """Variational parameters = the elementary tensors (pytree)."""
        return {c: dict(td) for c, td in self.ipess_tensors.items()}

    def set_parameters(self, params):
        new = IPESS_KAGOME_GENERIC(
            {c: dict(params[c]) for c in self.ipess_tensors},
            lX=self.lX, lY=self.lY,
        )
        new.vertexToSite = self.vertexToSite
        new.sites = build_onsite_tensors(new.ipess_tensors)
        return new

    def get_physical_dim(self):
        first = next(iter(self.ipess_tensors.values()))
        return first["B_a"].shape[0]


def read_ipess_kagome_generic(jsonfile, vertexToSite=None) -> IPESS_KAGOME_GENERIC:
    """Read an iPESS state in the reference JSON format
    (reference ipess_kagome.py:126-235)."""
    with open(jsonfile) as j:
        raw = json.load(j)

    ipess_tensors = OrderedDict()
    if "elem_tensors" in raw:  # legacy naming
        keymap = {"UP_T": "T_u", "DOWN_T": "T_d", "BOND_S1": "B_c",
                  "BOND_S3": "B_a", "BOND_S2": "B_b"}
        td = {keymap[k]: jnp.asarray(read_json_tensor(t)) for k, t in raw["elem_tensors"].items()}
        ipess_tensors[(0, 0)] = td
    elif "ipess_tensors" in raw:
        it = raw["ipess_tensors"]
        if set(it.keys()) == set(IPESS_KEYS):
            ipess_tensors[(0, 0)] = {k: jnp.asarray(read_json_tensor(t)) for k, t in it.items()}
        else:
            for coord_str, ts in it.items():
                c = tuple(int(x) for x in coord_str.strip("()").split(","))
                ipess_tensors[c] = {k: jnp.asarray(read_json_tensor(t)) for k, t in ts.items()}
    else:
        raise ValueError("not an iPESS state file")

    lX = raw.get("lX", 1)
    lY = raw.get("lY", 1)
    return IPESS_KAGOME_GENERIC(ipess_tensors, vertexToSite=vertexToSite, lX=lX, lY=lY)


def write_ipess_kagome_generic(state, outputfile, tol=1.0e-14):
    """Write the iPESS elementary tensors (reference ipess_kagome.py format)."""
    import numpy as np

    from ..io.tensor_io import serialize_bare_tensor_legacy

    raw = {"lX": state.lX, "lY": state.lY}
    if len(state.ipess_tensors) == 1 and (0, 0) in state.ipess_tensors:
        raw["ipess_tensors"] = {
            k: serialize_bare_tensor_legacy(np.asarray(t), tol=tol)
            for k, t in state.ipess_tensors[(0, 0)].items()
        }
    else:
        raw["ipess_tensors"] = {
            str(c): {k: serialize_bare_tensor_legacy(np.asarray(t), tol=tol) for k, t in td.items()}
            for c, td in state.ipess_tensors.items()
        }
    with open(outputfile, "w") as f:
        json.dump(raw, f, indent=2)
