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


# ---------------------------------------------------------------------------
# point-group constrained single-cell iPESS (reference ipess_kagome.py:321-723)
# ---------------------------------------------------------------------------

def _to_PG_symmetric(pgs, elem_ts):
    """Project elementary tensors onto point-group irreps
    (reference ipess_kagome.py:547-581).

    Bond tensors: ``A`` = symmetric (+ i antisymmetric), ``B`` =
    antisymmetric (+ i symmetric) under exchange of the two aux legs.
    Trivalent tensors: cyclic average, then ``A_1``/``A_2`` (anti)
    symmetrization under leg exchange.
    """
    out = OrderedDict(elem_ts)
    for t_id, pg in pgs.items():
        if pg is None or t_id not in elem_ts:
            continue
        t = elem_ts[t_id]
        if t_id in ("B_a", "B_b", "B_c"):
            if pg == "A":
                out[t_id] = 0.5 * (t + jnp.conj(t.transpose(0, 2, 1)))
            elif pg == "B":
                out[t_id] = 0.5 * (t - jnp.conj(t.transpose(0, 2, 1)))
            else:
                raise RuntimeError(f"Unsupported point-group {t_id} {pg}")
        elif t_id in ("T_u", "T_d"):
            tmp = (1.0 / 3) * (t + t.transpose(1, 2, 0) + t.transpose(2, 0, 1))
            if pg == "A_1":
                out[t_id] = 0.5 * (tmp + jnp.conj(tmp.transpose(0, 2, 1)))
            elif pg == "A_2":
                out[t_id] = 0.5 * (tmp - jnp.conj(tmp.transpose(0, 2, 1)))
            else:
                raise RuntimeError(f"Unsupported point-group {t_id} {pg}")
    return out


class IPESS_KAGOME_PG(IPESS_KAGOME_GENERIC):
    """Single-cell iPESS with spatial symmetries (reference
    ipess_kagome.py:321-546): optional up/down triangle equivalence
    (``SYM_UP_DOWN``), bond-tensor equivalence (``SYM_BOND_S``) and
    point-group irrep constraints per elementary tensor (``pgs``)."""

    PG_A1_B = {"T_u": "A_1", "T_d": "A_1", "B_a": "B", "B_b": "B", "B_c": "B"}
    PG_A2_B = {"T_u": "A_2", "T_d": "A_2", "B_a": "B", "B_b": "B", "B_c": "B"}

    def __init__(self, T_u, B_c, T_d=None, B_a=None, B_b=None,
                 SYM_UP_DOWN=True, SYM_BOND_S=True, pgs=None,
                 pg_symmetrize=False):
        self.SYM_UP_DOWN = SYM_UP_DOWN
        self.SYM_BOND_S = SYM_BOND_S
        self.elem_tensors = OrderedDict({"T_u": T_u, "B_c": B_c})
        if not SYM_UP_DOWN:
            assert T_d is not None, "T_d required when not SYM_UP_DOWN"
            self.elem_tensors["T_d"] = T_d
        if not SYM_BOND_S:
            assert B_a is not None and B_b is not None, \
                "B_a, B_b required when not SYM_BOND_S"
            self.elem_tensors["B_a"] = B_a
            self.elem_tensors["B_b"] = B_b
        if pgs is None:
            pgs = {}
        assert set(pgs.keys()) <= {"T_u", "T_d", "B_a", "B_b", "B_c"}, \
            f"Invalid point-group specification {pgs}"
        self.pgs = pgs
        if pg_symmetrize:
            self.elem_tensors = _to_PG_symmetric(self.pgs, self.elem_tensors)
        super().__init__(self._expand(self.elem_tensors))

    def _expand(self, elem):
        return OrderedDict({
            "T_u": elem["T_u"],
            "T_d": elem["T_u"] if self.SYM_UP_DOWN else elem["T_d"],
            "B_c": elem["B_c"],
            "B_a": elem["B_c"] if self.SYM_BOND_S else elem["B_a"],
            "B_b": elem["B_c"] if self.SYM_BOND_S else elem["B_b"],
        })

    def get_parameters(self):
        """Variational parameters = the non-equivalent elementary tensors
        (reference ipess_kagome.py:422-431)."""
        return dict(self.elem_tensors)

    def set_parameters(self, params):
        new = IPESS_KAGOME_PG(
            params["T_u"], params["B_c"],
            T_d=params.get("T_d"), B_a=params.get("B_a"), B_b=params.get("B_b"),
            SYM_UP_DOWN=self.SYM_UP_DOWN, SYM_BOND_S=self.SYM_BOND_S,
            pgs=self.pgs,
        )
        return new


def to_PG_symmetric(state, SYM_UP_DOWN=None, SYM_BOND_S=None, pgs=None):
    """Symmetrized copy of an IPESS_KAGOME_PG
    (reference ipess_kagome.py:583-616)."""
    assert isinstance(state, IPESS_KAGOME_PG)
    SYM_UP_DOWN = state.SYM_UP_DOWN if SYM_UP_DOWN is None else SYM_UP_DOWN
    SYM_BOND_S = state.SYM_BOND_S if SYM_BOND_S is None else SYM_BOND_S
    pgs = state.pgs if pgs is None else pgs
    se = _to_PG_symmetric(pgs, state.elem_tensors)
    return IPESS_KAGOME_PG(
        se["T_u"], se["B_c"],
        T_d=None if SYM_UP_DOWN else se["T_d"],
        B_a=None if SYM_BOND_S else se["B_a"],
        B_b=None if SYM_BOND_S else se["B_b"],
        SYM_UP_DOWN=SYM_UP_DOWN, SYM_BOND_S=SYM_BOND_S, pgs=pgs,
    )


def read_ipess_kagome_pg(jsonfile) -> IPESS_KAGOME_PG:
    """Read an IPESS_KAGOME_PG state (reference ipess_kagome.py:617-695),
    including legacy ``UP_T``/``DOWN_T``/``BOND_S*`` naming."""
    with open(jsonfile) as j:
        raw = json.load(j)
    SYM_UP_DOWN = raw.get("SYM_UP_DOWN", True)
    SYM_BOND_S = raw.get("SYM_BOND_S", True)
    pgs = raw.get("pgs")
    if pgs is not None and not isinstance(pgs, dict):
        pgs = tuple(pgs)
        if pgs == (None, None, None):
            pgs = None
        elif pgs == ("A_2", "A_2", "B"):
            pgs = {"T_u": "A_2", "T_d": "A_2", "B_c": "B", "B_a": "B", "B_b": "B"}

    elem_t = OrderedDict(
        (k, jnp.asarray(read_json_tensor(t))) for k, t in raw["elem_tensors"].items()
    )
    if "UP_T" in elem_t and "BOND_S" in elem_t:
        elem = {"T_u": elem_t["UP_T"], "B_c": elem_t["BOND_S"]}
        if "DOWN_T" in elem_t and not SYM_UP_DOWN:
            elem["T_d"] = elem_t["DOWN_T"]
    elif "UP_T" in elem_t and "BOND_S1" in elem_t:
        elem = {"T_u": elem_t["UP_T"], "B_c": elem_t["BOND_S1"]}
        if "DOWN_T" in elem_t and not SYM_UP_DOWN:
            elem["T_d"] = elem_t["DOWN_T"]
        if "BOND_S2" in elem_t and "BOND_S3" in elem_t and not SYM_BOND_S:
            elem["B_b"] = elem_t["BOND_S2"]
            elem["B_a"] = elem_t["BOND_S3"]
    else:
        elem = dict(elem_t)
    return IPESS_KAGOME_PG(
        elem["T_u"], elem["B_c"], T_d=elem.get("T_d"),
        B_a=elem.get("B_a"), B_b=elem.get("B_b"),
        SYM_UP_DOWN=SYM_UP_DOWN, SYM_BOND_S=SYM_BOND_S, pgs=pgs,
    )


def write_ipess_kagome_pg(state, outputfile, tol=1.0e-14, normalize=False,
                          pg_symmetrize=False):
    """(reference ipess_kagome.py:697-723)."""
    import numpy as np

    from ..io.tensor_io import serialize_bare_tensor_legacy

    st = to_PG_symmetric(state) if pg_symmetrize else state
    raw = {"elem_tensors": {}, "SYM_UP_DOWN": st.SYM_UP_DOWN,
           "SYM_BOND_S": st.SYM_BOND_S, "pgs": st.pgs}
    for k, t in st.elem_tensors.items():
        tt = np.asarray(t)
        if normalize:
            tt = tt / np.abs(tt).max()
        raw["elem_tensors"][k] = serialize_bare_tensor_legacy(tt, tol=tol)
    with open(outputfile, "w") as f:
        json.dump(raw, f, indent=4, separators=(",", ": "))
