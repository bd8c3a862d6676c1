"""Abelian (block-sparse) kagome iPESS ansatz.

Counterpart of reference ipeps/ipess_kagome_abelian.py (371 LoC): the
five elementary tensors T_u, T_d (trivalent) and B_a, B_b, B_c (bond,
physical) assemble the square-lattice on-site tensor; here the three
kagome DoFs are kept as SEPARATE legs, ``a7[s0, s1, s2, u, l, d, r]``
(the reference fuses them through yastn's hard fusion) — the abelian
kagome RDMs contract the DoFs selectively without any unfuse machinery,
and ``fused_site`` hard-fuses (s0 s1 s2) for the generic abelian CTM.

Signatures: phys +1; internal triangle bonds emitted dual (-1) by the
trivalent tensors and absorbed (+1) by the bond tensors; final aux legs
(u, l) = +1, (d, r) = -1 — the IPEPS_ABELIAN convention.
  T_u[i, a, b]  sig (-1, 1, 1)    (i -> B_c, a = up, b = left)
  B_c[s0, j, i] sig (1, -1, 1)    (j -> T_d)
  T_d[j, k, l]  sig (1, -1, -1)
  B_b[s1, k, c] sig (1, 1, -1)    (c = down)
  B_a[s2, l, d] sig (1, 1, -1)    (d = right)
"""

from __future__ import annotations

from collections import OrderedDict

from .ipeps_abelian import IPEPS_ABELIAN

IPESS_KEYS = ("T_u", "T_d", "B_a", "B_b", "B_c")


def build_onsite_7(td, normalize=True):
    """a7[s0, s1, s2, u, l, d, r] from the five elementary tensors.

    ``normalize=False`` keeps the raw scale and stays traceable (for
    jitted losses over the elementary-tensor blocks)."""
    q = td["B_c"].tensordot(td["T_u"], ((2,), (0,)))   # (s0, j, a, b)
    q = q.tensordot(td["T_d"], ((1,), (0,)))            # (s0, a, b, k, l)
    q = q.tensordot(td["B_b"], ((3,), (1,)))            # (s0, a, b, l, s1, c)
    q = q.tensordot(td["B_a"], ((3,), (1,)))            # (s0, a, b, s1, c, s2, d)
    a7 = q.transpose((0, 3, 5, 1, 2, 4, 6))             # (s0,s1,s2, a,b,c,d)
    if not normalize:
        return a7
    n = a7.max_abs()
    return a7 * (1.0 / float(n))


class IPESS_KAGOME_ABELIAN:
    """Kagome iPESS over abelian block-sparse tensors (1-site cell)."""

    def __init__(self, sym, ipess_tensors):
        if set(ipess_tensors.keys()) == set(IPESS_KEYS):
            ipess_tensors = {(0, 0): ipess_tensors}
        self.sym = sym
        self.ipess_tensors = OrderedDict(ipess_tensors)
        self.sites7 = OrderedDict(
            (c, build_onsite_7(td)) for c, td in self.ipess_tensors.items()
        )
        self.lX = self.lY = 1 if len(self.sites7) == 1 else None
        if self.lX is None:
            xs = [c[0] for c in self.sites7]
            ys = [c[1] for c in self.sites7]
            self.lX = max(xs) - min(xs) + 1
            self.lY = max(ys) - min(ys) + 1

        def vertexToSite(coord):
            x, y = coord
            return ((x % self.lX + self.lX) % self.lX,
                    (y % self.lY + self.lY) % self.lY)

        self.vertexToSite = vertexToSite

    def site7(self, coord=(0, 0)):
        return self.sites7[self.vertexToSite(coord)]

    def fused(self) -> IPEPS_ABELIAN:
        """5-leg fused-physical view for the generic abelian CTM."""
        sites = OrderedDict(
            (c, a.fuse_pair(0).fuse_pair(0)) for c, a in self.sites7.items()
        )
        return IPEPS_ABELIAN(self.sym, sites, self.vertexToSite, self.lX, self.lY)

    def to_dense7(self):
        """Dense 7-leg tensors (oracle bridge for tests)."""
        return OrderedDict((c, a.to_dense()) for c, a in self.sites7.items())


def read_ipess_kagome_abelian(path) -> IPESS_KAGOME_ABELIAN:
    """Load an abelian kagome iPESS from the reference's JSON format
    (reference ipeps/ipess_kagome_abelian.py ``read_ipess_kagome_generic``;
    e.g. test-input/abelian/IPESS_KAGOME_RVB_D3_abelian-U1_state.json).

    The stored signatures (T_u/T_d all -1; bond tensors (-1, 1, 1)) are
    normalized to this module's convention by per-leg signature flips —
    an isomorphism applied consistently at both ends of every internal
    bond."""
    import json

    from ..sym.io import read_abelian_tensor

    with open(path) as f:
        d = json.load(f)
    raw = {k: read_abelian_tensor(v) for k, v in d["ipess_tensors"].items()}
    sym = d["ipess_tensors"]["T_u"].get("symmetry", "U1")
    if isinstance(sym, (list, tuple)):
        sym = "x".join(sym)
    td = {
        "T_u": raw["T_u"].flip_charges((1, 2)),
        "B_c": raw["B_c"].flip_charges((0, 1)),
        "T_d": raw["T_d"].flip_charges((0,)),
        "B_b": raw["B_b"].flip_charges((0, 2)),
        "B_a": raw["B_a"].flip_charges((0, 2)),
    }
    return IPESS_KAGOME_ABELIAN(sym, td)


_READ_FLIPS = {"T_u": (1, 2), "B_c": (0, 1), "T_d": (0,),
               "B_b": (0, 2), "B_a": (0, 2)}


def write_ipess_kagome_abelian(state, path):
    """Write the five elementary tensors in the reference's JSON layout
    (round-trips with :func:`read_ipess_kagome_abelian`: the same
    per-leg signature flips are applied in reverse)."""
    import json

    from ..sym.io import serialize_abelian_tensor

    td = state.ipess_tensors[(0, 0)]
    out = {"ipess_tensors": {}}
    for k in IPESS_KEYS:
        t = td[k].to_backend("np").flip_charges(_READ_FLIPS[k])
        out["ipess_tensors"][k] = serialize_abelian_tensor(t)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
