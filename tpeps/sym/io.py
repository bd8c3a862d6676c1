"""JSON (de)serialization of abelian block-sparse iPEPS.

Reads/writes the reference's abelian state format (reference
ipeps/tensor_io.py:37-343 ``read_json_abelian_tensor_legacy`` /
``serialize_abelian_tensor_legacy``): per-site ``blocks`` each carrying
per-leg ``charges``, ``dims`` and sparse ``entries`` ("i j .. value" or
"i j .. re im").  The committed reference states in
``test-input/abelian/`` load directly — free golden fixtures.
"""

from __future__ import annotations

import json
from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

from ..ipeps.ipeps_abelian import IPEPS_ABELIAN
from .tensor import AbelianTensor, leg

_SYM_OF = {"U(1)": "U1", "U1": "U1", "Z2": "Z2", "U(1)xU(1)": "U1xU1", "U1xU1": "U1xU1"}
_SYM_TO_JSON = {"U1": "U(1)", "Z2": "Z2", "U1xU1": "U(1)xU(1)"}


def _charge(nsym, raw):
    """JSON charge list -> python charge (int for nsym=1, tuple else)."""
    if nsym == 1:
        return int(raw[0]) if isinstance(raw, (list, tuple)) else int(raw)
    return tuple(int(x) for x in raw)


def read_abelian_tensor(json_t) -> AbelianTensor:
    """Parse one serialized abelian tensor (format "abelian")."""
    assert json_t.get("format", "abelian") == "abelian"
    nsym = int(json_t.get("nsym", 1))
    sym_key = json_t["symmetry"]
    if isinstance(sym_key, (list, tuple)):  # e.g. ["U1"] / ["U1", "U1"]
        sym_key = "x".join(sym_key)
    sym = _SYM_OF[sym_key]
    rank = int(json_t["rank"])
    signature = tuple(int(s) for s in json_t["signature"])
    n = _charge(nsym, json_t.get("n", [0] * nsym))
    dtype = jnp.complex128 if "complex" in json_t.get("dtype", "float64") else jnp.float64

    # accumulate per-leg charge -> dim maps from the blocks
    leg_dims = [dict() for _ in range(rank)]
    blocks = {}
    for b in json_t["blocks"]:
        if nsym == 1:
            qs = tuple(int(c) for c in b["charges"])
        else:
            cs = [int(c) for c in b["charges"]]
            qs = tuple(tuple(cs[i * nsym : (i + 1) * nsym]) for i in range(rank))
        dims = tuple(int(d) for d in b["dims"])
        for i, (q, d) in enumerate(zip(qs, dims)):
            prev = leg_dims[i].setdefault(q, d)
            assert prev == d, f"inconsistent dim for leg {i} charge {q}"
        arr = np.zeros(dims, dtype=np.complex128 if dtype == jnp.complex128 else np.float64)
        is_cplx = "complex" in b.get("dtype", json_t.get("dtype", "float64"))
        for entry in b["entries"]:
            tok = entry.split()
            idx = tuple(int(x) for x in tok[:rank])
            if is_cplx:
                arr[idx] = float(tok[rank]) + 1j * float(tok[rank + 1])
            else:
                arr[idx] = float(tok[rank])
        blocks[qs] = arr  # host (numpy) backend; .to_backend("jnp") for AD

    legs = tuple(leg(ld) for ld in leg_dims)
    return AbelianTensor(sym, signature, legs, n, blocks, dtype)


def serialize_abelian_tensor(t: AbelianTensor) -> dict:
    """Inverse of :func:`read_abelian_tensor` (reference format)."""
    nsym = 2 if t.sym == "U1xU1" else 1
    dtype_str = "complex128" if t.dtype == jnp.complex128 else "float64"
    out = {
        "format": "abelian",
        "nsym": nsym,
        "symmetry": _SYM_TO_JSON[t.sym],
        "rank": t.ndim,
        "signature": list(t.signature),
        "n": list(t.n) if isinstance(t.n, tuple) else [t.n],
        "isdiag": False,
        "dtype": dtype_str,
        "blocks": [],
    }
    for qs, b in sorted(t.blocks.items(), key=lambda kv: str(kv[0])):
        arr = np.asarray(b)
        if nsym == 1:
            charges = [int(q) for q in qs]
        else:
            charges = [int(x) for q in qs for x in q]
        entries = []
        it = np.ndindex(*arr.shape)
        for idx in it:
            v = arr[idx]
            pre = " ".join(str(i) for i in idx)
            if "complex" in dtype_str:
                entries.append(f"{pre} {float(v.real)!r} {float(v.imag)!r}")
            else:
                entries.append(f"{pre} {float(v)!r}")
        out["blocks"].append(
            {
                "dtype": dtype_str,
                "dims": list(arr.shape),
                "numEntries": len(entries),
                "entries": entries,
                "charges": charges,
            }
        )
    return out


def read_yastn_tensor(json_t, fermionic: bool = True, pshifts=None) -> AbelianTensor:
    """Parse a yastn ``Tensor.save_to_dict`` entry (the format of the
    reference's PepsAD states, e.g.
    test-input/abelian/CI_D3_1x1_U1_state.json): flat data ``_d`` +
    per-block charges ``t`` / dims ``D`` + signature ``s`` and total
    charge ``n``.  Fused-leg metadata (``hfs``) is ignored — the leg is
    kept as a plain charge->dim table."""
    assert json_t.get("type") == "Tensor"
    sym = _SYM_OF[json_t["SYM_ID"]]
    nsym = 2 if sym == "U1xU1" else 1
    signature = tuple(int(x) for x in json_t["s"])
    rank = len(signature)
    n = _charge(nsym, json_t["n"])
    raw_d = json_t["_d"]
    cplx = bool(raw_d) and isinstance(raw_d[0], dict)
    if cplx:
        flat = np.array([complex(v["real"], v["imag"]) for v in raw_d])
    else:
        flat = np.array([float(v) for v in raw_d])
    dtype = jnp.complex128 if cplx else jnp.float64

    leg_dims = [dict() for _ in range(rank)]
    blocks = {}
    off = 0
    for tq, td in zip(json_t["t"], json_t["D"]):
        if nsym == 1:
            qs = tuple(int(c) for c in tq)
        else:
            cs = [int(c) for c in tq]
            qs = tuple(tuple(cs[i * nsym : (i + 1) * nsym]) for i in range(rank))
        dims = tuple(int(d) for d in td)
        for i, (q, d) in enumerate(zip(qs, dims)):
            prev = leg_dims[i].setdefault(q, d)
            assert prev == d, f"inconsistent dim for leg {i} charge {q}"
        size = int(np.prod(dims))
        blocks[qs] = flat[off : off + size].reshape(dims)
        off += size
    assert off == flat.size, f"data size mismatch: {off} != {flat.size}"
    if pshifts is None:
        pshifts = _infer_pshifts(json_t, rank)
    legs = tuple(leg(ld, ps) for ld, ps in zip(leg_dims, pshifts))
    return AbelianTensor(sym, signature, legs, n, blocks, dtype, fermionic=fermionic)


def _infer_pshifts(json_t, rank):
    """Parity shifts from yastn hard-fusion metadata: a leg fused with
    dummy charge-shift legs (trees like "poo" with an odd total shift)
    is graded by the TRUE fermion parity, i.e. pshift = parity of the
    total dummy charge (see LegCharges.pshift)."""
    hfs = json_t.get("hfs")
    if not hfs:
        return (0,) * rank
    out = []
    for h in hfs:
        shift = 0
        ts = h.get("t") or []
        ds = h.get("D") or []
        # constituent legs with a single charge of dim 1 are dummies
        for tlist, dlist in zip(ts, ds):
            if len(tlist) == 1 and list(dlist) == [1]:
                q = tlist[0]
                qv = sum(q) if isinstance(q, (list, tuple)) else q
                shift += int(qv)
        out.append(abs(shift) % 2)
    return tuple(out)


def read_peps_ad(path, fermionic: bool = True) -> IPEPS_ABELIAN:
    """Read a reference ``PepsAD`` state (ipeps/integration_yastn.py:255
    ``load_PepsAD``): yastn fPEPS tensors with legs ``[t, l, b, r, s]``,
    signature (1, 1, -1, -1, 1).  Graded-transposed to the tpeps
    ``a[s, u, l, d, r]`` convention (signature (1, 1, 1, -1, -1)); the
    graded transpose preserves the encoded fermionic state.  yastn's
    (row nx, col ny) maps to tpeps (y, x), so yastn bonds "r"/"b" are
    the tpeps horizontal/vertical bonds."""
    with open(path) as f:
        raw = json.load(f)
    assert raw.get("type") == "PepsAD", raw.get("type")
    pattern = raw["geometry"]["pattern"]
    sites = OrderedDict()
    for key, jt in raw["parameters"].items():
        # keys like "(0, 0)_0" -> site (nx, ny)
        coord_s = key.rsplit("_", 1)[0].strip("()")
        nx, ny = (int(v) for v in coord_s.split(","))
        t = read_yastn_tensor(jt, fermionic=fermionic)
        assert t.signature == (1, 1, -1, -1, 1), t.signature
        sites[(ny, nx)] = t.transpose((4, 0, 1, 2, 3))  # -> (s, u, l, d, r)
    lY, lX = len(pattern), len(pattern[0])
    sym = next(iter(sites.values())).sym

    def vertexToSite(coord):
        x, y = coord
        return ((x % lX + lX) % lX, (y % lY + lY) % lY)

    return IPEPS_ABELIAN(sym, sites, vertexToSite=vertexToSite, lX=lX, lY=lY)


def read_ipeps_abelian(path, vertexToSite=None) -> IPEPS_ABELIAN:
    """Read an abelian iPEPS state JSON (reference ipeps_abelian.py:412)."""
    with open(path) as f:
        raw = json.load(f)
    coord_of = {m["siteId"]: (int(m["x"]), int(m["y"])) for m in raw["map"]}
    sites = OrderedDict()
    for jt in raw["sites"]:
        sites[coord_of[jt["siteId"]]] = read_abelian_tensor(jt)
    sym = next(iter(sites.values())).sym
    return IPEPS_ABELIAN(
        sym, sites, vertexToSite=vertexToSite,
        lX=int(raw["lX"]), lY=int(raw["lY"]),
    )


def read_ipeps_abelian_c4v(path):
    """Read a 1-site C4v abelian state, normalized to the generic bond
    convention (signature (-1,-1,-1,1,1)).

    C4v states are stored with uniform signatures and q <-> -q symmetric
    leg tables; flipping (phys, u, l) restores the generic convention
    (reference ipeps/ipeps_abelian_c4v.py:178 does the same flip).
    """
    st = read_ipeps_abelian(path)
    a = next(iter(st.sites.values()))
    if a.signature == (1, 1, 1, 1, 1):
        a = a.flip_charges((0, 1, 2))
    elif a.signature == (-1, -1, -1, -1, -1):
        a = a.flip_charges((3, 4))
    assert a.signature == (-1, -1, -1, 1, 1), a.signature
    return IPEPS_ABELIAN(st.sym, {(0, 0): a}, lX=1, lY=1)


def c4v_to_bipartite(state) -> IPEPS_ABELIAN:
    """Map a normalized 1-site C4v U(1) state to the explicit bipartite
    Neel state [[A,B],[B,A]] (reference
    ipeps_abelian_c4v.py:169-206 ``get_bipartite_state``).

    B = phase * charge-conjugate(A): for U(1) spin-1/2 (phys charges
    +-1 = Sz = +-1/2) charge conjugation swaps up/down and the phase op
    (-1 on the phys charge +1 component) completes the sublattice
    rotation i*sigma^y.  The bipartite state is evaluated with the
    *unrotated* Hamiltonian.
    """
    A0 = state.site((0, 0))
    assert A0.signature == (-1, -1, -1, 1, 1)
    A1 = A0.charge_conjugate()
    blocks = {
        qs: (-b if qs[0] == 1 else b) for qs, b in A1.blocks.items()
    }
    A1 = A1.copy_with(blocks)
    return IPEPS_ABELIAN(
        state.sym, {(0, 0): A0, (1, 0): A1},
        vertexToSite=lambda x: ((x[0] + x[1]) % 2, 0), lX=2, lY=2,
    )


def write_ipeps_abelian(state: IPEPS_ABELIAN, path) -> None:
    """Write in the reference's abelian format (round-trips with
    :func:`read_ipeps_abelian` and loads in peps-torch)."""
    site_ids, mp, sites = [], [], []
    for i, (coord, t) in enumerate(state.sites.items()):
        sid = f"A{i}"
        site_ids.append(sid)
        mp.append({"siteId": sid, "x": coord[0], "y": coord[1]})
        jt = serialize_abelian_tensor(t)
        jt["siteId"] = sid
        sites.append(jt)
    out = {"lX": state.lX, "lY": state.lY, "sites": sites, "siteIds": site_ids, "map": mp}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
