"""Fermionic double-layer tensors vs the brute-force Grassmann oracle.

The claim certified here (see tpeps/ctm/generic/dl_fermi.py): the
*bosonic* contraction of per-site sign-dressed double tensors equals
the Grassmann-integral value of the graded ket x bra network, for
arbitrary fermionic tensors, on open patches of any shape — including
patches with fully interior sites.  This is the exactness property
that lets the double-layer CTM (tpeps/ctm/generic/dl.py) contract
fermionic iPEPS with no sign bookkeeping (the role of the swap-gate
double tensors in reference ctm/generic_abelian/corrf_fermionic.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpeps.sym.tensor import AbelianTensor, LegCharges, leg
from tpeps.ctm.generic.dl_fermi import double_tensor, double_tensor_open

from test_fermionic import _pairwise, _rand_even

SIG = (1, 1, 1, -1, -1)
Lb = leg({0: 1})


def _patch(nx, ny, Lp, Lv):
    coords = [(x, y) for y in range(ny) for x in range(nx)]
    legt = {}
    for (x, y) in coords:
        legt[(x, y)] = (Lp,
                        Lv if y > 0 else Lb,
                        Lv if x > 0 else Lb,
                        Lv if y < ny - 1 else Lb,
                        Lv if x < nx - 1 else Lb)
    KI = {c: i for i, c in enumerate(coords)}
    BI = {c: i + len(coords) for i, c in enumerate(coords)}
    bonds = []
    for c in coords:
        bonds.append(((KI[c], 0), (BI[c], 0)))
    for (x, y) in coords:
        if x < nx - 1:
            bonds.append(((KI[(x, y)], 4), (KI[(x + 1, y)], 2)))
            bonds.append(((BI[(x, y)], 4), (BI[(x + 1, y)], 2)))
        if y < ny - 1:
            bonds.append(((KI[(x, y)], 3), (KI[(x, y + 1)], 1)))
            bonds.append(((BI[(x, y)], 3), (BI[(x, y + 1)], 1)))
        for ax in (1, 2, 3, 4):
            if legt[(x, y)][ax] is Lb:
                bonds.append(((KI[(x, y)], ax), (BI[(x, y)], ax)))
    # contraction order: close phys per site first, then merge row-major
    order = ([(KI[c], BI[c]) for c in coords] +
             [(KI[coords[0]], KI[c]) for c in coords[1:]])
    return coords, legt, bonds, order


def _bosonic_patch(nx, ny, coords, Es):
    """Contract fused double tensors E[u,l,d,r] over the patch."""
    lab = {}

    def bid(key):
        if key not in lab:
            lab[key] = len(lab)
        return lab[key]

    args = []
    for (x, y) in coords:
        sub = [bid(("v", x, y - 1)) if y > 0 else bid(("bu", x, y)),
               bid(("h", x - 1, y)) if x > 0 else bid(("bl", x, y)),
               bid(("v", x, y)) if y < ny - 1 else bid(("bd", x, y)),
               bid(("h", x, y)) if x < nx - 1 else bid(("br", x, y))]
        args += [np.asarray(Es[(x, y)]), sub]
    return complex(np.einsum(*args, []))


def _oracle(coords, legt, bonds, order, ts):
    tensors = [ts[c] for c in coords] + [ts[c].conj() for c in coords]
    return complex(_pairwise(tensors, bonds, order))


@pytest.mark.parametrize("nx,ny", [(2, 2), (3, 2), (2, 3)])
def test_patch_norm_matches_oracle(nx, ny):
    rng = np.random.default_rng(4)
    Lp = leg({-1: 1, 0: 2, 1: 1})
    Lv = leg({-1: 1, 0: 1, 1: 1})
    coords, legt, bonds, order = _patch(nx, ny, Lp, Lv)
    ts = {c: _rand_even(rng, "U1", SIG, legt[c]) for c in coords}
    want = _oracle(coords, legt, bonds, order, ts)
    Es = {c: double_tensor(ts[c]) for c in coords}
    got = _bosonic_patch(nx, ny, coords, Es)
    assert abs(want - got) / abs(want) < 1e-12


def test_patch_norm_interior_site():
    """3x3 patch: the center site has no boundary leg at all — the
    dressing must be exact for a fully interior site (small legs to
    keep the brute-force oracle tractable)."""
    rng = np.random.default_rng(9)
    Lp = leg({0: 1, 1: 1})
    Lv = leg({0: 1, 1: 1})
    coords, legt, bonds, order = _patch(3, 3, Lp, Lv)
    ts = {c: _rand_even(rng, "U1", SIG, legt[c]) for c in coords}
    want = _oracle(coords, legt, bonds, order, ts)
    Es = {c: double_tensor(ts[c]) for c in coords}
    got = _bosonic_patch(3, 3, coords, Es)
    assert abs(want - got) / abs(want) < 1e-12


def test_patch_norm_shifted_phys():
    """Charge-shifted physical leg (LegCharges.pshift, the yastn
    half-filling dummy-leg convention): the dressing acts on TRUE
    fermion parities."""
    rng = np.random.default_rng(3)
    Lps = LegCharges(((0, 1), (1, 2), (2, 1)), pshift=1)
    Lv = leg({-1: 1, 0: 1, 1: 1})
    coords, legt, bonds, order = _patch(2, 2, Lps, Lv)
    ts = {c: _rand_even(rng, "U1", SIG, legt[c]) for c in coords}
    want = _oracle(coords, legt, bonds, order, ts)
    Es = {c: double_tensor(ts[c]) for c in coords}
    got = _bosonic_patch(2, 2, coords, Es)
    assert abs(want - got) / abs(want) < 1e-12


def test_open_parity_even_op():
    """double_tensor_open + a parity-even operator == double_tensor of
    the op-inserted site, and the 2x2 patch expectation matches the
    graded insertion through the oracle."""
    rng = np.random.default_rng(7)
    Lp = leg({-1: 1, 0: 2, 1: 1})
    Lv = leg({-1: 1, 0: 1, 1: 1})
    coords, legt, bonds, order = _patch(2, 2, Lp, Lv)
    ts = {c: _rand_even(rng, "U1", SIG, legt[c]) for c in coords}
    # parity-even diagonal operator (a "number"-like op)
    op = np.diag(rng.standard_normal(4))
    E_op = double_tensor(ts[(0, 0)], op=op)
    Eo = double_tensor_open(ts[(0, 0)])
    E_op2 = jnp.einsum("zs,szuldr->uldr", jnp.asarray(op), Eo)
    assert float(jnp.abs(E_op - E_op2).max()) < 1e-12

    Es = {c: double_tensor(ts[c]) for c in coords}
    norm = _bosonic_patch(2, 2, coords, Es)
    Es[(0, 0)] = E_op
    got = _bosonic_patch(2, 2, coords, Es) / norm

    # graded insertion: op as a graded 2-leg tensor on the phys bond,
    # in-leg dressed with (-1)^p(q_in) — the canonical physical
    # convention (tpeps/groups/fermions.py dress_in, validated against
    # exact Fock computations in test_fermionic.py).  The bosonic
    # pathway trace(rho . op) includes this dressing automatically.
    opg = AbelianTensor("U1", (1, -1), (Lp, Lp), 0,
                        dtype=jnp.complex128, fermionic=True)
    offs = {-1: 0, 0: 1, 1: 3}
    for q, o in offs.items():
        d = 1 if q != 0 else 2
        blk = op[o:o + d, o:o + d] * ((-1.0) ** (abs(q) % 2))
        opg.blocks[(q, q)] = jnp.asarray(blk)
    coordsK = coords
    tensors = ([ts[c] for c in coordsK] + [ts[c].conj() for c in coordsK]
               + [opg])
    # rewire: ket(0,0).s -> op.in(1); op.out(0) -> bra(0,0).s
    bonds2 = []
    for (a, b) in bonds:
        if a == (0, 0) and b == (4, 0):
            bonds2.append(((0, 0), (8, 1)))
            bonds2.append(((8, 0), (4, 0)))
        else:
            bonds2.append((a, b))
    order2 = [(0, 8), (0, 4)] + [(c, c + 4) for c in (1, 2, 3)] + \
        [(0, c) for c in (1, 2, 3)]
    want = complex(_pairwise(tensors, bonds2, order2)) / \
        _oracle(coords, legt, bonds, order, ts)
    assert abs(want - got) < 1e-12 * max(1.0, abs(want))
