"""SU(2)-invariant basis generation tests (tpeps/su2sym/gen.py).

Anchors: singlet property checked operatorially (S_tot annihilates
every basis tensor); C4v-A1 symmetry; basis counts match the
reference's committed classifications (su2sym/D3.txt: 2 A_1 on-site
tensors at D=3); bond forms are the invariant epsilon blocks.
"""

import numpy as np
import pytest

from tpeps.groups.pg import verify_c4v_symm_A1
from tpeps.su2sym.gen import (
    _leg_mz,
    _leg_ops,
    default_virt_irreps,
    import_sym_bonds,
    import_sym_tensors,
)


def _apply_sp_total(X, virt_irreps):
    _, Sp_p = _leg_ops((0.5,))
    _, Sp_v = _leg_ops(virt_irreps)
    out = np.zeros_like(X)
    ops = [Sp_p] + [Sp_v] * 4
    for leg, op in enumerate(ops):
        out += np.moveaxis(np.tensordot(op, X, axes=(1, leg)), 0, leg)
    return out


@pytest.mark.parametrize("D", [3, 5])
def test_singlet_and_a1(D):
    ten = import_sym_tensors(2, D, "A1")
    assert len(ten) > 0
    virt = default_virt_irreps(D)
    for meta, t in ten:
        X = np.asarray(t)
        # S+ annihilates a highest-weight singlet; combined with Sz=0
        # (by construction) this certifies S_tot = 0
        assert np.abs(_apply_sp_total(X, virt)).max() < 1e-10
        ok, dev = verify_c4v_symm_A1(t)
        assert ok, dev


def test_counts_match_reference_classification():
    # reference su2sym/D3.txt contains exactly 2 A_1 on-site classes
    assert len(import_sym_tensors(2, 3, "A1")) == 2
    # D=3 bonds: (1/2,1/2) epsilon + (0,0) identity = 2 invariant forms
    assert len(import_sym_bonds(3)) == 2
    # D=5 has two spin-1/2 multiplets -> 2x2 + 1 = 5 invariant forms
    assert len(import_sym_bonds(5)) == 5


def test_bond_forms_are_invariant():
    """(U x U)-invariance: g Sz + Sz^T g = 0 and g Sp + Sm^T g = 0
    (infinitesimal form of U^T g U = g)."""
    D = 5
    Sz, Sp = _leg_ops(default_virt_irreps(D))
    Sm = Sp.T
    for meta, g in import_sym_bonds(D):
        g = np.asarray(g)
        assert np.abs(Sz.T @ g + g @ Sz).max() < 1e-12
        assert np.abs(Sp.T @ g + g @ Sm.T).max() < 1e-12
