"""One-site C4v-symmetric iPEPS (counterpart of reference ipeps/ipeps_c4v.py)."""

from __future__ import annotations

import jax.numpy as jnp

from ..groups.pg import make_c4v_symm, make_c4v_symm_A1, make_c4v_symm_A2
from . import ipeps as ipeps_mod


class IPEPS_C4V(ipeps_mod.IPEPS):
    """Single-site ansatz; the lattice is tiled by one tensor
    (reference ipeps/ipeps_c4v.py:7-68)."""

    def __init__(self, site=None):
        sites = {(0, 0): site} if site is not None else {}
        super().__init__(sites, lX=1, lY=1)

    def site(self, coord=None):
        return self.sites[(0, 0)]

    def write_to_file(self, outputfile, symmetrize=True, **kwargs):
        tmp = to_ipeps_c4v(self) if symmetrize else self
        ipeps_mod.write_ipeps(tmp, outputfile, **kwargs)


def symmetrize_c4v(A, normalize: bool = False):
    """Project an on-site tensor to A1 (real) or A1 + iA2 (complex) and
    optionally normalize — the differentiable preprocessing applied inside
    every loss evaluation (reference ipeps/ipeps_c4v.py:73-97)."""
    if jnp.iscomplexobj(A):
        A = make_c4v_symm(A.real) + 1.0j * make_c4v_symm(A.imag, irreps=["A2"])
    else:
        A = make_c4v_symm_A1(A)
    if normalize:
        A = A / jnp.linalg.norm(A)
    return A


def to_ipeps_c4v(state, normalize: bool = False) -> IPEPS_C4V:
    assert len(state.sites) == 1, "state has more than a single on-site tensor"
    A = next(iter(state.sites.values()))
    return IPEPS_C4V(symmetrize_c4v(A, normalize=normalize))


def read_ipeps_c4v(jsonfile, aux_seq=(0, 1, 2, 3)) -> IPEPS_C4V:
    """Read a single-site state (reference ipeps/ipeps_c4v.py:98-128)."""
    state = ipeps_mod.read_ipeps(jsonfile, aux_seq=aux_seq)
    assert len(state.sites) == 1, "state has more than a single on-site tensor"
    return IPEPS_C4V(next(iter(state.sites.values())))


def extend_bond_dim_c4v(state, new_d) -> IPEPS_C4V:
    ext = ipeps_mod.extend_bond_dim(state, new_d)
    return IPEPS_C4V(next(iter(ext.sites.values())))
