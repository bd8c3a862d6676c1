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


class IPEPS_D2SYM(ipeps_mod.IPEPS):
    """One-parent-tensor ansatz with D2 (up-down reflection) symmetry on
    a 1x2 cell: sites[(0,1)] is the u<->d transpose of the parent
    (reference ipeps/ipeps_d2.py:6-119).  The bipartite AFM pattern is
    handled at the level of observables (rotated operators)."""

    def __init__(self, site=None, vertexToSite=None):
        self.parent_site = site
        sites = self.build_onsite_tensors() if site is not None else {}
        super().__init__(sites, vertexToSite=vertexToSite, lX=1, lY=2)

    def build_onsite_tensors(self):
        return {
            (0, 0): self.parent_site,
            (0, 1): self.parent_site.transpose(0, 3, 2, 1, 4),
        }

    def get_parameters(self):
        return {"parent": self.parent_site}

    def set_parameters(self, params):
        return IPEPS_D2SYM(params["parent"])

    def add_noise(self, noise, key=None):
        """(reference ipeps_d2.py:70-76): noise + D2 re-symmetrization."""
        import numpy as np

        from ..groups.pg import make_d2_symm

        if noise == 0:
            return self
        rng = np.random.RandomState(0 if key is None else key)
        t = self.parent_site + noise * jnp.asarray(rng.rand(*self.parent_site.shape))
        t = make_d2_symm(t)
        self.parent_site = t / jnp.abs(t).max()
        self.sites = self.build_onsite_tensors()
        return self

    def get_aux_bond_dims(self):
        return list(self.parent_site.shape[1:])


def read_ipeps_d2(jsonfile) -> IPEPS_D2SYM:
    """Read the parent tensor from a 1-site state file
    (reference ipeps_d2.py:84-119)."""
    from .ipeps import read_ipeps

    base = read_ipeps(jsonfile)
    return IPEPS_D2SYM(next(iter(base.sites.values())))
