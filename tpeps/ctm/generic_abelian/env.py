"""Abelian block-sparse CTM environment for generic unit cells.

Counterpart of reference ctm/generic_abelian/env_abelian.py:13-470 over
:class:`tpeps.sym.tensor.AbelianTensor` instead of yastn.  Same geometry
as the dense :mod:`tpeps.ctm.generic.env`, but environment legs keep
their charge structure and the D-pair legs stay **unfused**:

* ``C[(coord,(dx,dy))]`` rank-2 (chi, chi)
* ``T[(c,(0,-1))]`` top:    (chi_left, Dk_down, Db_down, chi_right)
* ``T[(c,(-1,0))]`` left:   (chi_up, chi_down, Dk_right, Db_right)
* ``T[(c,(0,1))]``  bottom: (Dk_up, Db_up, chi_left, chi_right)
* ``T[(c,(1,0))]``  right:  (chi_up, Dk_left, Db_left, chi_down)

chi legs carry emergent charge sectors: the initial ones are fused
double-layer (ket, bra) pairs; after a move they are the truncated SVD
legs.  ``chi`` is the *target* total dimension — blocks start smaller
and grow until the global cross-sector truncation binds.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

CORNER_VECS = ((-1, -1), (1, -1), (1, 1), (-1, 1))
EDGE_VECS = ((0, -1), (-1, 0), (0, 1), (1, 0))


class ENV_ABELIAN:
    """Host-side container of AbelianTensor corners/edges."""

    def __init__(self, chi: int, C=None, T=None):
        self.chi = chi
        self.C = dict(C) if C else {}
        self.T = dict(T) if T else {}

    def clone(self):
        return ENV_ABELIAN(self.chi, dict(self.C), dict(self.T))

    def get_spectra(self):
        """Sorted singular values of every corner (dense embed; corners
        are chi x chi at most — cheap)."""
        out = {}
        for k, c in self.C.items():
            out[k] = jnp.sort(jnp.linalg.svd(c.to_dense(), compute_uv=False))[::-1]
        return out


def _normalized(t):
    s = t.max_abs()
    if isinstance(s, (float, np.floating, np.ndarray)):
        return t * (1.0 / float(s))  # host backend
    return t * (1.0 / jax.lax.stop_gradient(s))


def init_env(state, chi: int, init_type: str = "CTMRG") -> ENV_ABELIAN:
    if init_type == "CTMRG":
        return init_from_ipeps_pbc(state, chi)
    raise ValueError(f"Invalid abelian environment initialization: {init_type}")


def init_from_ipeps_pbc(state, chi: int) -> ENV_ABELIAN:
    """Environment from PBC-traced double layers (reference
    env_abelian.py:317-470; same network as the dense
    :func:`tpeps.ctm.generic.env.init_from_ipeps_pbc`, with (ket, bra)
    pairs hard-fused into chi legs via ``fuse_pair``)."""
    env = ENV_ABELIAN(chi)

    for coord in state.sites:
        # corners: trace phys + two outward directions.  site legs are
        # a[s,u,l,d,r] = (0..4); tensordot with the conjugate traces the
        # (ket, bra) pairs of the listed axes.
        A = state.site((coord[0] - 1, coord[1] - 1))
        c = A.tensordot(A.conj(), ((0, 1, 2), (0, 1, 2)))  # (d,r, d',r')
        c = c.transpose((0, 2, 1, 3)).fuse_pair(0).fuse_pair(1)  # [d^2, r^2]
        env.C[(coord, (-1, -1))] = _normalized(c)

        A = state.site((coord[0] + 1, coord[1] - 1))
        c = A.tensordot(A.conj(), ((0, 1, 4), (0, 1, 4)))  # (l,d, l',d')
        c = c.transpose((0, 2, 1, 3)).fuse_pair(0).fuse_pair(1)  # [l^2, d^2]
        env.C[(coord, (1, -1))] = _normalized(c)

        A = state.site((coord[0] + 1, coord[1] + 1))
        c = A.tensordot(A.conj(), ((0, 3, 4), (0, 3, 4)))  # (u,l, u',l')
        c = c.transpose((0, 2, 1, 3)).fuse_pair(0).fuse_pair(1)  # [u^2, l^2]
        env.C[(coord, (1, 1))] = _normalized(c)

        A = state.site((coord[0] - 1, coord[1] + 1))
        c = A.tensordot(A.conj(), ((0, 2, 3), (0, 2, 3)))  # (u,r, u',r')
        c = c.transpose((0, 2, 1, 3)).fuse_pair(0).fuse_pair(1)  # [u^2, r^2]
        env.C[(coord, (-1, 1))] = _normalized(c)

        # edges: trace phys + one outward direction, fuse the two chi
        # pairs, keep the bond-facing pair unfused
        A = state.site((coord[0], coord[1] - 1))
        t = A.tensordot(A.conj(), ((0, 1), (0, 1)))  # (l,d,r, l',d',r')
        # -> (l,l', d,d', r,r') -> (chi_l, dk, db, chi_r)
        t = t.transpose((0, 3, 1, 4, 2, 5)).fuse_pair(0)  # (chi_l, d,d', r,r')
        t = t.fuse_pair(3)  # (chi_l, dk, db, chi_r)
        env.T[(coord, (0, -1))] = _normalized(t)

        A = state.site((coord[0] - 1, coord[1]))
        t = A.tensordot(A.conj(), ((0, 2), (0, 2)))  # (u,d,r, u',d',r')
        t = t.transpose((0, 3, 1, 4, 2, 5)).fuse_pair(0)  # (chi_u, d,d', r,r')
        t = t.fuse_pair(1)  # (chi_u, chi_d, rk, rb)
        env.T[(coord, (-1, 0))] = _normalized(t)

        A = state.site((coord[0], coord[1] + 1))
        t = A.tensordot(A.conj(), ((0, 3), (0, 3)))  # (u,l,r, u',l',r')
        t = t.transpose((0, 3, 1, 4, 2, 5))  # (u,u', l,l', r,r')
        t = t.fuse_pair(2).fuse_pair(3)  # (uk, ub, chi_l, chi_r)
        env.T[(coord, (0, 1))] = _normalized(t)

        A = state.site((coord[0] + 1, coord[1]))
        t = A.tensordot(A.conj(), ((0, 4), (0, 4)))  # (u,l,d, u',l',d')
        t = t.transpose((0, 3, 1, 4, 2, 5)).fuse_pair(0)  # (chi_u, l,l', d,d')
        t = t.fuse_pair(3)  # (chi_u, lk, lb, chi_d)
        env.T[(coord, (1, 0))] = _normalized(t)
    return env
