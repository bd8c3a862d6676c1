"""SU(2)-invariant C4v tensor bases, generated programmatically.

Counterpart of reference su2sym/sym_ten_parser.py:148-188 + its
committed classification data files (D3/D5/D7/D9.txt, *_bonds.txt).
The reference parses precomputed sparse tables; here the bases are
*derived* at import time from the representation theory — the singlet
subspace of phys x V^4 (V = (1/2)^k + 0, D = 2k+1, the reference's
``irreps`` metadata) intersected with a C4v point-group irrep:

1. enumerate the Sz_total = 0 product states,
2. assemble S^2 restricted to that subspace by applying the per-leg
   spin operators tensor-leg-wise (no 2D^4 x 2D^4 matrices),
3. null space of S^2 = the singlet tensors,
4. project onto the chosen C4v irrep (groups/pg.py) and orthonormalize.

Bond tensors: the invariant bilinear forms V x V -> C, one per ordered
pair of equal-spin multiplets (the 2x2 antisymmetric epsilon for each
1/2 x 1/2 pair, 1 for 0 x 0) — the ``*_bonds.txt`` counterpart used by
the ``_bp`` (site+bond) ansatz.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def default_virt_irreps(D: int):
    """The reference's virtual spaces: V = (1/2)^k + 0 with D = 2k+1."""
    assert D % 2 == 1 and D >= 3, f"supported D are odd >= 3, got {D}"
    k = (D - 1) // 2
    return (0.5,) * k + (0.0,)


def _leg_mz(irreps):
    """Sz quantum numbers along one virtual leg, multiplet-ordered."""
    out = []
    for j in irreps:
        dim = int(round(2 * j)) + 1
        out.extend([j - i for i in range(dim)])
    return np.asarray(out)


def _leg_ops(irreps):
    """Block-diagonal (Sz, Sp) on V = direct sum of spin-j multiplets."""
    dims = [int(round(2 * j)) + 1 for j in irreps]
    D = sum(dims)
    Sz = np.zeros((D, D))
    Sp = np.zeros((D, D))
    off = 0
    for j, dim in zip(irreps, dims):
        ms = [j - i for i in range(dim)]
        for i, m in enumerate(ms):
            Sz[off + i, off + i] = m
        for i in range(dim - 1):
            m = ms[i + 1]  # S+ |j,m> = sqrt(j(j+1)-m(m+1)) |j,m+1>
            Sp[off + i, off + i + 1] = np.sqrt(j * (j + 1) - m * (m + 1))
        off += dim
    return Sz, Sp


def _apply_leg(op, X, leg):
    """Apply a single-leg operator to tensor X[s,u,l,d,r]."""
    return np.moveaxis(np.tensordot(op, X, axes=(1, leg)), 0, leg)


@lru_cache(maxsize=None)
def _singlet_basis(phys_dim: int, virt_irreps: tuple):
    """Orthonormal basis of the S_tot = 0 subspace of phys x V^4,
    returned as an array [n_singlets, p, D, D, D, D]."""
    assert phys_dim == 2, "spin-1/2 physical space (extendable)"
    pj = (0.5,)
    Szs = [_leg_ops(pj)] + [_leg_ops(virt_irreps)] * 4
    mzs = [_leg_mz(pj)] + [_leg_mz(virt_irreps)] * 4
    D = len(mzs[1])
    dims = (phys_dim, D, D, D, D)

    # Sz_total = 0 product states
    grids = np.meshgrid(*mzs, indexing="ij")
    mtot = sum(grids)
    idx0 = np.argwhere(np.abs(mtot) < 1e-12)
    n0 = len(idx0)

    def s2_apply(X):
        """S^2 X = S- S+ X + Sz(Sz+1) X, leg-wise."""
        SpX = np.zeros_like(X)
        for leg, (Sz, Sp) in enumerate(Szs):
            SpX += _apply_leg(Sp, X, leg)
        out = np.zeros_like(X)
        for leg, (Sz, Sp) in enumerate(Szs):
            out += _apply_leg(Sp.T, SpX, leg)  # S- = Sp^T (real)
        # on the Sz_total = 0 sector, Sz(Sz+1) X = 0
        return out

    # assemble S^2 restricted to the Sz=0 sector
    M = np.zeros((n0, n0))
    for col, ind in enumerate(idx0):
        X = np.zeros(dims)
        X[tuple(ind)] = 1.0
        Y = s2_apply(X)
        M[:, col] = Y[tuple(idx0.T)]
    M = 0.5 * (M + M.T)
    w, U = np.linalg.eigh(M)
    null = U[:, w < 1e-10]

    basis = np.zeros((null.shape[1],) + dims)
    basis[(slice(None),) + tuple(idx0.T)] = null.T
    return basis


def import_sym_tensors(phys_dim: int, D: int, pg: str = "A1",
                       virt_irreps=None, dtype=jnp.float64):
    """SU(2)-singlet, C4v-``pg`` on-site tensor basis
    (reference su2sym/sym_ten_parser.py:148 ``import_sym_tensors``).

    :return: list of ``(meta, tensor)`` with orthonormal jnp tensors
        of shape (phys_dim, D, D, D, D)
    """
    from ..groups.pg import make_c4v_symm

    virt_irreps = tuple(virt_irreps) if virt_irreps else default_virt_irreps(D)
    singlets = _singlet_basis(phys_dim, virt_irreps)
    # project every singlet onto the point-group irrep
    proj = np.stack([
        np.asarray(make_c4v_symm(jnp.asarray(t), irreps=(pg,))) for t in singlets
    ])
    # orthonormalize + drop the null directions
    flat = proj.reshape(proj.shape[0], -1)
    U, S, Vh = np.linalg.svd(flat, full_matrices=False)
    keep = S > 1e-10
    out = []
    for i, v in enumerate(Vh[keep]):
        meta = {"irreps": virt_irreps, "pg": pg, "name": f"T_{D}_{pg}_{i}"}
        out.append((meta, jnp.asarray(v.reshape(singlets.shape[1:]), dtype=dtype)))
    return out


def import_sym_bonds(D: int, virt_irreps=None, dtype=jnp.float64):
    """Invariant bilinear forms on V x V (reference
    su2sym/sym_ten_parser.py:174 ``import_sym_bonds``): one per ordered
    pair of equal-spin multiplets — epsilon = [[0,1],[-1,0]] for each
    1/2 pair, [[1]] for the 0 x 0 pair.

    :return: list of ``(meta, bond)`` with bonds of shape (D, D)
    """
    virt_irreps = tuple(virt_irreps) if virt_irreps else default_virt_irreps(D)
    dims = [int(round(2 * j)) + 1 for j in virt_irreps]
    offs = np.cumsum([0] + dims[:-1])
    out = []
    for ia, (ja, da, oa) in enumerate(zip(virt_irreps, dims, offs)):
        for ib, (jb, db, ob) in enumerate(zip(virt_irreps, dims, offs)):
            if ja != jb:
                continue
            g = np.zeros((D, D))
            if da == 1:
                blk = np.asarray([[1.0]])
            else:
                # the unique invariant form on j x j: epsilon_{m,-m'}
                blk = np.zeros((da, da))
                for i in range(da):
                    blk[i, da - 1 - i] = (-1.0) ** i
            g[oa : oa + da, ob : ob + db] = blk
            meta = {"irrep": ja, "pair": (ia, ib), "name": f"B_{D}_{ia}{ib}"}
            out.append((meta, jnp.asarray(g, dtype=dtype)))
    return out
