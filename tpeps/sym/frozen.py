"""Fixed-structure (frozen) block-sparse decompositions — the traced
counterparts of :func:`tpeps.sym.tensor.eigh_blockwise` /
``svd_blockwise``.

The host versions choose the kept states per charge sector by a global
data-dependent cut, which changes block shapes between CTMRG iterations
and is therefore untraceable.  Near a CTMRG fixed point the per-sector
retained dimensions stabilize; freezing them as static metadata
(``keep: {sector_charge: kept_dim}``) turns the truncated decomposition
into a fixed-shape program: full per-sector eigh/svd + a static slice
to ``keep[q]`` columns.  Everything here is jit/AD-traceable, with the
gap-regularized custom VJPs of :mod:`tpeps.linalg` (degenerate spectra
are the norm in symmetric CTM corners), and deterministic gauge fixing
so the CTMRG environment converges *elementwise* — the precondition for
implicit fixed-point differentiation.

This is the enabling layer for the TPU-resident differentiable abelian
CTMRG (tpeps/ctm/c4v_abelian/frozen.py): the reference gets device
residency and AD from YASTN's torch backend (its abelian engine
backprops through the whole move history,
ctm/generic_abelian/ctmrg.py:130-224); here the same capability comes
from freezing the structure and compiling the move.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..linalg.eigh import eigh_desc, fix_eigvec_phase
from ..linalg.svd import fix_svd_signs, svd_reg
from .tensor import AbelianTensor, _qscale, _sector_matrices, leg


def _scatter_rows(U_blocks, Usec, row_keys, row_dims, row_off, tp, nrow, qsec, k):
    for rk in row_keys:
        blk = Usec[row_off[rk] : row_off[rk] + row_dims[rk], :]
        shape = tuple(tp.legs[i].dims[rk[i]] for i in range(nrow)) + (k,)
        U_blocks[rk + (qsec,)] = blk.reshape(shape)


def eigh_blockwise_fixed(t: AbelianTensor, row_axes, col_axes, keep: dict,
                         ad_decomp_reg: float = 1.0e-12, gauge_fix: bool = True):
    """Spectral decomposition of a hermitian AbelianTensor truncated to
    a FROZEN per-sector profile.

    Mirrors the +-q pairing of :func:`tpeps.sym.tensor.eigh_blockwise`
    (one eigh for the self-paired sector, one SVD per +-q pair) but with
    static kept dimensions, so the output isometry has exactly the leg
    structure recorded in ``keep``.

    :param keep: ``{sector_charge: kept_dim}`` — typically the charge
        table of the converged environment's chi leg.
    :return: ``(U, W_dict)`` as in ``eigh_blockwise``.
    """
    tp, nrow, sector_mats = _sector_matrices(t, row_axes, col_axes)
    missing = [q for q in keep if q not in sector_mats]
    if missing:
        raise ValueError(
            f"frozen structure drift: sectors {missing} in keep but absent from "
            "the corner — re-run the host (dynamic) CTMRG to refresh the "
            "frozen structure"
        )

    U_blocks, W_out = {}, {}
    done = set()
    for qsec in sorted(keep):
        if qsec in done:
            continue
        row_keys, _ck, row_dims, _cd, row_off, _co, M = sector_mats[qsec]
        k = keep[qsec]
        if k > min(M.shape):
            raise ValueError(
                f"frozen keep[{qsec}]={k} exceeds the corner sector size "
                f"{M.shape} — refresh the frozen structure"
            )
        qneg = _qscale(t.sym, -1, qsec)
        if qneg == qsec:
            H = 0.5 * (M + M.conj().T)
            D, U = eigh_desc(H, ad_decomp_reg)
            Usec = U[:, :k]
            if gauge_fix:
                Usec = fix_eigvec_phase(Usec)
            W_out[qsec] = D[:k]
            _scatter_rows(U_blocks, Usec, row_keys, row_dims, row_off, tp, nrow, qsec, k)
            done.add(qsec)
        else:
            U, S, Vh = svd_reg(M, ad_decomp_reg)
            if gauge_fix:
                U, Vh = fix_svd_signs(U, Vh)
            W_out[qsec] = S[:k]
            Usec = U[:, :k]
            _scatter_rows(U_blocks, Usec, row_keys, row_dims, row_off, tp, nrow, qsec, k)
            done.add(qsec)
            if qneg in keep:
                # hermitian partner sector: its isometry is the right-
                # singular basis of the SAME block (gauge-linked by
                # fix_svd_signs), its spectrum the same singular values
                k2 = keep[qneg]
                rk2, _c2, rd2, _cd2, ro2, _co2, _M2 = sector_mats[qneg]
                V = Vh.conj().T
                W_out[qneg] = S[:k2]
                _scatter_rows(U_blocks, V[:, :k2], rk2, rd2, ro2, tp, nrow, qneg, k2)
                done.add(qneg)

    new_leg = leg(dict(keep), sum(l.pshift for l in tp.legs[:nrow]) % 2)
    U_t = AbelianTensor(
        t.sym, tp.signature[:nrow] + (-1,), tp.legs[:nrow] + (new_leg,), 0,
        U_blocks, t.dtype, t.fermionic,
    )
    return U_t, W_out


def svd_blockwise_fixed(t: AbelianTensor, row_axes, col_axes, keep: dict,
                        ad_decomp_reg: float = 1.0e-12, gauge_fix: bool = True):
    """Truncated SVD with a FROZEN per-sector profile (traced counterpart
    of :func:`tpeps.sym.tensor.svd_blockwise`; same return convention).
    """
    from .tensor import _parity

    tp, nrow, sector_mats = _sector_matrices(t, row_axes, col_axes)
    missing = [q for q in keep if q not in sector_mats]
    if missing:
        raise ValueError(
            f"frozen structure drift: sectors {missing} in keep but absent from "
            "the projector matrix — refresh the frozen structure"
        )

    U_blocks, V_blocks, S_out = {}, {}, {}
    for qsec in sorted(keep):
        row_keys, col_keys, row_dims, col_dims, row_off, col_off, M = sector_mats[qsec]
        if keep[qsec] > min(M.shape):
            raise ValueError(
                f"frozen keep[{qsec}]={keep[qsec]} exceeds the sector size "
                f"{M.shape} — refresh the frozen structure"
            )
        U, S, Vh = svd_reg(M, ad_decomp_reg)
        if gauge_fix:
            U, Vh = fix_svd_signs(U, Vh)
        k = keep[qsec]
        S_out[qsec] = S[:k]
        Usec, Vsec = U[:, :k], Vh[:k, :]
        _scatter_rows(U_blocks, Usec, row_keys, row_dims, row_off, tp, nrow, qsec, k)
        for ck in col_keys:
            blk = Vsec[:, col_off[ck] : col_off[ck] + col_dims[ck]]
            shape = (k,) + tuple(tp.legs[nrow + i].dims[ck[i]] for i in range(len(ck)))
            V_blocks[(qsec,) + ck] = blk.reshape(shape)

    rows_pshift = sum(l.pshift for l in tp.legs[:nrow]) % 2
    if t.fermionic:
        # same graded-reconstruction sign convention as svd_blockwise
        V_blocks = {
            q: (-b if (_parity(t.sym, q[0]) + rows_pshift) % 2 else b)
            for q, b in V_blocks.items()
        }
    new_leg = leg(dict(keep), rows_pshift)
    U_t = AbelianTensor(
        t.sym, tp.signature[:nrow] + (-1,), tp.legs[:nrow] + (new_leg,), 0,
        U_blocks, t.dtype, t.fermionic,
    )
    V_t = AbelianTensor(
        t.sym, (1,) + tp.signature[nrow:], (new_leg,) + tp.legs[nrow:], t.n,
        V_blocks, t.dtype, t.fermionic,
    )
    return U_t, S_out, V_t


def reindex_like(t: AbelianTensor, ref: AbelianTensor) -> AbelianTensor:
    """Project ``t`` onto ``ref``'s exact block set and leg metadata:
    blocks missing from ``t`` are filled with zeros, blocks absent from
    ``ref`` are dropped (trace-time error if any carries weight is NOT
    checked — callers freeze a *closed* structure via
    :func:`close_structure` so extras cannot appear).

    This pins the pytree structure of a CTMRG move's output to its
    input, the invariant ``lax.while_loop`` needs.
    """
    blocks = {}
    for q in ref.blocks:
        b = t.blocks.get(q)
        blocks[q] = b if b is not None else jnp.zeros(ref.blocks[q].shape, t.dtype)
    return AbelianTensor(ref.sym, ref.signature, ref.legs, ref.n, blocks,
                         t.dtype, ref.fermionic, ref.conj_reversal)
