"""CTM projector construction (reference ctm/generic/ctm_projectors.py:14-293).

Half-system overlap -> truncated SVD -> Corboz-style P, Pt
(PRB 84, 041108 / arXiv:1402.2859): given the two half-system matrices
``R[dim0, dim1]``, ``Rt[dim0, dim1]`` joined through ``dim0``,

    M = R^T Rt = U S V^H   (truncated to chi)
    P  = R  U* S^{-1/2}    (dim0, chi)
    Pt = Rt V  S^{-1/2}    (dim0, chi)

The SVD runs through :func:`tpeps.linalg.svd.truncated_svd` (custom VJP
with degenerate-spectrum regularization, multiplet-safe masks, static
shapes).  Rank decisions (reltol cut) are masks, not shape changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...linalg.svd import truncated_svd
from .components import HALVES, HALVES_4X2


def projectors_from_matrices(
    R,
    Rt,
    chi: int,
    svd_reltol: float = 1.0e-8,
    eps_multiplet: float = 1.0e-8,
    multiplet_abstol: float = 1.0e-14,
    ad_decomp_reg: float = 1.0e-12,
    fix_signs: bool = True,
):
    """Compute the pair (P, Pt) of shape (dim0, chi)
    (reference ctm_projectors.py:142-293)."""
    M = R.T @ Rt
    U, S, V = truncated_svd(
        M, chi, keep_multiplets=True, eps=ad_decomp_reg,
        eps_multiplet=eps_multiplet, abs_tol=multiplet_abstol, fix_signs=fix_signs,
    )
    # soft rank cut (reference ctm_projectors.py:266-270): masked, not resized
    S0 = jax.lax.stop_gradient(S[0])
    nz = jax.lax.stop_gradient(S) / S0 > svd_reltol
    S_isqrt = jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, S, 1.0)), 0.0)
    P = (R @ jnp.conj(U)) * S_isqrt[None, :]
    Pt = (Rt @ V) * S_isqrt[None, :]
    return P, Pt


def ctm_get_projectors(
    direction,
    coord,
    sites,
    site_of,
    C,
    T,
    chi: int,
    sites_bra=None,
    **kwargs,
):
    """4x4 projectors for a directional move at ``coord``
    (reference ctm_projectors.py:14-64)."""
    method = kwargs.pop("projector_method", "4X4")
    halves = HALVES_4X2 if method == "4X2" else HALVES
    R, Rt = halves[direction](coord, sites, site_of, C, T, sites_bra=sites_bra)
    return projectors_from_matrices(R, Rt, chi, **kwargs)
