"""Symmetric/hermitian eigendecomposition with AD-stable custom VJP.

This is the projector engine of the C4v CTMRG (the reference's default
``SYMEIG`` path, linalg/eig_sym.py:11-78 + linalg/custom_eig.py:7-68).
JAX's built-in ``eigh`` JVP divides by eigenvalue gaps and produces
NaN/huge gradients for (near-)degenerate spectra, which iPEPS
environments always have (SU(2)/U(1) multiplets).  We install a
``jax.custom_vjp`` that regularizes the gap inverse with a Lorentzian
``safe_inverse`` — the scheme of arXiv:1903.09650 used throughout the
reference.

All outputs have static shapes; truncation is slicing + masking so the
surrounding CTMRG move stays jittable at fixed (D, chi).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def safe_inverse(x, epsilon):
    """Lorentzian-regularized reciprocal ``x / (x^2 + eps)``.

    Mirrors reference linalg/eig_sym.py:4-5.  ``epsilon`` should be
    scaled relative to the leading spectral value by the caller.
    """
    return x / (x * x + epsilon)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def eigh_desc(A, ad_decomp_reg: float = 1.0e-12):
    """Hermitian eigendecomposition ordered by descending ``|eigenvalue|``.

    :param A: hermitian matrix ``(N, N)``
    :param ad_decomp_reg: regularization of the gap inverse in the VJP
        (reference CTMARGS_ad_decomp_reg, config.py:391)
    :return: ``(D, U)`` with ``A = U diag(D) U^H``, ``D`` real, sorted by
        descending magnitude (reference linalg/eig_sym.py:25-33).
    """
    D, U = jnp.linalg.eigh(A)
    order = jnp.argsort(-jnp.abs(D))
    return D[order], U[:, order]


def _eigh_desc_fwd(A, ad_decomp_reg):
    D, U = eigh_desc(A, ad_decomp_reg)
    return (D, U), (D, U)


def _eigh_desc_bwd(ad_decomp_reg, res, grads):
    """VJP with Lorentzian-broadened gap inverse.

    ``dA = U (diag(dD) + F \\circ (U^H dU)) U^H`` with
    ``F_ij = safe_inverse(D_j - D_i)`` and zero diagonal — the formula of
    reference linalg/eig_sym.py:56-78.
    """
    D, U = res
    dD, dU = grads
    Uh = U.conj().T
    F = D[None, :] - D[:, None]  # F_ij = D_j - D_i
    F = safe_inverse(F, jnp.asarray(ad_decomp_reg, dtype=D.dtype))
    F = F - jnp.diag(jnp.diag(F))
    inner = jnp.diag(dD.astype(U.dtype)) + F.astype(U.dtype) * (Uh @ dU)
    dA = U @ inner @ Uh
    return (dA,)


eigh_desc.defvjp(_eigh_desc_fwd, _eigh_desc_bwd)


def multiplet_mask(D, chi: int, eps_multiplet: float = 1.0e-8, abs_tol: float = 1.0e-14):
    """Boolean mask over the leading ``chi`` values avoiding multiplet splits.

    Reimplements the degenerate-multiplet protection of reference
    linalg/custom_eig.py:38-63 (and linalg/custom_svd.py:8-36) as a
    vectorized, jit-friendly computation: if the cut at ``chi`` falls
    inside a near-degenerate multiplet, the cut is pulled back to the
    last clean gap and the remainder of the multiplet is masked to zero
    (keeping static shapes).  Gradient stability demands this: splitting
    a multiplet puts a ~zero gap into the decomposition VJP.

    :param D: spectral values sorted by descending magnitude, ``len >= chi+1``
    :return: float mask of shape ``(chi,)`` (1.0 keep / 0.0 drop)
    """
    absD = jnp.abs(jax.lax.stop_gradient(D[: chi + 1]))
    absD = jnp.where(absD < abs_tol, 0.0, absD)
    # normalized gap between consecutive values (reference custom_eig.py:46-48)
    gaps = (absD[:chi] - jnp.abs(jax.lax.stop_gradient(D[1 : chi + 1]))) / (
        absD[:chi] + 1.0e-16
    )
    gaps = jnp.where(gaps > 1.0, 0.0, gaps)

    idx = jnp.arange(chi)
    is_gap = gaps > eps_multiplet
    # largest i < chi with a clean gap; if none, keep everything
    last_gap = jnp.max(jnp.where(is_gap, idx, -1))
    chi_new = jnp.where(last_gap >= 0, last_gap, chi)
    # only pull back the cut when chi itself splits a multiplet
    cut = jnp.where(is_gap[chi - 1], chi, chi_new)
    # mask in the spectrum's own (real) dtype: an untyped float here
    # promotes the entire downstream move to f64 under x64 (observed:
    # the "f32" TPU move silently ran in emulated f64)
    return (idx <= cut).astype(absD.dtype)


def truncated_eigh_sym(
    M,
    chi: int,
    keep_multiplets: bool = True,
    ad_decomp_reg: float = 1.0e-12,
    eps_multiplet: float = 1.0e-12,
    abs_tol: float = 1.0e-14,
):
    """Leading-``chi`` eigenpairs of a hermitian matrix, multiplet-safe.

    TPU-native counterpart of reference linalg/custom_eig.py:7-68
    (``truncated_eig_sym``): full ``eigh`` + static slice to ``chi`` +
    mask.  Returns ``(D_t, U_t)`` with shapes ``(chi,)``/``(N, chi)``;
    masked entries are exactly zero, as in the reference.
    """
    N = M.shape[0]
    D, U = eigh_desc(M, ad_decomp_reg)
    chi_eff = min(chi, N)
    Dt = D[:chi_eff]
    Ut = U[:, :chi_eff]
    if keep_multiplets and chi < N:
        mask = multiplet_mask(D, chi_eff, eps_multiplet=eps_multiplet, abs_tol=abs_tol)
        Dt = Dt * mask
        Ut = Ut * mask[None, :]
    if chi_eff < chi:  # pad to static chi
        Dt = jnp.pad(Dt, (0, chi - chi_eff))
        Ut = jnp.pad(Ut, ((0, 0), (0, chi - chi_eff)))
    return Dt, Ut


def fix_eigvec_phase(U):
    """Gauge-fix eigenvector columns: largest-|entry| element made real positive.

    Needed for elementwise convergence of the CTMRG environment (gauge
    jitter otherwise prevents the fixed point required by implicit
    differentiation).  Counterpart of reference linalg/svd_gesdd.py:18-27
    (``fix_svd_signs``), applied to eigenvectors.  Differentiable a.e.
    """
    idx = jnp.argmax(jnp.abs(jax.lax.stop_gradient(U)), axis=0)
    pivots = U[idx, jnp.arange(U.shape[1])]
    if jnp.iscomplexobj(U):
        phase = pivots / jnp.maximum(jnp.abs(pivots), 1e-300)
    else:
        phase = jnp.sign(pivots) + (pivots == 0)
    return U * phase.conj()[None, :]
