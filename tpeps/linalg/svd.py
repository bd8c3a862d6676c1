"""SVD with degenerate-spectrum-safe custom VJP + randomized SVD.

TPU-native counterpart of the reference's AD-critical SVD zoo
(linalg/svd_gesdd.py:74-330, linalg/custom_svd.py:38-425,
linalg/svd_rsvd.py:6-117).  The generic-CTMRG projectors differentiate
through a truncated SVD of the half-system overlap R R~; its backward
must regularize inverse singular-value gaps (arXiv:1903.09650) or
optimization diverges on degenerate multiplets.

The backward here implements the F/G-split formula of reference
linalg/svd_gesdd.py:210-330:
``S_i/(S_i^2-S_j^2) = (F+G)/2``, ``S_j/(S_i^2-S_j^2) = (F-G)/2`` with
``F_ij = 1/(S_i-S_j)``, ``G_ij = 1/(S_i+S_j)``, each Lorentzian
regularized, plus the complex phase term of arXiv:1909.02659 and the
rectangular-case projections onto the orthogonal complements of
span(U), span(V).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .eigh import multiplet_mask, safe_inverse


def _hard_inverse(x, epsilon):
    """1/x with entries |x| < epsilon mapped to exactly 0.

    Mirrors reference ``safe_inverse_2`` (linalg/eig_sym.py:7-9).
    """
    return jnp.where(jnp.abs(x) < epsilon, 0.0, 1.0 / jnp.where(jnp.abs(x) < epsilon, 1.0, x))


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def svd_reg(A, eps: float = 1.0e-12):
    """Reduced SVD ``A = U diag(S) V^H`` with gap-regularized AD.

    The differentiation rule is EXACTLY jax's native complex-aware SVD
    JVP (lax/linalg.py ``_svd_jvp_rule`` — including the skew/phase
    diagonal term that complex SVD needs), with the two singular
    inverses regularized:

    * the gap inverse ``1/(s_j^2 - s_i^2)`` as a Lorentzian with width
      ``eps * S[0]^2`` (reference arXiv:1903.09650 /
      CTMARGS_ad_decomp_reg),
    * ``1/s`` hard-zeroed below ``eps * S[0]``.

    Reverse mode comes from jax's automatic transposition of the
    (linear-in-tangent) JVP, so forward and reverse AD agree by
    construction.  A hand-ported torch backward formula used here
    previously was correct for real input but wrong for complex input
    (framework cotangent-convention mismatch); see
    ``tests/test_linalg.py::test_svd_reg_complex_grad``.

    :param A: matrix ``(m, n)``
    :param eps: relative regularization scale
    :return: ``(U, S, Vh)`` with ``S`` descending, shapes
        ``(m, k), (k,), (k, n)``, ``k = min(m, n)``.
    """
    U, S, Vh = jnp.linalg.svd(A, full_matrices=False)
    return U, S, Vh


@svd_reg.defjvp
def _svd_reg_jvp(eps, primals, tangents):
    (A,) = primals
    (dA,) = tangents
    U, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    V = Vt.conj().T
    Ut = U.conj().T

    s_dim = s[None, :]
    dS = Ut @ dA @ V
    ds = jnp.real(jnp.diagonal(dS))

    s0 = s[0]
    # regularized 1/(s_j^2 - s_i^2)
    s_diffs = (s_dim + s_dim.T) * (s_dim - s_dim.T)
    w = (eps * s0) ** 2
    F = s_diffs / (s_diffs * s_diffs + w * w)
    F = F - jnp.diag(jnp.diag(F))
    # regularized 1/s
    s_inv = _hard_inverse(s, eps * s0)

    dSS = s_dim.astype(A.dtype) * dS
    SdS = s_dim.T.astype(A.dtype) * dS
    dUdV_diag = 0.5 * (dS - dS.conj().T) * jnp.diag(s_inv).astype(A.dtype)
    dU = U @ (F.astype(A.dtype) * (dSS + dSS.conj().T) + dUdV_diag)
    dV = V @ (F.astype(A.dtype) * (SdS + SdS.conj().T))

    m, n = A.shape
    if m > n:
        dAV = dA @ V
        dU = dU + (dAV - U @ (Ut @ dAV)) * s_inv[None, :].astype(A.dtype)
    if n > m:
        dAHU = dA.conj().T @ U
        dV = dV + (dAHU - V @ (Vt @ dAHU)) * s_inv[None, :].astype(A.dtype)

    return (U, s, Vt), (dU, ds, dV.conj().T)


def fix_svd_signs(U, Vh):
    """Gauge-fix SVD factor pairs: largest-|entry| of each U column real positive.

    Counterpart of reference linalg/svd_gesdd.py:18-27; keeps the CTMRG
    environment elementwise-convergent so the fixed point exists for
    implicit differentiation.  The compensating phase goes into Vh so
    ``U S Vh`` is unchanged.
    """
    idx = jnp.argmax(jnp.abs(jax.lax.stop_gradient(U)), axis=0)
    pivots = U[idx, jnp.arange(U.shape[1])]
    if jnp.iscomplexobj(U):
        phase = pivots / jnp.maximum(jnp.abs(pivots), 1e-300)
    else:
        phase = jnp.sign(pivots) + (pivots == 0)
    return U * phase.conj()[None, :], Vh * phase[:, None]


def truncated_svd(
    M,
    chi: int,
    keep_multiplets: bool = True,
    eps: float = 1.0e-12,
    eps_multiplet: float = 1.0e-12,
    abs_tol: float = 1.0e-14,
    fix_signs: bool = True,
):
    """Leading-``chi`` SVD triple, multiplet-safe, static shapes.

    Counterpart of reference linalg/custom_svd.py:38-101
    (``truncated_svd_gesdd``): full SVD + slice + multiplet mask, so the
    VJP sees the *full* decomposition with zero cotangents on the
    discarded part — exactly the reference's gradient semantics.

    :return: ``(U, S, V)`` with shapes ``(m, chi), (chi,), (n, chi)``
        (note: V not Vh, matching the reference's convention).
    """
    U, S, Vh = svd_reg(M, eps)
    if fix_signs:
        U, Vh = fix_svd_signs(U, Vh)
    k = S.shape[0]
    chi_eff = min(chi, k)
    Ut, St, Vht = U[:, :chi_eff], S[:chi_eff], Vh[:chi_eff, :]
    if keep_multiplets and chi < k:
        mask = multiplet_mask(S, chi_eff, eps_multiplet=eps_multiplet, abs_tol=abs_tol)
        St = St * mask
        Ut = Ut * mask[None, :]
        Vht = Vht * mask[:, None]
    if chi_eff < chi:
        Ut = jnp.pad(Ut, ((0, 0), (0, chi - chi_eff)))
        St = jnp.pad(St, (0, chi - chi_eff))
        Vht = jnp.pad(Vht, ((0, chi - chi_eff), (0, 0)))
    return Ut, St, Vht.conj().T


def rsvd(key, M, chi: int, n_oversample: int = 10, n_iter: int = 2, eps: float = 1.0e-12):
    """Randomized truncated SVD (gaussian sketch + power iteration + QR).

    TPU-friendly replacement for the reference's ARPACK/PROPACK partial
    SVDs (linalg/svd_rsvd.py:6-117, linalg/svd_arnoldi.py): every step is
    a dense matmul that maps onto the MXU, and the whole routine jits.
    Intended for the no-grad line-search CTM (reference
    OPTARGS_line_search_svd_method, config.py:435) and for very large
    ``chi*D^2`` where full SVD dominates.

    :param key: jax PRNG key for the sketch
    :return: ``(U, S, V)`` with shapes ``(m, chi), (chi,), (n, chi)``
    """
    m, n = M.shape
    ell = min(chi + n_oversample, min(m, n))
    Omega = jax.random.normal(key, (n, ell), dtype=M.real.dtype).astype(M.dtype)
    Y = M @ Omega
    Q, _ = jnp.linalg.qr(Y)
    for _ in range(n_iter):
        Z = M.conj().T @ Q
        Q, _ = jnp.linalg.qr(Z)
        Y = M @ Q
        Q, _ = jnp.linalg.qr(Y)
    B = Q.conj().T @ M  # (ell, n)
    Ub, S, Vh = svd_reg(B, eps)
    U = Q @ Ub
    U, Vh = fix_svd_signs(U, Vh)
    pad = chi - min(chi, ell)
    U, S, Vh = U[:, :chi], S[:chi], Vh[:chi, :]
    if pad:
        U = jnp.pad(U, ((0, 0), (0, pad)))
        S = jnp.pad(S, (0, pad))
        Vh = jnp.pad(Vh, ((0, pad), (0, 0)))
    return U, S, Vh.conj().T
