"""Warm-started block subspace iteration for truncated eigendecomposition.

Motivation (measured on TPU v5e): XLA's dense ``eigh`` is compiled via
size-unrolled QDWH and its *compile time* explodes with matrix size
(~100 s at n=1875 f32; f64 far worse), while CTMRG only needs the
leading chi eigenpairs of an enlarged corner that changes *slightly*
between iterations.  The TPU-native projector is therefore:

    P <- orth(M @ P_prev)   (repeated n_power times, CholeskyQR2 orth)
    Rayleigh-Ritz: H = P^H M P  (chi x chi)  ->  eigh(H) -> rotate P

Every heavy op is a dense matmul on the MXU; the only decompositions are
chi x chi (cheap to compile and run).  The previous move's projector is
the warm start, so 2-3 power steps per move suffice once CTMRG is near
its fixed point — and CTMRG is self-correcting against inexact early
projectors.  Fully differentiable (the small eigh uses the regularized
custom VJP); this also keeps AD away from the huge-matrix eigh VJP.

This replaces the role of ARPACK/LOBPCG partial eigensolvers in the
reference (linalg/eig_arnoldi.py, linalg/eig_lobpcg.py) with an
MXU-shaped algorithm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .eigh import eigh_desc, multiplet_mask


def polar_unitary(O, reg: float = 1.0e-12):
    """Unitary factor of the polar decomposition ``O = W H`` via
    ``W = O (O^H O)^{-1/2}`` with an eigh-based inverse square root.

    eigh is used instead of SVD because XLA:TPU compiles small dense SVD
    pathologically slowly (~3 min at 147x147 f64) while eigh compiles in
    seconds; AD flows through the regularized eigh VJP.
    """
    H = O.conj().T @ O
    w, V = eigh_desc(H, reg)
    w0 = jnp.maximum(jax.lax.stop_gradient(w[0]), 1e-300)
    keep = jax.lax.stop_gradient(w) > 1e-24 * w0
    inv_sqrt = jnp.where(keep, jax.lax.rsqrt(jnp.where(keep, w, 1.0)), 0.0)
    W = O @ (V * inv_sqrt[None, :].astype(V.dtype)) @ V.conj().T
    # Guard 1: an ill-conditioned overlap (first sweep against a
    # cold-start basis, or a rank jump between sweeps) would yield a
    # RANK-DEFICIENT W here — zeroed null directions make W^H diag W
    # collapse environment directions and (observed on the RVB state)
    # permanently break exact spectral multiplets.  A gauge rotation may
    # safely degrade to identity for one move; a non-unitary one may not.
    cond_ok = jax.lax.stop_gradient(w[-1]) > 1e-20 * w0
    # Guard 2: TPU's emulated-f64 eigh can emit NaNs on (near-)singular
    # inputs where CPU f64 is clean (observed at D=7).
    ok = jnp.isfinite(W).all() if not jnp.iscomplexobj(W) else (
        jnp.isfinite(W.real).all() & jnp.isfinite(W.imag).all())
    return jnp.where(ok & cond_ok, W, jnp.eye(W.shape[0], dtype=W.dtype))


def procrustes_align(P, P_ref, col_mask=None):
    """Unitary Procrustes alignment of an orthonormal basis onto a
    reference: ``W = argmax_W Re tr(W^H P^H P_ref)`` over unitaries,
    i.e. the unitary polar factor of ``O = P^H P_ref``.

    Unlike per-column phase fixing, this also pins rotations inside
    (near-)degenerate multiplets, which is what makes the CTMRG
    environment an *elementwise* fixed point for states with exact
    spectral degeneracies (SU(2)/C4v multiplets) — the prerequisite for
    implicit differentiation.

    :param col_mask: optional 0/1 vector marking the KEPT columns of
        ``P`` (multiplet-safe truncation zeroes the columns of an
        incomplete multiplet).  The alignment is then made block-diagonal
        w.r.t. the mask — kept columns only mix among themselves and
        masked columns map to themselves — so ``P @ W`` preserves the
        exactly-zero columns.  Without this, aligning a masked projector
        against a full-rank reference (the cold-start basis of the first
        sweep) redistributes the kept subspace over ALL columns,
        desynchronizing C (rank-deficient spectrum) from T (full-rank
        absorption) and permanently splitting the spectral multiplets
        that the truncation protected (observed: m ~ 2e-4 instead of
        1e-16 on the exactly SU(2)-symmetric RVB state).

    :return: ``(P @ W, W)``
    """
    O = P.conj().T @ P_ref
    if col_mask is not None:
        m = jax.lax.stop_gradient(col_mask).astype(O.real.dtype)
        eye = jnp.eye(O.shape[0], dtype=O.dtype)
        O = O * (m[:, None] * m[None, :]) + (1.0 - m)[:, None] * eye
    # ridge toward identity: masked/zero columns of either basis would
    # otherwise make W rank-deficient and the rank loss would propagate
    # through the carried projector (P' = P W) — the ridge completes the
    # null space of the overlap with identity instead.  It also sets a
    # ~2e-12 floor on the elementwise environment residual (measured),
    # well below practical convergence tolerances.
    O = O + 1e-12 * jnp.eye(O.shape[0], dtype=O.dtype)
    W = _polar_unitary_stable(O)
    return P @ W, W


@jax.custom_jvp
def _polar_unitary_stable(O):
    """polar_unitary with a degeneracy-proof derivative.

    The generic eigh-based AD of ``W = O (O^H O)^{-1/2}`` amplifies
    cotangents by ~1/reg^2 when the overlap has exactly degenerate
    singular values (observed: |u|^2 ~ 1e22 after ONE adjoint sweep on
    U(1)/SU(2)-multiplet states, killing the implicit CTMRG adjoint).
    But everywhere this function is differentiated — the implicit
    fixed-point adjoints, where the current projectors are aligned
    against their own converged values — the overlap is (near-)unitary,
    and there the polar factor's derivative has the EXACT closed form

        dW = W . skew(W^H dO),   skew(A) = (A - A^H)/2

    (write O = W H; at H = I the hermitian part of W^H dO feeds dH and
    the skew part feeds W^H dW).  This is perfectly conditioned for any
    degeneracy structure.
    """
    return polar_unitary(O)


@_polar_unitary_stable.defjvp
def _polar_unitary_stable_jvp(primals, tangents):
    (O,), (dO,) = primals, tangents
    W = polar_unitary(O)
    A = W.conj().T @ dO
    dW = W @ ((A - A.conj().T) * 0.5)
    return W, dW


def cholesky_qr(P, eps: float = 0.0):
    """Orthonormalize the columns of a tall matrix via Cholesky-QR.

    Only matmuls + a (k,k) Cholesky + triangular solve — the
    compile-friendly, MXU-friendly QR for tall-skinny matrices.
    """
    k = P.shape[1]
    G = P.conj().T @ P
    if eps:
        G = G + eps * jnp.trace(G).real / k * jnp.eye(k, dtype=G.dtype)
    L = jnp.linalg.cholesky(G)
    # Q = P L^{-H}  <=>  solve Q L^H = P
    Q = jax.lax.linalg.triangular_solve(
        L, P, left_side=False, lower=True, conjugate_a=True, transpose_a=True
    )
    return Q


def cholesky_qr2(P, eps: float = 1.0e-12):
    """Two-pass CholeskyQR — numerically equivalent to Householder QR for
    moderately conditioned inputs; the ridge keeps rank-deficient blocks
    (cold starts, masked multiplets) finite."""
    return cholesky_qr(cholesky_qr(P, eps=eps), eps=eps)


def subspace_eigh(
    M,
    P0,
    n_power: int = 2,
    n_over: int = 8,
    keep_multiplets: bool = True,
    eps_multiplet: float = 1.0e-12,
    ad_decomp_reg: float = 1.0e-12,
):
    """Approximate leading-|lambda| eigenpairs of hermitian ``M`` from a
    warm-start basis ``P0`` (n, chi).

    The working basis is oversampled to ``chi + n_over`` columns so the
    multiplet mask can see the spectrum beyond the cut (a multiplet
    straddling chi must not be split — reference linalg/custom_eig.py:38).

    :return: ``(D, P)`` like :func:`tpeps.linalg.eigh.truncated_eigh_sym`
        — ``D`` (chi,) descending by magnitude (multiplet-masked), ``P``
        (n, chi) orthonormal (masked columns zeroed).
    """
    n, chi = P0.shape
    # masked/zero warm-start columns would make CholeskyQR singular;
    # replace them with deterministic identity columns
    colnorm = jnp.linalg.norm(jax.lax.stop_gradient(P0), axis=0)
    fallback = jnp.eye(n, chi, dtype=P0.dtype)
    P0 = jnp.where(colnorm[None, :] > 1e-12, P0, fallback)
    n_over = min(n_over, n - chi)
    if n_over > 0:
        extra = jnp.eye(n, n_over, k=-chi, dtype=P0.dtype)
        P = jnp.concatenate([P0, extra], axis=1)
    else:
        P = P0
    P = cholesky_qr2(P)
    for _ in range(n_power):
        P = cholesky_qr2(M @ P)
    H = P.conj().T @ (M @ P)
    H = 0.5 * (H + H.conj().T)
    D, U = eigh_desc(H, ad_decomp_reg)
    P = P @ U
    Dt, Pt = D[:chi], P[:, :chi]
    if keep_multiplets:
        mask = multiplet_mask(D, chi, eps_multiplet=eps_multiplet)
        Dt = Dt * mask
        Pt = Pt * mask[None, :]
    # same emulated-f64 guard as polar_unitary: degrade a poisoned
    # decomposition to the (finite) warm-start basis for one move rather
    # than let NaNs reach the environment — CTMRG self-corrects.
    if jnp.iscomplexobj(Pt):
        ok = (jnp.isfinite(Dt).all() & jnp.isfinite(Pt.real).all()
              & jnp.isfinite(Pt.imag).all())
    else:
        ok = jnp.isfinite(Dt).all() & jnp.isfinite(Pt).all()
    Dt = jnp.where(ok, Dt, jnp.ones_like(Dt))
    Pt = jnp.where(ok, Pt, jnp.eye(n, chi, dtype=Pt.dtype))
    return Dt, Pt


def cold_start_basis(n: int, chi: int, dtype):
    """Deterministic full-rank cold-start basis (identity columns)."""
    return jnp.eye(n, chi, dtype=dtype)
