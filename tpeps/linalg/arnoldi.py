"""Arnoldi / Lanczos partial eigensolvers on jitted matvecs.

TPU-native replacement for the reference's scipy ARPACK usage
(ctm/generic/transferops.py:119-204 wraps torch contractions in a
``LinearOperator`` with a device->numpy copy per matvec;
linalg/eig_arnoldi.py).  Here the Krylov recursion runs fully on device
under ``lax.scan`` (static m steps, MXU-friendly dense matvecs); only
the tiny (m x m) Hessenberg eigenproblem is solved host-side.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _arnoldi_factorization(matvec, v0, m: int):
    """m-step Arnoldi: returns (V[m+1, n], H[m+1, m])."""
    n = v0.shape[0]
    v0 = v0 / jnp.linalg.norm(v0)
    V0 = jnp.zeros((m + 1, n), dtype=v0.dtype).at[0].set(v0)
    H0 = jnp.zeros((m + 1, m), dtype=v0.dtype)

    def step(carry, j):
        V, H = carry
        w = matvec(V[j])
        # modified Gram-Schmidt against all previous vectors (masked)
        def orth(i, state):
            w, H = state
            h = jnp.vdot(V[i], w)
            keep = i <= j
            h = jnp.where(keep, h, 0.0)
            w = w - h * V[i]
            H = H.at[i, j].set(h)
            return (w, H)

        w, H = lax.fori_loop(0, m + 1, orth, (w, H))
        beta = jnp.linalg.norm(w)
        H = H.at[j + 1, j].set(beta.astype(H.dtype))
        w = jnp.where(beta > 1e-300, w / beta, w)
        V = V.at[j + 1].set(w)
        return (V, H), None

    (V, H), _ = lax.scan(step, (V0, H0), jnp.arange(m))
    return V, H


def arnoldi_eigs(matvec, v0, k: int, m: int | None = None):
    """Leading-``|lambda|`` eigenvalues (possibly complex) of a linear map.

    :param matvec: jittable ``v -> A v``
    :param v0: start vector
    :param k: number of eigenvalues
    :param m: Krylov dimension (default ``max(2k+10, 30)``)
    :return: complex eigenvalues sorted by descending magnitude, shape (k,)
    """
    m = m or max(2 * k + 10, 30)
    m = min(m, v0.shape[0])
    V, H = _arnoldi_factorization(jax.jit(matvec), v0, m)
    Hm = np.asarray(H[:m, :m])
    w = np.linalg.eigvals(Hm)
    order = np.argsort(-np.abs(w))
    return w[order][:k]


def arnoldi_eigs_vecs(matvec, v0, k: int, m: int | None = None):
    """Leading eigenpairs: like :func:`arnoldi_eigs` but also returns the
    Ritz vectors (columns), needed by the fixed-point corner method's
    dominant-eigenvector solves (reference fpcm_c4v.py fp_C/fp_T/fp_TT
    use scipy ``truncated_eig_arnoldi``).

    :return: ``(w[k], X[n, k])`` complex, sorted by descending |w|
    """
    m = m or max(2 * k + 10, 30)
    m = min(m, v0.shape[0])
    V, H = _arnoldi_factorization(jax.jit(matvec), v0, m)
    Hm = np.asarray(H[:m, :m])
    w, Y = np.linalg.eig(Hm)
    order = np.argsort(-np.abs(w))
    w, Y = w[order][:k], Y[:, order][:, :k]
    X = np.asarray(V[:m]).T @ Y  # Ritz vectors
    X /= np.linalg.norm(X, axis=0, keepdims=True)
    return w, X


def lanczos_eigsh(matvec, v0, k: int, m: int | None = None):
    """Leading eigenvalues of a hermitian map via the same factorization
    (replacement for scipy ``eigsh``; reference linalg/eig_arnoldi.py:10)."""
    m = m or max(2 * k + 10, 30)
    m = min(m, v0.shape[0])
    V, H = _arnoldi_factorization(jax.jit(matvec), v0, m)
    Hm = np.asarray(H[:m, :m])
    Hm = 0.5 * (Hm + Hm.conj().T)
    w = np.linalg.eigvalsh(Hm)
    order = np.argsort(-np.abs(w))
    return w[order][:k]
