"""Unit tests for the AD-stable decompositions.

Ports the correctness contract of the reference's inline linalg
self-tests (linalg/svd_gesdd.py:588-658 ``test_SVDGESDD_random``,
linalg/eig_sym.py:80-114 ``test_SYMEIG_*``): gradients must stay finite
and FD-consistent on random, rank-deficient and degenerate-spectrum
inputs.
"""

import numpy as np
import pytest

import tpeps  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp

from tpeps.linalg import eigh_desc, multiplet_mask, rsvd, svd_reg, truncated_eigh_sym, truncated_svd


def _rand_sym(n, seed=0):
    rng = np.random.RandomState(seed)
    m = rng.rand(n, n) - 0.5
    return jnp.asarray(0.5 * (m + m.T))


class TestEighDesc:
    def test_reconstruction_and_order(self):
        A = _rand_sym(20)
        D, U = eigh_desc(A)
        assert np.allclose(np.asarray(U @ jnp.diag(D) @ U.T), np.asarray(A), atol=1e-12)
        absD = np.abs(np.asarray(D))
        assert (np.diff(absD) <= 1e-12).all()

    def test_vjp_fd(self):
        A = _rand_sym(8, seed=3)
        M = jnp.asarray(np.random.RandomState(5).rand(8, 8))

        def loss(A_):
            D, U = eigh_desc(0.5 * (A_ + A_.T))
            # gauge-invariant loss
            return jnp.sum(D[:4] ** 2) + jnp.sum((U[:, :4] @ U[:, :4].T) * M)

        g = jax.grad(loss)(A)
        eps = 1e-6
        rng = np.random.RandomState(7)
        for _ in range(3):
            v = rng.rand(8, 8) - 0.5
            v = 0.5 * (v + v.T)
            fd = (loss(A + eps * v) - loss(A - eps * v)) / (2 * eps)
            an = jnp.sum(g * v)
            assert abs(float(fd - an)) < 1e-5 * max(1.0, abs(float(fd)))

    def test_degenerate_grad_finite(self):
        """Degenerate spectrum: built-in eigh JVP produces NaN, ours must not
        (the arXiv:1903.09650 regularization, reference eig_sym.py:56-78)."""
        d = jnp.asarray([3.0, 2.0, 2.0, 2.0, 1.0, 1e-15, 0.0, 0.0])
        rng = np.random.RandomState(11)
        q, _ = np.linalg.qr(rng.rand(8, 8))
        A = jnp.asarray(q) @ jnp.diag(d) @ jnp.asarray(q).T
        A = 0.5 * (A + A.T)

        def loss(A_):
            D, U = eigh_desc(A_)
            P = U[:, :4]
            return jnp.sum((P @ P.T) * A_) + jnp.sum(D[:4])

        g = jax.grad(loss)(A)
        assert np.isfinite(np.asarray(g)).all()


class TestMultipletMask:
    def test_clean_gap(self):
        D = jnp.asarray([4.0, 3.0, 2.0, 1.0, 0.5])
        mask = multiplet_mask(D, 3, eps_multiplet=1e-6)
        assert np.allclose(np.asarray(mask), [1, 1, 1])

    def test_split_multiplet_masked(self):
        """Cut at chi=3 splits the (2,2) doublet -> pull cut back to 2."""
        D = jnp.asarray([4.0, 3.0, 2.0, 2.0, 0.5])
        mask = multiplet_mask(D, 3, eps_multiplet=1e-6)
        assert np.allclose(np.asarray(mask), [1, 1, 0])

    def test_all_degenerate_keeps_everything(self):
        D = jnp.asarray([2.0, 2.0, 2.0, 2.0, 2.0])
        mask = multiplet_mask(D, 3, eps_multiplet=1e-6)
        # no clean gap found: reference keeps the full chi block
        # (custom_eig.py:50-57 leaves chi_new=chi)
        assert np.allclose(np.asarray(mask), [1, 1, 1])


class TestSVD:
    def test_reconstruction(self):
        A = jnp.asarray(np.random.RandomState(0).rand(12, 8) - 0.5)
        U, S, Vh = svd_reg(A)
        assert np.allclose(np.asarray(U @ jnp.diag(S) @ Vh), np.asarray(A), atol=1e-12)

    def test_truncated_shapes(self):
        A = jnp.asarray(np.random.RandomState(0).rand(12, 8) - 0.5)
        U, S, V = truncated_svd(A, 5)
        assert U.shape == (12, 5) and S.shape == (5,) and V.shape == (8, 5)
        # truncation larger than rank pads with zeros
        U, S, V = truncated_svd(A, 10)
        assert U.shape == (12, 10) and float(S[9]) == 0.0

    def test_vjp_fd(self):
        rng = np.random.RandomState(2)
        A = jnp.asarray(rng.rand(9, 7) - 0.5)
        M1 = jnp.asarray(rng.rand(9, 9))
        M2 = jnp.asarray(rng.rand(7, 7))

        def loss(A_):
            U, S, V = truncated_svd(A_, 4, fix_signs=True)
            return jnp.sum(S**2) + jnp.sum((U @ U.T) * M1) + jnp.sum((V @ V.T) * M2)

        g = jax.grad(loss)(A)
        eps = 1e-6
        for _ in range(3):
            v = rng.rand(9, 7) - 0.5
            fd = (loss(A + eps * v) - loss(A - eps * v)) / (2 * eps)
            an = jnp.sum(g * v)
            assert abs(float(fd - an)) < 1e-5 * max(1.0, abs(float(fd)))

    def test_degenerate_grad_finite(self):
        rng = np.random.RandomState(4)
        q1, _ = np.linalg.qr(rng.rand(8, 8))
        q2, _ = np.linalg.qr(rng.rand(8, 8))
        s = np.array([3.0, 2.0, 2.0, 2.0, 1.0, 1e-14, 0.0, 0.0])
        A = jnp.asarray(q1 @ np.diag(s) @ q2.T)

        def loss(A_):
            U, S, V = truncated_svd(A_, 4, fix_signs=False)
            return jnp.sum(S)

        g = jax.grad(loss)(A)
        assert np.isfinite(np.asarray(g)).all()


class TestRSVD:
    def test_matches_truncated_svd(self):
        """Randomized SVD on a fast-decaying spectrum ~ exact truncated SVD
        (replacement for ARPACK/PROPACK, reference linalg/svd_rsvd.py)."""
        rng = np.random.RandomState(0)
        q1, _ = np.linalg.qr(rng.rand(40, 40))
        q2, _ = np.linalg.qr(rng.rand(30, 30))
        s = np.exp(-np.arange(30))
        A = jnp.asarray(q1[:, :30] @ np.diag(s) @ q2.T)
        key = jax.random.PRNGKey(0)
        U, S, V = rsvd(key, A, 8, n_iter=3)
        assert np.allclose(np.asarray(S), s[:8], rtol=1e-8)


def test_svd_reg_complex_grad():
    """svd_reg's AD must be correct for COMPLEX matrices (the previous
    hand-ported torch backward was real-only correct: torch and jax use
    different complex cotangent conventions).  FD check on a
    projector-style loss, real + complex + rectangular."""
    import numpy as np

    from tpeps.linalg.svd import svd_reg, truncated_svd

    rng = np.random.default_rng(5)

    def loss_proj(A):
        U, S, Vh = truncated_svd(A, 3)
        P = (A @ jnp.conj(U)) * jax.lax.rsqrt(S)[None, :]
        M = jnp.asarray(np.arange(A.shape[0] ** 2,
                                  dtype=float).reshape(A.shape[0], -1))
        return jnp.real(jnp.trace(P.conj().T @ M @ P))

    def loss_trunc(A):
        U, S, Vh = svd_reg(A, 1e-12)
        At = (U[:, :3] * S[:3][None, :]) @ Vh[:3]
        return jnp.real(jnp.sum(jnp.abs(At) ** 2))

    cases = [
        ("real", jnp.asarray(rng.standard_normal((6, 6)))),
        ("complex", jnp.asarray(rng.standard_normal((6, 6))
                                + 1j * rng.standard_normal((6, 6)))),
    ]
    for label, A0 in cases:
        for loss in (loss_proj, loss_trunc):
            val, grad = jax.value_and_grad(loss)(A0)
            for (i, j) in [(0, 0), (1, 2), (3, 4)]:
                eps = 1e-6
                dA = jnp.zeros_like(A0).at[i, j].set(eps)
                fd = (float(loss(A0 + dA)) - float(loss(A0 - dA))) / (2 * eps)
                assert abs(fd - float(jnp.real(grad[i, j]))) < 1e-5, label
                if jnp.iscomplexobj(A0):
                    dAi = jnp.zeros_like(A0).at[i, j].set(1j * eps)
                    fdi = (float(loss(A0 + dAi))
                           - float(loss(A0 - dAi))) / (2 * eps)
                    # jax convention: grad = dL/dz, so d/d(Im) = -Im(g)
                    assert abs(fdi + float(jnp.imag(grad[i, j]))) < 1e-5, label
