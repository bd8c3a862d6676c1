"""Fixed-Point Corner Method for the 1-site C4v CTMRG.

Counterpart of reference ctm/one_site_c4v/fpcm_c4v.py:17-340 (Fishman
et al. PRB 98, 235148 style): instead of iterating absorption moves, the
environment is obtained from fixed-point equations —

1. ``isogauge_mps``: solve the pulling-through condition
   ``C T = U C`` for the gauge ``C`` and the isometry ``U`` (dominant
   eigenvector of the T-transfer map + iterated left polar
   decompositions),
2. ``fp_T``: the edge tensor is the dominant eigenvector of the channel
   map ``B -> U^H (B a a*) U`` (one CTMRG absorption with the *fixed*
   isometry),
3. outer loop 1-2 until T stops changing, then ``fp_C``: the corner is
   the dominant eigenvector of ``B -> U^T c2x2(a, B, T) U``.

Dominant eigenvectors come from the on-device Arnoldi
(:func:`tpeps.linalg.arnoldi.arnoldi_eigs_vecs`).  No backward support
— like the reference (ctmrg_c4v.py:43-46), FPCM is a no-grad
convergence accelerator; gradients use the standard moves.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...linalg.arnoldi import arnoldi_eigs_vecs
from .ctmrg import _absorb_T, c2x2_sl
from .env import EnvC4v


def polar_decomp_left(M, normalize: bool = False):
    """``M = U' P`` with ``U'`` an isometry, ``P`` hermitian PSD
    (reference fpcm_c4v.py:246-253).  Returns ``(P, U')``."""
    U, S, Vh = jnp.linalg.svd(M, full_matrices=False)
    if normalize:
        S = S / S[0]
    P = (Vh.conj().T * S[None, :]) @ Vh
    return P, U @ Vh


def pull_through(C, T):
    """Solve ``C T ~ U C`` by one left polar decomposition
    (reference fpcm_c4v.py:255-268).  ``T`` layout (chi, chi, D^2);
    returns ``(P, U)`` with ``U`` in the same layout."""
    chi, D2 = T.shape[1], T.shape[2]
    CT = jnp.tensordot(C, T, ((1,), (0,)))        # (c0, t1, D2)
    CT = CT.transpose(0, 2, 1).reshape(C.shape[0] * D2, chi)
    P, U = polar_decomp_left(CT, normalize=True)
    U = U.reshape(C.shape[0], D2, chi).transpose(0, 2, 1)  # (chi, chi, D2)
    return P, U


def _dominant_vec(matvec, v0, m=30):
    w, X = arnoldi_eigs_vecs(matvec, v0, 1, m=m)
    x = X[:, 0]
    # rotate the (defined-up-to-phase) eigenvector to the real axis
    i = np.argmax(np.abs(x))
    x = x * (np.conj(x[i]) / abs(x[i]))
    assert abs(np.asarray(x).imag).max() < 1e-10 * max(1.0, abs(np.asarray(x).real).max()), \
        "dominant eigenvector is not real after phase rotation"
    return jnp.asarray(np.asarray(x).real), w[0]


def fp_TT(T, U=None, C2_0=None):
    """Dominant eigenvector of the (mixed) MPS transfer map
    ``B -> U^T_{0,2} (B T)`` (reference fpcm_c4v.py:218-245)."""
    if U is None:
        U = T
    chi = T.shape[0]

    def mv(v):
        B = v.reshape(chi, chi)
        B = jnp.tensordot(B, T, ((1,), (0,)))       # (b0, t1, D2)
        B = jnp.tensordot(U, B, ((0, 2), (0, 2)))   # (u1, t1)
        return B.reshape(-1)

    v0 = (C2_0.reshape(-1) if C2_0 is not None
          else jnp.asarray(np.random.RandomState(7).rand(chi * chi) - 0.5, dtype=T.dtype))
    x, _ = _dominant_vec(mv, v0)
    return x.reshape(chi, chi)


def isogauge_mps(T, C0=None, isogauge_tol=1e-8, max_iter=50):
    """Iso-gauge the edge MPS: returns ``(C, U)`` satisfying the
    pulling-through equation (reference fpcm_c4v.py:270-340)."""
    nC2 = fp_TT(T, C2_0=(C0 @ C0 if C0 is not None else None))
    nC2 = 0.5 * (nC2 + nC2.T)
    D, Uc = jnp.linalg.eigh(nC2)
    order = jnp.argsort(-jnp.abs(D))
    D, Uc = D[order], Uc[:, order]
    D = jnp.where(D[0] < 0, -D, D)
    assert float(D.min() / D[0]) > -1e-12, "transfer fixed point not positive"
    D = jnp.clip(D, 0.0, None)
    nC = (Uc * jnp.sqrt(D / D[0])[None, :]) @ Uc.T

    P, U = pull_through(nC, T)
    e0 = float(jnp.linalg.norm(nC - P)) / max(nC.shape)
    it = 0
    while e0 > isogauge_tol and it < max_iter:
        nC = fp_TT(T, U=U, C2_0=nC)
        nC, _Q = polar_decomp_left(nC, normalize=True)
        P, U = pull_through(nC, T)
        e0 = float(jnp.linalg.norm(nC - P))
        it += 1
    return nC, U


def fp_T(a, U, T0=None):
    """Dominant eigenvector of the channel map ``B -> U^H (B a a*) U``
    (reference fpcm_c4v.py:130-217) — one edge absorption with a fixed
    isometry, evaluated by the validated :func:`_absorb_T`."""
    chi = U.shape[0]
    D = a.shape[1]
    U4 = U.transpose(0, 2, 1).reshape(chi, D, D, chi)

    def mv(v):
        B = v.reshape(chi, chi, D * D)
        return _absorb_T(a, B, U4).reshape(-1)

    v0 = (T0.reshape(-1) if T0 is not None
          else jnp.asarray(np.random.RandomState(11).rand(chi * chi * D * D) - 0.5,
                           dtype=a.dtype))
    x, _ = _dominant_vec(mv, v0)
    return x.reshape(chi, chi, D * D)


def fp_C(a, T, U, C0=None):
    """Dominant eigenvector of ``B -> U^T c2x2(a, B, T) U``
    (reference fpcm_c4v.py:74-129)."""
    chi = U.shape[0]
    D2 = U.shape[2]
    P_loc = U.transpose(0, 2, 1).reshape(chi * D2, chi)

    def mv(v):
        B = v.reshape(chi, chi)
        M = c2x2_sl(a, B, T)
        return (P_loc.conj().T @ (M @ P_loc)).reshape(-1)

    v0 = (C0.reshape(-1) if C0 is not None
          else jnp.asarray(np.random.RandomState(13).rand(chi * chi) - 0.5, dtype=a.dtype))
    x, _ = _dominant_vec(mv, v0)
    return x.reshape(chi, chi)


def fpcm_move_sl(a, env: EnvC4v, fpcm_tol=1e-8, isogauge_tol=1e-8, max_outer=50):
    """One FPCM update (reference ``fpcm_MOVE_sl``, fpcm_c4v.py:17-71):
    alternate iso-gauging and the T fixed point until T stops changing,
    then solve the corner fixed point.  Returns a new :class:`EnvC4v`.
    """
    C, T = env.C, env.T
    e0 = np.inf
    Tp, Cp, U = T, C, None
    it = 0
    while e0 > fpcm_tol and it < max_outer:
        Cp, U = isogauge_mps(Tp, C0=Cp, isogauge_tol=isogauge_tol)
        Tn = fp_T(a, U, T0=Tp)
        Tn = 0.5 * (Tn + Tn.transpose(1, 0, 2))
        e0 = float(jnp.linalg.norm(Tn - Tp)) / max(Tn.shape)
        Tp = Tn
        it += 1
    nC = fp_C(a, Tp, U, C0=Cp)
    nC = 0.5 * (nC + nC.T)
    nC = nC / jnp.abs(nC).max()
    Tp = Tp / jnp.abs(Tp).max()
    return EnvC4v(nC, Tp)
