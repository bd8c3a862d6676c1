"""Point-group symmetrization of on-site tensors.

Counterpart of reference groups/pg.py:3-120.  On-site tensor convention
``a[s, u, l, d, r]`` (reference ipeps/ipeps_c4v.py:17-23).  These are
pure jnp ops — differentiable and jittable, used inside loss functions
(the reference symmetrizes inside ``loss_fn`` each evaluation,
examples/j1j2/optim_j1j2_c4v.py:104-110).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_d2_symm(A):
    """Left-right symmetrization (reference pg.py:3-13)."""
    return 0.5 * (A + A.transpose(0, 1, 4, 3, 2))


def make_d2_antisymm(A):
    return 0.5 * (A - A.transpose(0, 1, 4, 3, 2))


def make_c4v_symm_A1(A):
    """Projection on the A1 irrep of C4v (reference pg.py:49-62)."""
    A = 0.5 * (A + A.transpose(0, 1, 4, 3, 2))  # left-right reflection
    A = 0.5 * (A + A.transpose(0, 3, 2, 1, 4))  # up-down reflection
    A = 0.5 * (A + A.transpose(0, 4, 1, 2, 3))  # pi/2 anti-clockwise
    A = 0.5 * (A + A.transpose(0, 2, 3, 4, 1))  # pi/2 clockwise
    return A


def make_c4v_symm_A2(A):
    """Projection on the A2 irrep (reference pg.py:64-77)."""
    A = 0.5 * (A - A.transpose(0, 1, 4, 3, 2))  # sigma
    A = 0.5 * (A - A.transpose(0, 4, 3, 2, 1))  # sigma R^-1
    A = 0.5 * (A + A.transpose(0, 4, 1, 2, 3))  # R
    A = 0.5 * (A + A.transpose(0, 3, 4, 1, 2))  # R^2
    return A


def make_c4v_symm_B1(A):
    """Projection on the B1 irrep (reference pg.py:79-92)."""
    A = 0.5 * (A + A.transpose(0, 1, 4, 3, 2))
    A = 0.5 * (A - A.transpose(0, 4, 3, 2, 1))
    A = 0.5 * (A - A.transpose(0, 4, 1, 2, 3))
    A = 0.5 * (A + A.transpose(0, 3, 4, 1, 2))
    return A


def make_c4v_symm_B2(A):
    """Projection on the B2 irrep (reference pg.py:94-107)."""
    A = 0.5 * (A - A.transpose(0, 1, 4, 3, 2))
    A = 0.5 * (A + A.transpose(0, 4, 3, 2, 1))
    A = 0.5 * (A + A.transpose(0, 4, 1, 2, 3))
    A = 0.5 * (A - A.transpose(0, 3, 4, 1, 2))
    return A


_PROJECTIONS = {
    "A1": make_c4v_symm_A1,
    "A2": make_c4v_symm_A2,
    "B1": make_c4v_symm_B1,
    "B2": make_c4v_symm_B2,
}


def make_c4v_symm(A, irreps=("A1",)):
    """Sum of projections on chosen C4v irreps (reference pg.py:27-47)."""
    irreps = set(irreps)
    assert irreps.issubset(_PROJECTIONS.keys()), "Unknown C4v irrep"
    out = jnp.zeros_like(A)
    for irrep in irreps:
        out = out + _PROJECTIONS[irrep](A)
    return out


def verify_c4v_symm_A1(A, tol: float = 1.0e-8):
    """Check A1 symmetry; returns (is_symmetric, max_deviation)
    (reference pg.py:110-120)."""
    max_d = 0.0
    for p in [(0, 1, 4, 3, 2), (0, 3, 2, 1, 4), (0, 4, 1, 2, 3), (0, 2, 3, 4, 1)]:
        d = float(jnp.linalg.norm(A - A.transpose(p)))
        max_d = max(max_d, d)
    return max_d < tol, max_d
