"""Block-sparse CTM projectors (reference
ctm/generic_abelian/ctm_projectors.py:159-294).

Same Corboz construction as the dense
:mod:`tpeps.ctm.generic.projectors` — ``M = R^T Rt = U S V^H`` truncated
to chi, ``P = R U* S^{-1/2}``, ``Pt = Rt V S^{-1/2}`` — but the SVD is
per charge sector with a *global* cross-sector cut
(:func:`tpeps.sym.tensor.svd_blockwise`), multiplet-safe at the
boundary.  P/Pt are rank-4: (chi, Dket, Dbra, chi_new).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...sym.tensor import svd_blockwise
from .components import HALVES


def _scale_new_leg(t, vecs):
    """Multiply blocks along the last (SVD) leg by per-sector vectors."""
    blocks = {}
    for qs, b in t.blocks.items():
        v = vecs[qs[-1]]
        blocks[qs] = b * v.reshape((1,) * (b.ndim - 1) + (-1,))
    return t.copy_with(blocks)


def _rsqrt(s):
    xp = np if isinstance(s, np.ndarray) else jnp
    return 1.0 / xp.sqrt(s)


def projectors_from_halves(
    R,
    Rt,
    chi: int,
    svd_reltol: float = 1.0e-8,
    eps_multiplet: float = 1.0e-8,
    **_unused,
):
    """(P, Pt) from the two rank-6 half-system tensors joined through
    their row triples."""
    M = R.tensordot(Rt, ((0, 1, 2), (0, 1, 2)))  # (R-cols, Rt-cols)
    U, S, V = svd_blockwise(
        M, (0, 1, 2), (3, 4, 5), chi=chi,
        reltol=svd_reltol, eps_multiplet=eps_multiplet,
    )
    isq = {q: _rsqrt(s) for q, s in S.items()}
    P = _scale_new_leg(R.tensordot(U.conj(), ((3, 4, 5), (0, 1, 2))), isq)
    Vd = V.conj().transpose((1, 2, 3, 0))
    Pt = _scale_new_leg(Rt.tensordot(Vd, ((3, 4, 5), (0, 1, 2))), isq)
    return P, Pt


def ctm_get_projectors(direction, coord, state, env, chi: int, **kwargs):
    """4x4 projectors for a directional move at ``coord``."""
    R, Rt = HALVES[direction](coord, state, env)
    return projectors_from_halves(R, Rt, chi, **kwargs)
