"""Transfer-operator spectra for the C4v iPEPS
(counterpart of reference ctm/one_site_c4v/transferops_c4v.py:10-221),
using the on-device Arnoldi instead of scipy ARPACK."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...linalg.arnoldi import arnoldi_eigs
from .corrf import apply_TM_1sO
from .env import EnvC4v


def get_Top_spec_c4v(n: int, a, env: EnvC4v, normalize: bool = True, m: int | None = None):
    """Leading ``n`` eigenvalues of the width-1 transfer operator,
    returned as (n, 2) (re, im) pairs (reference transferops_c4v.py:10-69)."""
    chi = env.chi
    D2 = a.shape[1] ** 2
    shape = (chi, D2, chi)

    def matvec(v):
        return apply_TM_1sO(a, env, v.reshape(shape)).ravel()

    v0 = jnp.ones((chi * D2 * chi,), dtype=a.dtype)
    w = arnoldi_eigs(matvec, v0, n, m=m)
    if normalize:
        w = w / np.abs(w[0])
    return jnp.asarray(np.stack([w.real, w.imag], axis=1))
