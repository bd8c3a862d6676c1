"""Transfer-operator spectra (reference ctm/generic/transferops.py:119-519).

Leading eigenvalues of the width-1 channel transfer operator

    T(-1,0) -- aa*(r) -- T(1,0)    (column-to-column map on [chi, D^2, chi])

computed with the on-device Arnoldi of :mod:`tpeps.linalg.arnoldi`
instead of scipy ARPACK (which would copy device->host per matvec,
reference transferops.py:173-190).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...linalg.arnoldi import arnoldi_eigs
from .corrf import apply_TM_1sO


def get_Top_spec(n: int, coord, direction, state, env, m: int | None = None):
    """Leading ``n`` eigenvalues of the transfer operator in ``direction``
    normalized by the dominant one; returned as an (n, 2) array of
    (re, im) pairs like the reference (transferops.py:119-204)."""
    sites, site_of = state.sites, state.vertexToSite
    c = site_of(coord)
    a = sites[c]
    chi = env.chi
    if direction == (1, 0):
        D2 = a.shape[2] ** 2
    elif direction == (0, 1):
        D2 = a.shape[1] ** 2
    else:
        raise NotImplementedError(f"direction {direction}")
    shape = (chi, D2, chi)
    size = chi * D2 * chi

    # number of sites the channel passes through before repeating
    L = state.lX if direction == (1, 0) else state.lY

    def matvec(v):
        E = v.reshape(shape)
        cc = coord
        for i in range(L):
            E = apply_TM_1sO(cc, direction, sites, site_of, env.C, env.T, E)
            cc = (cc[0] + direction[0], cc[1] + direction[1])
        return E.ravel()

    key_v0 = jnp.ones((size,), dtype=a.dtype)
    w = arnoldi_eigs(matvec, key_v0, n, m=m)
    w = w / np.abs(w[0])
    return jnp.asarray(np.stack([w.real, w.imag], axis=1))
