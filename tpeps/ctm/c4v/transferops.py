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

    # random start: a structured start can be orthogonal to
    # symmetry-odd eigenvectors and silently skip levels
    rng = np.random.RandomState(1234)
    v0 = jnp.asarray(rng.rand(chi * D2 * chi) - 0.5, dtype=a.dtype)
    w = arnoldi_eigs(matvec, v0, n, m=m)
    if normalize:
        w = w / np.abs(w[0])
    return jnp.asarray(np.stack([w.real, w.imag], axis=1))


def get_EH_spec_Ttensor_c4v(n, L, a, env: EnvC4v, m: int | None = None):
    """Entanglement-Hamiltonian spectrum of a width-L cylinder in the
    C4v setting (reference transferops_c4v.py:119-221), via the generic
    evaluator over the expanded single-site environment."""
    from ..generic.transferops import get_EH_spec_Ttensor
    from .env import env_c4v_to_generic

    sites, site_of, C, T = env_c4v_to_generic(a, env)

    class _St:
        lX = lY = 1

        def site(self, coord=(0, 0)):
            return a

        vertexToSite = staticmethod(site_of)

    class _Env:
        chi = env.C.shape[0]

    _e = _Env()
    _e.C, _e.T = C, T
    return get_EH_spec_Ttensor(n, L, (0, 0), (1, 0), _St(), _e, m=m)


def get_Top2_spec_c4v(n: int, a, env: EnvC4v, normalize: bool = True,
                      m: int | None = None):
    """Leading ``n`` eigenvalues of the WIDTH-2 transfer operator
    (reference transferops_c4v.py:70-118)."""
    from .corrf import apply_TM_1sO_2

    chi = env.chi
    D2 = a.shape[1] ** 2
    shape = (chi, D2, D2, chi)

    def matvec(v):
        return apply_TM_1sO_2(a, env, v.reshape(shape)).ravel()

    rng = np.random.RandomState(1234)
    v0 = jnp.asarray(rng.rand(chi * D2 * D2 * chi) - 0.5, dtype=a.dtype)
    w = arnoldi_eigs(matvec, v0, n, m=m)
    if normalize:
        w = w / np.abs(w[0])
    return jnp.asarray(np.stack([w.real, w.imag], axis=1))
