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

    # seeded random start (matches ctm/c4v/transferops.py:27-28): a
    # structured start can be exactly orthogonal to symmetry-odd
    # eigenvectors and silently skip transfer-spectrum levels
    rng = np.random.RandomState(1234)
    v0 = jnp.asarray(rng.rand(size) - 0.5, dtype=a.dtype)
    w = arnoldi_eigs(matvec, v0, n, m=m)
    w = w / np.abs(w[0])
    return jnp.asarray(np.stack([w.real, w.imag], axis=1))


_DIR_TO_IND = {(0, -1): 1, (-1, 0): 2, (0, 1): 3, (1, 0): 4}


def _eh_T(state, env, c, d):
    """Environment T tensor reshaped to [chi, chi, D, D] with the two
    bond-facing legs split (reference transferops.py:283-305)."""
    chi = env.chi
    D = state.site(c).shape[_DIR_TO_IND[d]]
    T = env.T[(state.vertexToSite(c), d)]
    if d == (0, -1):
        return T.transpose(0, 2, 1).reshape(chi, chi, D, D)
    if d == (-1, 0):
        return T.reshape(chi, chi, D, D)
    if d == (0, 1):
        return T.transpose(1, 2, 0).reshape(chi, chi, D, D)
    if d == (1, 0):
        return T.transpose(0, 2, 1).reshape(chi, chi, D, D)
    raise ValueError(d)


def get_EH_spec_Ttensor(n, L, coord, direction, state, env, m=None):
    """Leading spectrum of exp(-H_ent) of a width-``L`` cylinder,
    approximating the left/right fixed points sigma_L/sigma_R by MPOs of
    environment T tensors (reference transferops.py:207-372).

    The matvec applies sigma(direction) then sigma(opposite) to a
    D^L vector with periodic closure.

    :return: (n, 2) array of (re, im), normalized by the leading value
    """
    import numpy as np

    assert L > 1, "L must be larger than 1"
    assert state.lX == state.lY == 1, "only single-site unit cells supported"
    ind = _DIR_TO_IND[direction]
    d_grow = {1: (-1, 0), 2: (0, 1), 3: (1, 0), 4: (0, -1)}[ind]
    d_opp = (-direction[0], -direction[1])
    D = state.site(coord).shape[ind]
    size = D**L
    if size <= n:
        return None

    def mv_sigma(V, d_sigma):
        # V[i0..i_{L-1}]; thread chi along the T chain, close periodically
        c = state.vertexToSite(coord)
        T = _eh_T(state, env, c, d_sigma)  # [chi_up, chi_dn, D_out, D_in]
        # first T: open both chi legs
        V = jnp.tensordot(T, V, ((3,), (0,)))  # [u, d, o0, i1..i_{L-1}]
        for i in range(1, L - 1):
            c = (c[0] + d_grow[0], c[1] + d_grow[1])
            T = _eh_T(state, env, c, d_sigma)
            # V layout: [u0, d_prev, o0..o_{i-1}, i_i, i_{i+1}..]; contract
            # T's chi_up with d_prev and T's D_in with i_i (axis 2+i)
            V = jnp.tensordot(T, V, ((0, 3), (1, 2 + i)))
            # result: [d, o_i, u0, o0..o_{i-1}, i_{i+1}..]
            # -> [u0, d, o0..o_i, i_{i+1}..]
            perm = [2, 0] + list(range(3, 3 + i)) + [1] + list(range(3 + i, L + 2))
            V = V.transpose(perm)
        c = (c[0] + d_grow[0], c[1] + d_grow[1])
        T = _eh_T(state, env, c, d_sigma)
        # close: T chi_up with V's d, T chi_dn with V's u0 (PBC), D_in with
        # the last remaining input leg (axis L+1)
        V = jnp.tensordot(T, V, ((0, 1, 3), (1, 0, L + 1)))
        # V = [o_{L-1}, o0..o_{L-2}] -> [o0..o_{L-1}]
        V = V.transpose(list(range(1, L)) + [0])
        return V

    def matvec(v):
        V = v.reshape((D,) * L)
        V = mv_sigma(V, direction)
        V = mv_sigma(V, d_opp)
        return V.reshape(-1)

    from ...linalg.arnoldi import arnoldi_eigs

    # random start: a structured start (e.g. all-ones) can be exactly
    # orthogonal to symmetry-odd eigenvectors and silently skip levels
    rng = np.random.RandomState(1234)
    dtype = env.C[(state.vertexToSite(coord), (-1, -1))].dtype
    v0 = jnp.asarray(rng.rand(size) - 0.5, dtype=dtype)
    vals = np.asarray(arnoldi_eigs(matvec, v0, n, m=m))
    vals = vals / np.abs(vals[0])
    return np.stack([vals.real, vals.imag], axis=1)


def get_full_EH_spec_Ttensor(L, coord, direction, state, env):
    """FULL spectrum of the approximate exp(-H_ent) of a width-``L``
    cylinder (reference transferops.py:373-520
    ``get_full_EH_spec_Ttensor``): sigma_L/sigma_R are approximated by
    dense MPO chains of environment T tensors with periodic closure and
    the product is fully diagonalized — exact counterpart of the
    iterative :func:`get_EH_spec_Ttensor` for small ``D**L``.

    :return: complex eigenvalues of sigma(direction) . sigma(opposite),
        sorted by magnitude and normalized by the leading one
    """
    import numpy as np

    ind = _DIR_TO_IND[direction]
    d_grow = {1: (-1, 0), 2: (0, 1), 3: (1, 0), 4: (0, -1)}[ind]
    d_opp = (-direction[0], -direction[1])
    D = state.site(coord).shape[ind]

    def sigma_dense(d_sigma):
        c = state.vertexToSite(coord)
        S = _eh_T(state, env, c, d_sigma)  # [chi_u, chi_d, D_out, D_in]
        for k in range(1, L):
            c = state.vertexToSite((c[0] + d_grow[0], c[1] + d_grow[1]))
            Tk = _eh_T(state, env, c, d_sigma)
            # S axes: [u, o0..o_{k-1}, i0..i_{k-1}, d_new, o_k, i_k]
            S = jnp.tensordot(S, Tk, ((1,), (0,)))
            perm = ([0, 2 * k + 1] + list(range(1, k + 1)) + [2 * k + 2]
                    + list(range(k + 1, 2 * k + 1)) + [2 * k + 3])
            S = S.transpose(perm)  # [u, d, o0..o_k, i0..i_k]
        S = jnp.trace(S, axis1=0, axis2=1)  # PBC closure
        return S.reshape(D**L, D**L)

    M = sigma_dense(direction) @ sigma_dense(d_opp)
    vals = np.linalg.eigvals(np.asarray(M))
    order = np.argsort(-np.abs(vals))
    vals = vals[order]
    return vals / np.abs(vals[0])
