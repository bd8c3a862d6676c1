"""Correlation functions for the 1-site C4v iPEPS
(counterpart of reference ctm/one_site_c4v/corrf_c4v.py:5-807)."""

from __future__ import annotations

import jax.numpy as jnp

from .env import EnvC4v


def get_edge(env: EnvC4v):
    """Initial boundary edge C-T-C, ``[chi, D^2, chi]``
    (reference corrf_c4v.py:4-27)."""
    C, T = env
    E = jnp.einsum("xy,xbm->ybm", C, T)
    return jnp.einsum("ybm,bw->ymw", E, C)


def _aXa(a, op=None):
    d = a.shape
    a_op = a if op is None else jnp.einsum("mefgh,mn->nefgh", a, op)
    A = jnp.einsum("nefgh,nabcd->eafbgchd", a_op, jnp.conj(a))
    return A.reshape(d[1] ** 2, d[2] ** 2, d[3] ** 2, d[4] ** 2)


def apply_TM_1sO(a, env: EnvC4v, edge, op=None):
    """Apply one transfer-matrix column to ``edge[chi, D^2, chi]``
    (reference corrf_c4v.py:178-271)."""
    T = env.T
    A = _aXa(a, op)
    E = jnp.einsum("tlb,qtu->lbqu", edge, T)
    E = jnp.einsum("lbqu,uldr->bqdr", E, A)
    return jnp.einsum("bqdr,bwd->qrw", E, T)


def apply_edge(env: EnvC4v, vec):
    """Contract ``vec`` with the closing C-T-C edge
    (reference corrf_c4v.py:57-86)."""
    C, T = env
    S = jnp.einsum("vmw,vx->mwx", vec, C)
    S = jnp.einsum("mwx,bxm->wb", S, T)
    return jnp.einsum("wb,bw->", S, C)


def corrf_1sO1sO(a, env: EnvC4v, op1, get_op2, dist: int):
    """<O1(0) O2(r)> for r in [0, dist] (reference corrf_c4v.py:309-380)."""
    E0 = get_edge(env)
    E1 = apply_TM_1sO(a, env, E0, op=op1)
    E0 = apply_TM_1sO(a, env, E0)
    out = []
    for r in range(dist + 1):
        E12 = apply_TM_1sO(a, env, E1, op=get_op2(r))
        E0 = apply_TM_1sO(a, env, E0)
        E1 = apply_TM_1sO(a, env, E1)
        num = apply_edge(env, E12)
        den = apply_edge(env, E0)
        out.append(num / den)
        scale = jnp.abs(E0).max()
        E0 = E0 / scale
        E1 = E1 / scale
    return jnp.stack(out)


def apply_TM_2sO(a, env: EnvC4v, edge, op2=None):
    """Apply TWO consecutive transfer columns with an (optional) 2-site
    operator spanning them (reference corrf_c4v.py:87-177
    ``apply_TM_2sO``; the gate is SVD-split into a sum of one-site
    operator pairs — exact at these physical dimensions)."""
    if op2 is None:
        return apply_TM_1sO(a, env, apply_TM_1sO(a, env, edge))
    from ..generic.corrf import _split_op2

    o1s, o2s = _split_op2(op2, a.shape[0])
    out = None
    for k in range(o1s.shape[0]):
        E = apply_TM_1sO(a, env, edge, op=o1s[k])
        E = apply_TM_1sO(a, env, E, op=o2s[k])
        out = E if out is None else out + E
    return out


def corrf_2sOH2sOH_E1(a, env: EnvC4v, op1, get_op2, dist: int):
    """<O1(0,1) O2(r,r+1)> of horizontally-oriented 2-site operators
    along the channel (reference corrf_c4v.py:381-460); values for
    r in [1, dist] — op2 is applied after at least one plain column."""
    E0 = get_edge(env)
    E1 = apply_TM_2sO(a, env, E0, op2=op1)
    E0 = apply_TM_2sO(a, env, E0)
    out = []
    for _r in range(dist):
        E12 = apply_TM_2sO(a, env, E1, op2=get_op2(_r))
        E0n = apply_TM_2sO(a, env, E0)
        num = apply_edge(env, E12)
        den = apply_edge(env, E0n)
        out.append(num / den)
        E0 = apply_TM_1sO(a, env, E0)
        E1 = apply_TM_1sO(a, env, E1)
        scale = jnp.abs(E0).max()
        E0 = E0 / scale
        E1 = E1 / scale
    return jnp.stack(out)


def get_edge2(env: EnvC4v):
    """Width-2 boundary edge C-T-T-C, ``[chi, D^2, D^2, chi]``
    (reference corrf_c4v.py:28-56)."""
    C, T = env
    E = jnp.einsum("xy,xbm->ybm", C, T)
    E = jnp.einsum("ybm,bwz->ymzw", E, T)
    return jnp.einsum("ymzw,wv->ymzv", E, C)


def corrf_2sOV2sOV_E2(a, env: EnvC4v, op1, get_op2, dist: int):
    """<O1(0) O2(r)> of vertically-oriented 2-site operators along the
    channel (reference corrf_c4v.py:461-540): a width-2 transfer channel
    with the dimer operators inside single columns; values for
    r in [0, dist]."""
    E0 = get_edge2(env)
    cap = get_edge2(env)
    E1 = apply_TM_1sO_2(a, env, E0, op2=op1)
    E0 = apply_TM_1sO_2(a, env, E0)
    out = []
    for _r in range(dist + 1):
        E12 = apply_TM_1sO_2(a, env, E1, op2=get_op2(_r))
        E0 = apply_TM_1sO_2(a, env, E0)
        E1 = apply_TM_1sO_2(a, env, E1)
        num = jnp.einsum("abcd,abcd->", E12, cap)
        den = jnp.einsum("abcd,abcd->", E0, cap)
        out.append(num / den)
        scale = jnp.abs(E0).max()
        E0 = E0 / scale
        E1 = E1 / scale
    return jnp.stack(out)


def apply_TM_1sO_2(a, env: EnvC4v, edge, op2=None):
    """Grow the WIDTH-2 C4v channel by one column (T, a, a, T), with an
    optional vertical 2-site operator inside the column (reference
    corrf_c4v.py:272-308 ``apply_TM_1sO_2``)."""
    import numpy as np

    T = env.T
    if op2 is None:
        parts = [(_aXa(a), _aXa(a))]
    else:
        d = a.shape[0]
        m = np.asarray(op2).reshape(d, d, d, d).transpose(0, 2, 1, 3).reshape(d * d, d * d)
        U, S, Vh = np.linalg.svd(m, full_matrices=False)
        k = max(int((S > 1e-14 * max(S[0], 1e-300)).sum()), 1)
        o1 = jnp.asarray((U[:, :k] * S[:k][None, :]).T.reshape(k, d, d))
        o2 = jnp.asarray(Vh[:k].reshape(k, d, d))
        parts = [(_aXa(a, o1[i]), _aXa(a, o2[i])) for i in range(k)]
    out = None
    for A0, A1 in parts:
        E = jnp.einsum("tmzb,qtu->mzbqu", edge, T)
        E = jnp.einsum("mzbqu,umdr->zbqdr", E, A0)
        E = jnp.einsum("zbqdr,dzev->bqrev", E, A1)
        E = jnp.einsum("bqrev,bwe->qrvw", E, T)
        out = E if out is None else out + E
    return out
