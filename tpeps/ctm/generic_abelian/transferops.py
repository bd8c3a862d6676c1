"""Transfer-operator spectra on block-sparse abelian environments.

Counterpart of reference ctm/generic_abelian/transferops.py: the
leading eigenvalues of the column transfer matrix ``T_top . (a a*) .
T_bot`` evaluated WITHOUT densifying — the matvec applies the
block-sparse TM to an edge-shaped AbelianTensor, and the Arnoldi
iteration runs over the flattened block vector.  At chi=160 this is the
only affordable route to the abelian transfer spectrum (dense would be
(chi^2 D^2)^2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...sym.tensor import AbelianTensor
from .corrf import apply_TM_1sO, get_edge


def _flatten(E: AbelianTensor):
    keys = sorted(E.blocks)
    vec = np.concatenate([np.ravel(np.asarray(E.blocks[k])) for k in keys])
    return vec, keys


def get_Top_spec(n: int, coord, direction, state, env, m: int | None = None,
                 sectors=(0,)):
    """Leading ``n`` eigenvalues of the transfer matrix in ``direction``
    (only (1,0) — column TM applied along a row — as in corrf), computed
    block-sparsely and CHARGE-RESOLVED: the TM is block-diagonal in the
    total charge of the edge vector, so each sector in ``sectors`` gets
    its own Arnoldi run (sector 0 holds the identity/leading branch;
    +-1 the single-magnon branches, etc.) and the union is sorted by
    magnitude — matching the dense spectrum when the sector list covers
    the relevant charges.

    :return: (n, 2) array of (re, im), normalized by the global leading
    """
    from ...linalg.arnoldi import arnoldi_eigs
    from ...ipeps.ipeps_abelian import IPEPS_ABELIAN
    from .env import ENV_ABELIAN

    # the Arnoldi matvec traces; all blocks must be jnp
    state = IPEPS_ABELIAN(
        state.sym, {c: a.to_backend("jnp") for c, a in state.sites.items()},
        vertexToSite=state.vertexToSite, lX=state.lX, lY=state.lY,
    )
    env = ENV_ABELIAN(
        env.chi,
        {k: t.to_backend("jnp") for k, t in env.C.items()},
        {k: t.to_backend("jnp") for k, t in env.T.items()},
    )
    rev = (-direction[0], -direction[1])
    E0 = get_edge(coord, rev, state, env)
    cell = state.lX if direction in ((1, 0), (-1, 0)) else state.lY
    rng = np.random.RandomState(1234)
    all_vals = []
    for sector in sectors:
        # maximal allowed block set at this total charge: a TM-invariant
        # superset of the reachable set (the TM conserves the charge)
        proto = AbelianTensor.zeros(E0.sym, E0.signature, E0.legs, n=sector,
                                    dtype=E0.dtype)
        keys = sorted(proto.blocks)
        if not keys:
            continue
        shapes = {k: proto.blocks[k].shape for k in keys}
        size = sum(int(np.prod(shapes[k])) for k in keys)

        def matvec(v, proto=proto, keys=keys, shapes=shapes):
            # fully traceable: static offsets slice the flat vector into
            # the frozen block structure, the block-sparse TM applies,
            # the result re-flattens (missing blocks -> zeros)
            blocks, off = {}, 0
            for k in keys:
                nel = int(np.prod(shapes[k]))
                blocks[k] = v[off:off + nel].reshape(shapes[k])
                off += nel
            E = proto.copy_with(blocks)
            c = coord
            for _ in range(cell):
                E = apply_TM_1sO(c, direction, state, env, E)
                c = (c[0] + direction[0], c[1] + direction[1])
            outs = []
            for k in keys:
                b = E.blocks.get(k)
                outs.append(jnp.ravel(b) if b is not None
                            else jnp.zeros(int(np.prod(shapes[k])), proto.dtype))
            return jnp.concatenate(outs)

        k_sec = min(n, size - 1) if size > 1 else 1
        v0 = jnp.asarray(rng.rand(size) - 0.5)
        all_vals.extend(np.asarray(arnoldi_eigs(matvec, v0, k_sec, m=m)))
    vals = np.asarray(all_vals)
    vals = vals[np.argsort(-np.abs(vals))][:n]
    vals = vals / np.abs(vals[0])
    return np.stack([vals.real, vals.imag], axis=1)
