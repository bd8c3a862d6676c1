"""Directional CTMRG over abelian block-sparse tensors.

Counterpart of reference ctm/generic_abelian/ctmrg.py:18-636; the
algorithm mirrors the dense :mod:`tpeps.ctm.generic.ctmrg` move for
move (same projector network, same absorption contractions), acting on
:class:`~tpeps.sym.tensor.AbelianTensor` with unfused D-pair legs.

Execution model: block structure (and hence trace shapes) changes
between early iterations as chi sectors grow toward the truncation
target, so the loop is host-driven and the block ops dispatch eagerly
(each ``lax.dot_general`` on dense blocks is XLA-compiled and cached by
shape).  Charge bookkeeping is host-side metadata — exactly the
static-metadata/dynamic-data split the reference engineers for torch
checkpointing of YASTN tensors (reference ctmrg.py:130-211).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .env import ENV_ABELIAN
from .projectors import ctm_get_projectors

_REL_VECS = {
    (0, -1): {"nC1": (1, -1), "nC2": (-1, -1), "nT": (0, -1)},
    (-1, 0): {"nC1": (-1, -1), "nC2": (-1, 1), "nT": (-1, 0)},
    (0, 1): {"nC1": (-1, 1), "nC2": (1, 1), "nT": (0, 1)},
    (1, 0): {"nC1": (1, 1), "nC2": (1, -1), "nT": (1, 0)},
}


def _absorb_up(c, state, env, P, Pt):
    """Mirror of tpeps.ctm.generic.ctmrg._absorb_up."""
    a = state.sites[c]
    site_of = state.vertexToSite
    cr = site_of((c[0] + 1, c[1]))
    C, T = env.C, env.T

    t = C[(c, (1, -1))].tensordot(T[(c, (1, 0))], ((1,), (0,)))     # (x,wk,wb,b)
    nC1 = Pt[cr].tensordot(t, ((0, 1, 2), (0, 1, 2)))               # (q,b)

    t = C[(c, (-1, -1))].tensordot(T[(c, (-1, 0))], ((0,), (0,)))   # (y,d,nk,nb)
    nC2 = t.tensordot(P[c], ((0, 2, 3), (0, 1, 2)))                 # (d,q)

    z = T[(c, (0, -1))].tensordot(Pt[c], ((0,), (0,)))              # (u,v,r,l,m,q)
    z = z.tensordot(a, ((0, 3), (1, 2)))                            # (v,r,m,q,s,e,f)
    z = z.tensordot(a.conj(), ((4, 0, 2), (0, 1, 2)))               # (r,q,e,f,g,w)
    nT = z.tensordot(P[cr], ((0, 3, 5), (0, 1, 2)))                 # (q,e,g,p)
    return nC1, nC2, nT


def _absorb_left(c, state, env, P, Pt):
    a = state.sites[c]
    site_of = state.vertexToSite
    cu = site_of((c[0], c[1] - 1))
    C, T = env.C, env.T

    t = C[(c, (-1, -1))].tensordot(T[(c, (0, -1))], ((1,), (0,)))   # (x,mk,mb,r)
    nC1 = Pt[cu].tensordot(t, ((0, 1, 2), (0, 1, 2)))               # (q,r)

    t = C[(c, (-1, 1))].tensordot(T[(c, (0, 1))], ((1,), (2,)))     # (x,mk,mb,r)
    nC2 = P[c].tensordot(t, ((0, 1, 2), (0, 1, 2)))                 # (q,r)

    z = T[(c, (-1, 0))].tensordot(P[cu], ((0,), (0,)))              # (b,w,v,u,c,q)
    z = z.tensordot(a, ((3, 1), (1, 2)))                            # (b,v,c,q,s,e,f)
    z = z.tensordot(a.conj(), ((4, 2, 1), (0, 1, 2)))               # (b,q,e,f,g,h)
    nT = z.tensordot(Pt[c], ((0, 2, 4), (0, 1, 2)))                 # (q,f,h,p)
    return nC1, nC2, nT.transpose((0, 3, 1, 2))                     # (q,p,fk,hb)


def _absorb_down(c, state, env, P, Pt):
    a = state.sites[c]
    site_of = state.vertexToSite
    cl = site_of((c[0] - 1, c[1]))
    C, T = env.C, env.T

    t = C[(c, (-1, 1))].tensordot(T[(c, (-1, 0))], ((0,), (1,)))    # (y,t,nk,nb)
    nC1 = t.tensordot(Pt[cl], ((0, 2, 3), (0, 1, 2)))               # (t,q)

    t = C[(c, (1, 1))].tensordot(T[(c, (1, 0))], ((0,), (3,)))      # (y,t,wk,wb)
    nC2 = t.tensordot(P[c], ((0, 2, 3), (0, 1, 2)))                 # (t,q)

    z = T[(c, (0, 1))].tensordot(P[cl], ((2,), (0,)))               # (u,v,r,w,c,q)
    z = z.tensordot(a, ((3, 0), (2, 3)))                            # (v,r,c,q,s,e,f)
    z = z.tensordot(a.conj(), ((4, 2, 0), (0, 2, 3)))               # (r,q,e,f,g,h)
    nT = z.tensordot(Pt[c], ((0, 3, 5), (0, 1, 2)))                 # (q,e,g,p)
    return nC1, nC2, nT.transpose((1, 2, 0, 3))                     # (ek,gb,q,p)


def _absorb_right(c, state, env, P, Pt):
    a = state.sites[c]
    site_of = state.vertexToSite
    cd = site_of((c[0], c[1] + 1))
    C, T = env.C, env.T

    t = C[(c, (1, 1))].tensordot(T[(c, (0, 1))], ((1,), (3,)))      # (x,mk,mb,l)
    nC1 = Pt[cd].tensordot(t, ((0, 1, 2), (0, 1, 2)))               # (q,l)

    t = C[(c, (1, -1))].tensordot(T[(c, (0, -1))], ((0,), (3,)))    # (y,l,mk,mb)
    nC2 = t.tensordot(P[c], ((0, 2, 3), (0, 1, 2)))                 # (l,q)

    z = T[(c, (1, 0))].tensordot(Pt[c], ((0,), (0,)))               # (w,v,b,u,c,q)
    z = z.tensordot(a, ((3, 0), (1, 4)))                            # (v,b,c,q,s,e,f)
    z = z.tensordot(a.conj(), ((4, 2, 0), (0, 1, 4)))               # (b,q,e,f,g,h)
    nT = z.tensordot(P[cd], ((0, 3, 5), (0, 1, 2)))                 # (q,e,g,p)
    return nC1, nC2, nT


_ABSORB = {
    (0, -1): _absorb_up,
    (-1, 0): _absorb_left,
    (0, 1): _absorb_down,
    (1, 0): _absorb_right,
}


def _normalized(t):
    s = t.max_abs()
    if isinstance(s, (float, np.floating, np.ndarray)):
        return t * (1.0 / float(s))  # host backend
    return t * (1.0 / jax.lax.stop_gradient(s))


def ctm_move(direction, state, env: ENV_ABELIAN, chi: int, proj_kwargs):
    """One directional move for every site (reference
    ctm/generic_abelian/ctmrg.py:94-263)."""
    P, Pt = {}, {}
    for c in state.sites:
        P[c], Pt[c] = ctm_get_projectors(direction, c, state, env, chi, **proj_kwargs)

    absorb = _ABSORB[direction]
    rel = _REL_VECS[direction]
    out = env.clone()
    site_of = state.vertexToSite
    for c in state.sites:
        nC1, nC2, nT = absorb(c, state, env, P, Pt)
        nc = site_of((c[0] - direction[0], c[1] - direction[1]))
        out.C[(nc, rel["nC1"])] = _normalized(nC1)
        out.C[(nc, rel["nC2"])] = _normalized(nC2)
        out.T[(nc, rel["nT"])] = _normalized(nT)
    return out


def _corner_spectra(env: ENV_ABELIAN, chi: int):
    """Stacked normalized corner spectra padded to chi (gauge-invariant
    convergence data, reference env.py:817 ``ctmrg_conv_specC``)."""
    specs = []
    for k in sorted(env.C.keys()):
        s = np.asarray(jnp.linalg.svd(env.C[k].to_dense(), compute_uv=False))
        s = np.sort(s)[::-1]
        p = np.zeros(chi)
        p[: min(chi, s.size)] = s[:chi]
        if p[0] > 0:
            p /= p[0]
        specs.append(p)
    return np.stack(specs)


def run(state, env: ENV_ABELIAN, ctm_cfg, conv_check=None):
    """CTMRG to convergence (host loop; default convergence = l2 distance
    of successive normalized corner spectra < ``ctm_conv_tol``).

    :return: ``(env, history)``
    """
    proj_kwargs = dict(
        svd_reltol=ctm_cfg.projector_svd_reltol,
        eps_multiplet=ctm_cfg.projector_eps_multiplet,
    )
    move_seq = tuple(tuple(d) for d in ctm_cfg.ctm_move_sequence)
    chi = env.chi
    spec_prev = None
    history = {"conv_crit": []}
    for i in range(ctm_cfg.ctm_max_iter):
        for direction in move_seq:
            n = state.lX if direction in ((-1, 0), (1, 0)) else state.lY
            for _ in range(n):
                env = ctm_move(direction, state, env, chi, proj_kwargs)
        if conv_check is not None:
            converged, history = conv_check(state, env, history)
            if converged:
                break
        else:
            spec = _corner_spectra(env, chi)
            if spec_prev is not None:
                dist = float(np.linalg.norm(spec - spec_prev))
                history["conv_crit"].append(dist)
                if dist < ctm_cfg.ctm_conv_tol:
                    break
            spec_prev = spec
    return env, history
