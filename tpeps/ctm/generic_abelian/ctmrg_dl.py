"""Block-sparse double-layer CTMRG: the graded (fermionic) abelian
environment engine.

Counterpart of the reference's fermionic abelian CTM runs (yastn
``EnvCTM.ctmrg_`` over swap-gated fPEPS double layers, driven by
``examples/honeycomb/CI.py`` and ``ctm/generic_abelian/ctmrg.py``): a
directional CTMRG whose site tensor is an explicit rank-8 *double
tensor* ``E[(uk, ub, lk, lb, dk, db, rk, rb)]`` instead of a
(ket, bra) pair contracted lazily.  That is exactly what fermionic
states need — their double layer carries a sign dressing that does not
factorize into the two layers
(:func:`tpeps.ctm.generic_abelian.corrf_fermionic.double_tensor_ab`) —
so the fixed point of THIS engine, not the bosonic
:mod:`~tpeps.ctm.generic_abelian.ctmrg` one, is the environment that
fermionic observables at distance require (the two fixed points differ:
converging the sign-stripped layer gives ~1e-2-wrong correlators on the
honeycomb CI state even when chi saturates; see PARITY.md round-4 root
cause and ``tests/test_abelian_fermionic_corrf.py``).

Block-sparse mirror of the dense :mod:`tpeps.ctm.generic.dl` engine,
generalized to arbitrary rectangular unit cells; environment layout =
:mod:`tpeps.ctm.generic_abelian.env` (D-pairs unfused), so every
downstream consumer (``corrf``, ``corrf_fermionic``, ``rdm``) works
unchanged on the graded env.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...sym.tensor import AbelianTensor
from .env import ENV_ABELIAN, _normalized
from .projectors import projectors_from_halves
from .ctmrg import _REL_VECS, _corner_spectra
from .corrf_fermionic import double_tensor_ab


# ------------------------------------------------------------- building E


def build_dl_sites(state, string=(), backend="np"):
    """Sign-dressed closed double tensors for every unique site of an
    abelian (graded) iPEPS — the input of :func:`run_dl` /
    :func:`run_fermionic`.

    ``backend="np"`` (default) keeps the host-driven CTM loop on numpy
    blocks — the double tensor has O(1e3) tiny blocks and eager jnp
    dispatch is ~50x slower per move (same trade as the bosonic abelian
    engine, see :mod:`tpeps.ctm.generic_abelian.ctmrg` docstring)."""
    return {c: double_tensor_ab(state.sites[c], string=string).to_backend(backend)
            for c in state.sites}


# ------------------------------------------------------------ environment


def _pair_cap(E, i):
    """Graded-free identity cap over the (ket, bra) pair ``(i, i+1)`` of
    ``E`` — the block-sparse mirror of the dense engine's
    ``pair_trace_vec`` (plain delta on the dressed double tensor,
    :func:`tpeps.ctm.generic.dl.init_env_dl`)."""
    backend_np = all(isinstance(b, np.ndarray) for b in E.blocks.values())
    lk = E.legs[i]
    sk, sb = E.signature[i], E.signature[i + 1]
    cap = AbelianTensor(E.sym, (-sk, -sb), (lk, lk), 0, dtype=E.dtype)
    for q, d in lk.charges:
        ey = np.eye(d)
        cap.blocks[(q, q)] = ey if backend_np else jnp.asarray(ey, E.dtype)
    return cap


def _trace_pairs(E, pair_axes):
    """Contract the listed (ket, bra) pairs of ``E`` with identity caps;
    ``pair_axes`` indexes pairs: 0=u, 1=l, 2=d, 3=r."""
    out = E
    # contract highest axes first so earlier indices stay valid
    for p in sorted(pair_axes, reverse=True):
        i = 2 * p
        out = out.tensordot(_pair_cap(out, i), ((i, i + 1), (0, 1)))
    return out


def init_env_dl(state, E_sites, chi: int) -> ENV_ABELIAN:
    """PBC-traced environment from the double tensors (mirror of the
    dense :func:`tpeps.ctm.generic.dl.init_env_dl` and of the bosonic
    :func:`tpeps.ctm.generic_abelian.env.init_from_ipeps_pbc` layout)."""
    env = ENV_ABELIAN(chi)
    site_of = state.vertexToSite

    def E_at(coord):
        return E_sites[site_of(coord)]

    for coord in state.sites:
        x, y = coord
        # corners: trace the two outward pairs, fuse the remaining two
        c = _trace_pairs(E_at((x - 1, y - 1)), (0, 1))   # (dk,db,rk,rb)
        env.C[(coord, (-1, -1))] = _normalized(c.fuse_pair(0).fuse_pair(1))
        c = _trace_pairs(E_at((x + 1, y - 1)), (0, 3))   # (lk,lb,dk,db)
        env.C[(coord, (1, -1))] = _normalized(c.fuse_pair(0).fuse_pair(1))
        c = _trace_pairs(E_at((x + 1, y + 1)), (2, 3))   # (uk,ub,lk,lb)
        env.C[(coord, (1, 1))] = _normalized(c.fuse_pair(0).fuse_pair(1))
        c = _trace_pairs(E_at((x - 1, y + 1)), (1, 2))   # (uk,ub,rk,rb)
        env.C[(coord, (-1, 1))] = _normalized(c.fuse_pair(0).fuse_pair(1))

        # edges: trace the one outward pair, fuse the two chi pairs
        t = _trace_pairs(E_at((x, y - 1)), (0,))         # (lk,lb,dk,db,rk,rb)
        t = t.fuse_pair(0).fuse_pair(3)                  # (chi_l,dk,db,chi_r)
        env.T[(coord, (0, -1))] = _normalized(t)
        t = _trace_pairs(E_at((x - 1, y)), (1,))         # (uk,ub,dk,db,rk,rb)
        t = t.fuse_pair(0).fuse_pair(1)                  # (chi_u,chi_d,rk,rb)
        env.T[(coord, (-1, 0))] = _normalized(t)
        t = _trace_pairs(E_at((x, y + 1)), (2,))         # (uk,ub,lk,lb,rk,rb)
        t = t.fuse_pair(2).fuse_pair(3)                  # (uk,ub,chi_l,chi_r)
        env.T[(coord, (0, 1))] = _normalized(t)
        t = _trace_pairs(E_at((x + 1, y)), (3,))         # (uk,ub,lk,lb,dk,db)
        t = t.fuse_pair(0).fuse_pair(3)                  # (chi_u,lk,lb,chi_d)
        env.T[(coord, (1, 0))] = _normalized(t)
    return env


# ------------------------------------------------------- enlarged corners


def c2x2_lu_dl(C, Tt, Tl, E):
    q = C.tensordot(Tt, ((1,), (0,)))                    # (x,uk,ub,i)
    q = q.tensordot(Tl, ((0,), (0,)))                    # (uk,ub,i,j,lk,lb)
    out = q.tensordot(E, ((0, 1, 4, 5), (0, 1, 2, 3)))   # (i,j,dk,db,rk,rb)
    return out.transpose((1, 2, 3, 0, 4, 5))             # rows(j,dk,db) cols(i,rk,rb)


def c2x2_ru_dl(C, Tr, Tt, E):
    q = C.tensordot(Tr, ((1,), (0,)))                    # (x,rk,rb,b)
    q = q.tensordot(Tt, ((0,), (3,)))                    # (rk,rb,b,l,uk,ub)
    out = q.tensordot(E, ((4, 5, 0, 1), (0, 1, 6, 7)))   # (b,l,lk,lb,dk,db)
    return out.transpose((1, 2, 3, 0, 4, 5))             # rows(l,lk,lb) cols(b,dk,db)


def c2x2_rd_dl(C, Tb, Tr, E):
    q = C.tensordot(Tb, ((1,), (3,)))                    # (x,dk,db,l)
    q = q.tensordot(Tr, ((0,), (3,)))                    # (dk,db,l,t,rk,rb)
    out = q.tensordot(E, ((0, 1, 4, 5), (4, 5, 6, 7)))   # (l,t,uk,ub,lk,lb)
    return out.transpose((1, 2, 3, 0, 4, 5))             # rows(t,uk,ub) cols(l,lk,lb)


def c2x2_ld_dl(C, Tl, Tb, E):
    q = C.tensordot(Tl, ((0,), (1,)))                    # (y,t,lk,lb)
    q = q.tensordot(Tb, ((0,), (2,)))                    # (t,lk,lb,dk,db,r)
    out = q.tensordot(E, ((1, 2, 3, 4), (2, 3, 4, 5)))   # (t,r,uk,ub,rk,rb)
    return out.transpose((0, 2, 3, 1, 4, 5))             # rows(t,uk,ub) cols(r,rk,rb)


def _corner_dl(kind, coord, E_sites, site_of, env):
    c = site_of(coord)
    E = E_sites[c]
    if kind == "lu":
        return c2x2_lu_dl(env.C[(c, (-1, -1))], env.T[(c, (0, -1))],
                          env.T[(c, (-1, 0))], E)
    if kind == "ru":
        return c2x2_ru_dl(env.C[(c, (1, -1))], env.T[(c, (1, 0))],
                          env.T[(c, (0, -1))], E)
    if kind == "rd":
        return c2x2_rd_dl(env.C[(c, (1, 1))], env.T[(c, (0, 1))],
                          env.T[(c, (1, 0))], E)
    return c2x2_ld_dl(env.C[(c, (-1, 1))], env.T[(c, (-1, 0))],
                      env.T[(c, (0, 1))], E)


def _halves_dl(direction, coord, E_sites, site_of, env):
    """R, Rt rank-6 half systems (same pairings as the bosonic
    :mod:`tpeps.ctm.generic_abelian.components` HALVES)."""
    x, y = coord
    cn = lambda kind, cc: _corner_dl(kind, cc, E_sites, site_of, env)
    if direction == (0, -1):  # coord = upper-right site
        R = cn("ru", coord).tensordot(cn("rd", (x, y + 1)), ((3, 4, 5), (0, 1, 2)))
        Rt = cn("lu", (x - 1, y)).tensordot(cn("ld", (x - 1, y + 1)),
                                            ((0, 1, 2), (0, 1, 2)))
        return R, Rt
    if direction == (-1, 0):  # coord = upper-left site
        R = cn("lu", coord).tensordot(cn("ru", (x + 1, y)), ((3, 4, 5), (0, 1, 2)))
        Rt = cn("ld", (x, y + 1)).tensordot(cn("rd", (x + 1, y + 1)),
                                            ((3, 4, 5), (3, 4, 5)))
        return R, Rt
    if direction == (0, 1):  # coord = lower-left site
        R = cn("ld", coord).tensordot(cn("lu", (x, y - 1)), ((0, 1, 2), (0, 1, 2)))
        Rt = cn("rd", (x + 1, y)).tensordot(cn("ru", (x + 1, y - 1)),
                                            ((0, 1, 2), (3, 4, 5)))
        return R, Rt
    # (1, 0): coord = lower-right site
    R = cn("rd", coord).tensordot(cn("ld", (x - 1, y)), ((3, 4, 5), (3, 4, 5)))
    Rt = cn("ru", (x, y - 1)).tensordot(cn("lu", (x - 1, y - 1)),
                                        ((0, 1, 2), (3, 4, 5)))
    return R, Rt


# --------------------------------------------------------------- absorbs


def _absorb_up_dl(c, E, state, env, P, Pt):
    site_of = state.vertexToSite
    cr = site_of((c[0] + 1, c[1]))
    C, T = env.C, env.T
    t = C[(c, (1, -1))].tensordot(T[(c, (1, 0))], ((1,), (0,)))
    nC1 = Pt[cr].tensordot(t, ((0, 1, 2), (0, 1, 2)))
    t = C[(c, (-1, -1))].tensordot(T[(c, (-1, 0))], ((0,), (0,)))
    nC2 = t.tensordot(P[c], ((0, 2, 3), (0, 1, 2)))
    z = T[(c, (0, -1))].tensordot(Pt[c], ((0,), (0,)))    # (uk,ub,r,lk,lb,q)
    z = z.tensordot(E, ((0, 1, 3, 4), (0, 1, 2, 3)))      # (r,q,dk,db,rk,rb)
    nT = z.tensordot(P[cr], ((0, 4, 5), (0, 1, 2)))       # (q,dk,db,p)
    return nC1, nC2, nT


def _absorb_left_dl(c, E, state, env, P, Pt):
    site_of = state.vertexToSite
    cu = site_of((c[0], c[1] - 1))
    C, T = env.C, env.T
    t = C[(c, (-1, -1))].tensordot(T[(c, (0, -1))], ((1,), (0,)))
    nC1 = Pt[cu].tensordot(t, ((0, 1, 2), (0, 1, 2)))
    t = C[(c, (-1, 1))].tensordot(T[(c, (0, 1))], ((1,), (2,)))
    nC2 = P[c].tensordot(t, ((0, 1, 2), (0, 1, 2)))
    z = T[(c, (-1, 0))].tensordot(P[cu], ((0,), (0,)))    # (b,lk,lb,uk,ub,q)
    z = z.tensordot(E, ((3, 4, 1, 2), (0, 1, 2, 3)))      # (b,q,dk,db,rk,rb)
    nT = z.tensordot(Pt[c], ((0, 2, 3), (0, 1, 2)))       # (q,rk,rb,p)
    return nC1, nC2, nT.transpose((0, 3, 1, 2))           # (q,p,rk,rb)


def _absorb_down_dl(c, E, state, env, P, Pt):
    site_of = state.vertexToSite
    cl = site_of((c[0] - 1, c[1]))
    C, T = env.C, env.T
    t = C[(c, (-1, 1))].tensordot(T[(c, (-1, 0))], ((0,), (1,)))
    nC1 = t.tensordot(Pt[cl], ((0, 2, 3), (0, 1, 2)))
    t = C[(c, (1, 1))].tensordot(T[(c, (1, 0))], ((0,), (3,)))
    nC2 = t.tensordot(P[c], ((0, 2, 3), (0, 1, 2)))
    z = T[(c, (0, 1))].tensordot(P[cl], ((2,), (0,)))     # (dk,db,r,lk,lb,q)
    z = z.tensordot(E, ((3, 4, 0, 1), (2, 3, 4, 5)))      # (r,q,uk,ub,rk,rb)
    nT = z.tensordot(Pt[c], ((0, 4, 5), (0, 1, 2)))       # (q,uk,ub,p)
    return nC1, nC2, nT.transpose((1, 2, 0, 3))           # (uk,ub,q,p)


def _absorb_right_dl(c, E, state, env, P, Pt):
    site_of = state.vertexToSite
    cd = site_of((c[0], c[1] + 1))
    C, T = env.C, env.T
    t = C[(c, (1, 1))].tensordot(T[(c, (0, 1))], ((1,), (3,)))
    nC1 = Pt[cd].tensordot(t, ((0, 1, 2), (0, 1, 2)))
    t = C[(c, (1, -1))].tensordot(T[(c, (0, -1))], ((0,), (3,)))
    nC2 = t.tensordot(P[c], ((0, 2, 3), (0, 1, 2)))
    z = T[(c, (1, 0))].tensordot(Pt[c], ((0,), (0,)))     # (rk,rb,b,uk,ub,q)
    z = z.tensordot(E, ((3, 4, 0, 1), (0, 1, 6, 7)))      # (b,q,lk,lb,dk,db)
    nT = z.tensordot(P[cd], ((0, 4, 5), (0, 1, 2)))       # (q,lk,lb,p)
    return nC1, nC2, nT


_ABSORB_DL = {
    (0, -1): _absorb_up_dl,
    (-1, 0): _absorb_left_dl,
    (0, 1): _absorb_down_dl,
    (1, 0): _absorb_right_dl,
}


def ctm_move_dl(direction, state, E_sites, env: ENV_ABELIAN, chi: int,
                proj_kwargs):
    """One directional move for every site over the double tensors."""
    site_of = state.vertexToSite
    P, Pt = {}, {}
    for c in state.sites:
        R, Rt = _halves_dl(direction, c, E_sites, site_of, env)
        P[c], Pt[c] = projectors_from_halves(R, Rt, chi, **proj_kwargs)
    absorb = _ABSORB_DL[direction]
    rel = _REL_VECS[direction]
    out = env.clone()
    for c in state.sites:
        nC1, nC2, nT = absorb(c, E_sites[c], state, env, P, Pt)
        nc = site_of((c[0] - direction[0], c[1] - direction[1]))
        out.C[(nc, rel["nC1"])] = _normalized(nC1)
        out.C[(nc, rel["nC2"])] = _normalized(nC2)
        out.T[(nc, rel["nT"])] = _normalized(nT)
    return out


def run_dl(state, E_sites, env: ENV_ABELIAN, ctm_cfg, conv_check=None):
    """CTMRG over explicit double tensors to convergence (host loop;
    same driver structure as :func:`tpeps.ctm.generic_abelian.ctmrg.run`).
    """
    proj_kwargs = dict(
        svd_reltol=ctm_cfg.projector_svd_reltol,
        eps_multiplet=ctm_cfg.projector_eps_multiplet,
    )
    move_seq = tuple(tuple(d) for d in ctm_cfg.ctm_move_sequence)
    chi = env.chi
    spec_prev = None
    history = {"conv_crit": []}
    for _ in range(ctm_cfg.ctm_max_iter):
        for direction in move_seq:
            n = state.lX if direction in ((-1, 0), (1, 0)) else state.lY
            for _ in range(n):
                env = ctm_move_dl(direction, state, E_sites, env, chi,
                                  proj_kwargs)
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


def run_fermionic(state, env, ctm_cfg, conv_check=None):
    """Converge the GRADED abelian environment of a fermionic state:
    CTMRG over the sign-dressed double layer (the fixed point that
    fermionic observables need — see module docstring).

    :param env: ``None`` to initialize from the PBC-traced dressed
        double tensors, or a pre-built :class:`ENV_ABELIAN` with the
        target chi.  Accepts an int chi as a shorthand for ``None``-init
        at that chi.
    :return: ``(env, history)``
    """
    E_sites = build_dl_sites(state)
    if isinstance(env, int):
        env = init_env_dl(state, E_sites, env)
    elif env is None:
        raise ValueError("pass a chi (int) or a pre-built ENV_ABELIAN")
    return run_dl(state, E_sites, env, ctm_cfg, conv_check)
