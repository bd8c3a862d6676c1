"""Frozen-structure generic abelian CTMRG: TPU-resident, differentiable.

Generic-cell counterpart of :mod:`tpeps.ctm.c4v_abelian.frozen` — the
capability the reference gets from backpropagating YASTN's torch
backend through the whole move history with block checkpointing
(ctm/generic_abelian/ctmrg.py:130-224).  Here: the per-(direction,
site) projector sector profiles are frozen after a dynamic host run,
every directional move becomes a fixed-shape traced program
(``svd_blockwise_fixed`` projectors + the same absorption contractions
as the dynamic engine), the fixed point runs under ``lax.while_loop``,
and gradients come from the implicit Neumann adjoint.  Drives
U(1)/U(1)xU(1) *optimization* of generic-cell states
(examples/j1j2/abelian/optim_j1j2_u1.py; reference
examples/j1j2/abelian/optim_j1j2_u1.py:196-255).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ...ipeps.ipeps_abelian import IPEPS_ABELIAN
from ...sym.frozen import reindex_like, svd_blockwise_fixed
from ...sym.tensor import AbelianTensor
from .components import HALVES
from .ctmrg import _ABSORB, _REL_VECS
from .env import ENV_ABELIAN
from .projectors import _scale_new_leg


def _normalized(t: AbelianTensor, sg: bool) -> AbelianTensor:
    s = jnp.max(jnp.stack([jnp.max(jnp.abs(b)) for b in t.blocks.values()]))
    return t * (1.0 / (lax.stop_gradient(s) if sg else s))


def _projectors_fixed(direction, c, state, env, keep, ad_decomp_reg):
    """(P, Pt) at a frozen per-sector profile (traced mirror of
    :func:`tpeps.ctm.generic_abelian.projectors.projectors_from_halves`).
    """
    R, Rt = HALVES[direction](c, state, env)
    M = R.tensordot(Rt, ((0, 1, 2), (0, 1, 2)))
    U, S, V = svd_blockwise_fixed(M, (0, 1, 2), (3, 4, 5), keep,
                                  ad_decomp_reg=ad_decomp_reg)
    isq = {q: 1.0 / jnp.sqrt(s) for q, s in S.items()}
    P = _scale_new_leg(R.tensordot(U.conj(), ((3, 4, 5), (0, 1, 2))), isq)
    Vd = V.conj().transpose((1, 2, 3, 0))
    Pt = _scale_new_leg(Rt.tensordot(Vd, ((3, 4, 5), (0, 1, 2))), isq)
    return P, Pt


def freeze_profiles(state, env: ENV_ABELIAN, chi: int, svd_reltol=1.0e-8,
                    eps_multiplet=1.0e-8):
    """Per-(direction, site) projector sector profiles from a
    (host-)converged environment: one dynamic projector construction
    per slot, recording the new leg's charge table.  Returns a hashable
    nested tuple ``((direction, coord, ((q, d), ...)), ...)``."""
    from .projectors import ctm_get_projectors

    prof = []
    for direction in ((0, -1), (-1, 0), (0, 1), (1, 0)):
        for c in sorted(state.sites):
            P, _Pt = ctm_get_projectors(direction, c, state, env, chi,
                                        svd_reltol=svd_reltol,
                                        eps_multiplet=eps_multiplet)
            prof.append((direction, c, tuple(sorted(P.legs[-1].charges))))
    return tuple(prof)


def _prof_dict(profiles):
    return {(d, c): dict(kp) for d, c, kp in profiles}


def ctm_move_frozen(direction, state, env: ENV_ABELIAN, keeps,
                    ad_decomp_reg: float = 1.0e-12, sg_norm: bool = True):
    """One frozen directional move for every site; output reindexed onto
    the input env's block sets (pytree-structure invariant)."""
    P, Pt = {}, {}
    for c in state.sites:
        P[c], Pt[c] = _projectors_fixed(direction, c, state, env,
                                        keeps[(direction, c)], ad_decomp_reg)
    absorb = _ABSORB[direction]
    rel = _REL_VECS[direction]
    out = env.clone()
    site_of = state.vertexToSite
    for c in state.sites:
        nC1, nC2, nT = absorb(c, state, env, P, Pt)
        nc = site_of((c[0] - direction[0], c[1] - direction[1]))
        out.C[(nc, rel["nC1"])] = reindex_like(
            _normalized(nC1, sg_norm), env.C[(nc, rel["nC1"])])
        out.C[(nc, rel["nC2"])] = reindex_like(
            _normalized(nC2, sg_norm), env.C[(nc, rel["nC2"])])
        out.T[(nc, rel["nT"])] = reindex_like(
            _normalized(nT, sg_norm), env.T[(nc, rel["nT"])])
    return out


def _sweep(state, env, keeps, move_seq, lX, lY, ad_decomp_reg, sg_norm):
    for direction in move_seq:
        n = lX if direction in ((-1, 0), (1, 0)) else lY
        for _ in range(n):
            env = ctm_move_frozen(direction, state, env, keeps,
                                  ad_decomp_reg, sg_norm)
    return env


def _mk_state(sym, sites, vertexToSite, lX, lY):
    return IPEPS_ABELIAN(sym, sites, vertexToSite=vertexToSite, lX=lX, lY=lY)


def close_structure_generic(state, env: ENV_ABELIAN, keeps, move_seq,
                            n_max: int = 8):
    """Close the env block sets under one full frozen sweep (zero-FLOP
    ``jax.eval_shape`` iteration, cf.
    :func:`tpeps.ctm.c4v_abelian.frozen.close_structure`)."""
    def as_tup(e):
        return (dict(e.C), dict(e.T))

    for _ in range(n_max):
        o = jax.eval_shape(
            lambda Cs, Ts: as_tup(_sweep(
                state, ENV_ABELIAN(env.chi, Cs, Ts), keeps, move_seq,
                state.lX, state.lY, 1.0e-12, True)),
            dict(env.C), dict(env.T),
        )
        oC, oT = o
        grew = False
        for grp, og in ((env.C, oC), (env.T, oT)):
            for k in grp:
                ref, cur = og[k], grp[k]
                want = set(ref.blocks) | set(cur.blocks)
                if want != set(cur.blocks):
                    grew = True
                    blocks = dict(cur.blocks)
                    for q in ref.blocks:
                        if q not in blocks:
                            blocks[q] = jnp.zeros(ref.blocks[q].shape, cur.dtype)
                    grp[k] = AbelianTensor(cur.sym, cur.signature, cur.legs,
                                           cur.n, blocks, cur.dtype,
                                           cur.fermionic, cur.conj_reversal)
        if not grew:
            return env
    raise RuntimeError("generic abelian env structure failed to close")


def _env_dist2(e1, e2):
    return sum(
        jnp.sum(jnp.abs(x - y) ** 2)
        for x, y in zip(jax.tree_util.tree_leaves(e1), jax.tree_util.tree_leaves(e2))
    )


def make_converge_frozen_generic(state, chi, profiles, move_seq, max_iter,
                                 conv_tol, ad_decomp_reg, adjoint_max_iter,
                                 adjoint_tol):
    """custom-VJP converged generic abelian environment (implicit
    Neumann adjoint, cf. the C4v version).

    The returned callable ``converge(sites, Cs, Ts) -> (Cs*, Ts*)``
    closes over the state's geometry (vertexToSite) and the frozen
    profiles; call it inside a jitted loss so the while_loop compiles
    once per structure.
    """
    sym, lX, lY = state.sym, state.lX, state.lY
    v2s = state.vertexToSite
    keeps = _prof_dict(profiles)
    mseq = tuple(tuple(d) for d in move_seq)

    def sweep(sites, Cs, Ts, sg):
        st = IPEPS_ABELIAN(sym, sites, vertexToSite=v2s, lX=lX, lY=lY)
        e = _sweep(st, ENV_ABELIAN(chi, Cs, Ts), keeps, mseq, lX, lY,
                   ad_decomp_reg, sg)
        return dict(e.C), dict(e.T)

    @jax.custom_vjp
    def converge(sites, Cs, Ts):
        def cond(carry):
            _, _, i, d2 = carry
            return jnp.logical_and(i < max_iter, d2 > conv_tol * conv_tol)

        def body(carry):
            C0, T0, i, _ = carry
            C1, T1 = sweep(sites, C0, T0, True)
            d2 = _env_dist2((C1, T1), (C0, T0))
            return (C1, T1, i + 1, d2)

        init = (Cs, Ts, jnp.asarray(0), jnp.asarray(jnp.inf, jnp.float64))
        Cf, Tf, _, _ = lax.while_loop(cond, body, init)
        return Cf, Tf

    def fwd(sites, Cs, Ts):
        Cf, Tf = converge(sites, Cs, Ts)
        return (Cf, Tf), (sites, Cf, Tf)

    def bwd(res, cot):
        sites, Cf, Tf = res
        _, vjp_fn = jax.vjp(lambda s_, C_, T_: sweep(s_, C_, T_, False),
                            sites, Cf, Tf)

        def norm2(t):
            return sum(jnp.vdot(x, x).real for x in jax.tree_util.tree_leaves(t))

        cot_norm = norm2(cot)
        da0 = jax.tree_util.tree_map(jnp.zeros_like, sites)

        def cond(carry):
            _, u, i, delta, _, grew = carry
            return jnp.logical_and(
                jnp.logical_and(i < adjoint_max_iter,
                                delta > adjoint_tol**2 * cot_norm),
                jnp.logical_and(grew < 4, delta < 1.0e4 * cot_norm),
            )

        def body(carry):
            da, u, i, delta, _, grew = carry
            da_i, uC, uT = vjp_fn(u)
            da = jax.tree_util.tree_map(jnp.add, da, da_i)
            delta_next = norm2((uC, uT))
            grew = jnp.where(delta_next > delta, grew + 1, 0)
            return (da, (uC, uT), i + 1, delta_next, delta, grew)

        init = (da0, cot, jnp.asarray(0), cot_norm, jnp.asarray(jnp.inf),
                jnp.asarray(0))
        da, _, n_adj, delta_f, _, grew_f = lax.while_loop(cond, body, init)
        diverged = jnp.logical_and(
            jnp.logical_or(grew_f >= 4, delta_f >= 1.0e4 * cot_norm),
            delta_f > adjoint_tol**2 * cot_norm,
        )
        lax.cond(
            diverged,
            lambda: jax.debug.print(
                "tpeps: frozen generic abelian adjoint diverging (iter {i}, "
                "|u|^2={d}); gradient truncated", i=n_adj, d=delta_f,
            ),
            lambda: None,
        )
        zC = jax.tree_util.tree_map(jnp.zeros_like, Cf)
        zT = jax.tree_util.tree_map(jnp.zeros_like, Tf)
        return (da, zC, zT)

    converge.defvjp(fwd, bwd)
    return converge


def converge_frozen_generic(state, env: ENV_ABELIAN, profiles=None,
                            move_seq=((0, -1), (-1, 0), (0, 1), (1, 0)),
                            max_iter: int = 100, conv_tol: float = 1.0e-9,
                            ad_decomp_reg: float = 1.0e-12,
                            adjoint_max_iter: int = 100,
                            adjoint_tol: float = 1.0e-8):
    """Differentiable converged generic abelian environment from a warm
    (phase-1) env; blocks must be jnp.  Returns a new ENV_ABELIAN;
    gradients flow into the state's site blocks."""
    if profiles is None:
        profiles = freeze_profiles(state, env, env.chi)
    env = close_structure_generic(state, env.clone(), _prof_dict(profiles),
                                  tuple(tuple(d) for d in move_seq))
    fn = make_converge_frozen_generic(
        state, env.chi, profiles, move_seq, max_iter, conv_tol,
        ad_decomp_reg, adjoint_max_iter, adjoint_tol,
    )
    Cf, Tf = fn(dict(state.sites), dict(env.C), dict(env.T))
    return ENV_ABELIAN(env.chi, Cf, Tf)
