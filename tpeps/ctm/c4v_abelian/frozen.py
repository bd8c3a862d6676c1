"""Frozen-structure C4v abelian CTMRG: TPU-resident, differentiable.

Two-phase execution model (the TPU answer to YASTN's device-resident
torch backend, reference ctm/generic_abelian/ctmrg.py:130-224):

* **Phase 1 (dynamic, host)** — :func:`tpeps.ctm.c4v_abelian.ctmrg.run`
  iterates with data-dependent global truncation until the per-sector
  chi profile stabilizes.  Cheap numpy on O(D) blocks; finds WHERE the
  symmetry sectors want to spend the environment dimension.
* **Phase 2 (frozen, device)** — with the sector profile frozen as
  static metadata, the whole move becomes a fixed-shape jnp program
  over the block pytree: one ``jax.jit`` compilation, a
  ``lax.while_loop`` to the elementwise fixed point, and implicit
  (Neumann-adjoint) differentiation exactly as the dense C4v engine
  (tpeps/ctm/c4v/ctmrg.py:365-447).  This is what makes *optimization*
  of U(1)/Z2 states possible here (reference:
  examples/j1j2/abelian/optim_j1j2_c4v_u1.py) and puts the abelian move
  on the TPU as one compiled program.

Between optimization steps the frozen profile is reused (warm env);
if the state drifts enough that the profile goes stale (detected by a
fixed-point residual that stops improving), callers re-run phase 1.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ...sym.frozen import eigh_blockwise_fixed, reindex_like
from ...sym.tensor import AbelianTensor
from ..generic_abelian.components import c2x2_lu
from .env import ENV_C4V_ABELIAN, flip_signature


def _normalized(t: AbelianTensor, sg: bool) -> AbelianTensor:
    s = jnp.max(jnp.stack([jnp.max(jnp.abs(b)) for b in t.blocks.values()]))
    return t * (1.0 / (lax.stop_gradient(s) if sg else s))


def move_frozen(a, C, T, keep, ad_decomp_reg: float = 1.0e-12,
                sg_norm: bool = True):
    """One C4v move at frozen sector profile ``keep`` (traced counterpart
    of :func:`tpeps.ctm.c4v_abelian.ctmrg.ctm_move_sl`): same enlarged
    corner, same sublattice bookkeeping, truncation by
    :func:`eigh_blockwise_fixed`, output reindexed onto the input block
    set so the env pytree structure is invariant.

    ``sg_norm``: stop-gradient the max-abs normalization scale.  The
    forward fixed-point iteration uses True (no AD runs there); the
    implicit adjoint must use False — with the scale detached, the move
    Jacobian keeps an eigenvalue ~1 along the growth direction and the
    Neumann series stalls (same reason the dense engine's adjoint move
    runs with sg_norm=False, tpeps/ctm/c4v/ctmrg.py:389)."""
    M = c2x2_lu(C, T, T.transpose((0, 3, 1, 2)), a)
    P, _W = eigh_blockwise_fixed(M, (0, 1, 2), (3, 4, 5), keep,
                                 ad_decomp_reg=ad_decomp_reg)

    nC = P.conj().tensordot(M, ((0, 1, 2), (0, 1, 2)))
    nC = nC.tensordot(flip_signature(P), ((1, 2, 3), (0, 1, 2)))

    Tf = flip_signature(T)
    af = flip_signature(a)
    z = P.tensordot(Tf, ((0,), (0,)))
    z = z.tensordot(af, ((0, 3), (1, 2)))
    z = z.tensordot(af.conj(), ((0, 2, 4), (1, 2, 0)))
    nT = z.tensordot(P, ((1, 2, 4), (0, 1, 2)))

    nC = 0.5 * (nC + nC.transpose((1, 0)).conj_blocks())
    nT = 0.5 * (nT + nT.transpose((3, 1, 2, 0)).conj_blocks())
    nC = _normalized(nC, sg_norm)
    nT = _normalized(nT, sg_norm)
    return reindex_like(nC, C), reindex_like(nT, T)


def close_structure(a, C, T, keep, n_max: int = 6):
    """Close the (C, T) block sets under the frozen move.

    The move's output block set is a deterministic function of the
    input block sets (tensordot produces a key iff charge-matching
    inputs exist), so iterating ``jax.eval_shape`` — zero FLOPs — until
    the key sets stop growing yields the closure; zero-filled blocks
    make the env pytree structure move-invariant.
    """
    for _ in range(n_max):
        oC, oT = jax.eval_shape(partial(move_frozen, keep=keep), a, C, T)
        newC = set(oC.blocks) | set(C.blocks)
        newT = set(oT.blocks) | set(T.blocks)
        if newC == set(C.blocks) and newT == set(T.blocks):
            return C, T
        # grow to the union (reindex_like fills zeros for missing keys)
        refC = oC if set(oC.blocks) >= newC else _union_ref(C, oC)
        refT = oT if set(oT.blocks) >= newT else _union_ref(T, oT)
        C = _complete(C, refC)
        T = _complete(T, refT)
    raise RuntimeError("abelian env structure failed to close under the move")


def _union_ref(t, o):
    """Reference tensor whose block set is the union of ``t`` and ``o``."""
    blocks = dict(t.blocks)
    for q in o.blocks:
        if q not in blocks:
            blocks[q] = o.blocks[q]  # may be ShapeDtypeStruct; only shape used
    return AbelianTensor(t.sym, t.signature, t.legs, t.n, blocks, t.dtype,
                         t.fermionic, t.conj_reversal)

def _complete(t, ref):
    blocks = {}
    for q, rb in ref.blocks.items():
        b = t.blocks.get(q)
        blocks[q] = b if b is not None else jnp.zeros(rb.shape, t.dtype)
    return AbelianTensor(t.sym, t.signature, t.legs, t.n, blocks, t.dtype,
                         t.fermionic, t.conj_reversal)


def _env_dist2(e1, e2):
    return sum(
        jnp.sum(jnp.abs(x - y) ** 2)
        for x, y in zip(jax.tree_util.tree_leaves(e1), jax.tree_util.tree_leaves(e2))
    )


@partial(jax.jit, static_argnames=("keep", "max_iter", "ad_decomp_reg"))
def run_frozen(a, C, T, keep, max_iter: int = 200, conv_tol: float = 1.0e-10,
               ad_decomp_reg: float = 1.0e-12):
    """Iterate the frozen move to the elementwise fixed point under
    ``lax.while_loop`` — one compiled device program end to end.

    :param keep: frozen chi profile as a hashable tuple of
        ``(sector_charge, dim)`` pairs (static argument).
    :return: ``(C*, T*, n_iter, dist2)``
    """
    kd = dict(keep)
    move = partial(move_frozen, keep=kd, ad_decomp_reg=ad_decomp_reg)

    def cond(carry):
        _, _, i, d2 = carry
        return jnp.logical_and(i < max_iter, d2 > conv_tol * conv_tol)

    def body(carry):
        C0, T0, i, _ = carry
        C1, T1 = move(a, C0, T0)
        d2 = _env_dist2((C1, T1), (C0, T0))
        return (C1, T1, i + 1, d2)

    # start the loop directly on (C, T): close_structure already pinned
    # the pytree structure, so the carry is move-invariant (tracing the
    # move once, in the body only, halves the compile time)
    init = (C, T, jnp.asarray(0), jnp.asarray(jnp.inf, jnp.float64))
    Cf, Tf, n, d2 = lax.while_loop(cond, body, init)
    return Cf, Tf, n, d2


@functools.lru_cache(maxsize=None)
def _make_converge_frozen(keep, max_iter, conv_tol, ad_decomp_reg,
                          adjoint_max_iter, adjoint_tol):
    """Factory for the custom-VJP converged frozen environment.

    Same implicit-function-theorem construction as the dense C4v engine
    (tpeps/ctm/c4v/ctmrg.py:365-447): forward runs to the fixed point
    with no AD history; backward solves the adjoint equation
    ``u = (dmove/denv)^T u + ybar`` by Neumann iteration with the
    divergence guard, accumulating ``abar``.
    """
    kd = dict(keep)
    move = partial(move_frozen, keep=kd, ad_decomp_reg=ad_decomp_reg,
                   sg_norm=False)

    @jax.custom_vjp
    def converge(a, C, T):
        Cf, Tf, _, _ = run_frozen(a, C, T, keep, max_iter=max_iter,
                                  conv_tol=conv_tol, ad_decomp_reg=ad_decomp_reg)
        return Cf, Tf

    def fwd(a, C, T):
        Cf, Tf = converge(a, C, T)
        return (Cf, Tf), (a, Cf, Tf)

    def bwd(res, cot):
        a, Cf, Tf = res
        _, vjp_fn = jax.vjp(lambda a_, C_, T_: move(a_, C_, T_), a, Cf, Tf)

        def norm2(t):
            return sum(jnp.vdot(x, x).real for x in jax.tree_util.tree_leaves(t))

        cot_norm = norm2(cot)
        da0 = jax.tree_util.tree_map(jnp.zeros_like, a)

        # Divergence guard: the CTMRG Jacobian's complex eigenvalue
        # pairs make |u_k| decay with transient oscillations, so a
        # tight "grew twice -> abort" guard (as in the dense engine)
        # truncates convergENT series early (measured: rel FD error
        # 4e-3 from aborting at iter 8 on a D=3 U(1) state).  Abort
        # only on sustained growth (4 consecutive) or on outright
        # blow-up past 1e4 x the injected cotangent norm.
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
            u_next = (uC, uT)
            da = jax.tree_util.tree_map(jnp.add, da, da_i)
            delta_next = norm2(u_next)
            grew = jnp.where(delta_next > delta, grew + 1, 0)
            return (da, u_next, i + 1, delta_next, delta, grew)

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
                "tpeps: frozen abelian CTMRG adjoint diverging (iter {i}, "
                "|u|^2={d}); gradient truncated", i=n_adj, d=delta_f,
            ),
            lambda: None,
        )
        zC = jax.tree_util.tree_map(jnp.zeros_like, Cf)
        zT = jax.tree_util.tree_map(jnp.zeros_like, Tf)
        return (da, zC, zT)

    converge.defvjp(fwd, bwd)
    return converge


def freeze_from_env(env: ENV_C4V_ABELIAN):
    """Extract the frozen chi profile from a (host-)converged env: the
    sector table of the corner's first leg, as a hashable tuple."""
    return tuple(sorted(env.C.legs[0].charges))


def converge_frozen(a, env: ENV_C4V_ABELIAN, keep=None, max_iter: int = 200,
                    conv_tol: float = 1.0e-10, ad_decomp_reg: float = 1.0e-12,
                    adjoint_max_iter: int = 100, adjoint_tol: float = 1.0e-8):
    """Differentiable converged environment from a warm (phase-1) env.

    ``a`` and ``env`` must carry jnp blocks (``.to_backend("jnp")``).
    Returns a new :class:`ENV_C4V_ABELIAN`; gradients flow into ``a``'s
    blocks via the implicit adjoint.
    """
    if keep is None:
        keep = freeze_from_env(env)
    C, T = close_structure(a, env.C, env.T, dict(keep))
    fn = _make_converge_frozen(tuple(keep), max_iter, conv_tol, ad_decomp_reg,
                               adjoint_max_iter, adjoint_tol)
    Cf, Tf = fn(a, C, T)
    return ENV_C4V_ABELIAN(env.chi, Cf, Tf)
