"""C4v single-layer CTMRG: jitted move, on-device fixed-point loop, and
two reverse-mode differentiation strategies.

Counterpart of reference ctm/one_site_c4v/ctmrg_c4v.py:16-464
(``run`` + ``ctm_MOVE_sl``), re-designed for XLA:

* the move is a pure function ``(a, C, T) -> (C', T', spec)`` — traced
  once per (d, D, chi, dtype) and reused,
* the CTMRG fixed-point loop is a ``lax.while_loop`` carrying the
  environment pytree with an on-device, gauge-invariant convergence
  check on the normalized corner spectrum (the reference's
  ``ctmrg_conv_specC`` criterion, ctm/generic/env.py:817),
* gradients cross the loop either by **implicit differentiation** of
  the fixed point (adjoint solved by Neumann-series VJP iteration —
  the same mathematics as YASTN's ``FixedPoint`` used by the reference
  for fermionic examples, ipeps/integration_yastn.py + honeycomb/CI.py)
  or by a **checkpointed scan** over a fixed tail of moves
  (the reference's ``fwd_checkpoint_move`` backprop-through-iterations,
  ctmrg_c4v.py:454-458, with memory O(1) per move via
  ``jax.checkpoint``).

Index conventions follow :mod:`tpeps.ctm.c4v.env`; the enlarged corner
is built layer-by-layer, never forming the D^4 double-layer tensor
(reference ctm_components_c4v.py:52-130).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ...linalg.eigh import fix_eigvec_phase, truncated_eigh_sym
from ...linalg.power import cold_start_basis, procrustes_align, subspace_eigh
from .env import EnvC4v


def _ct_tl(a, C, T):
    """Shared C-Ttop-Tleft prefix as ``q[(j,m,v,i), (u,l)]`` ready for the
    ket-layer matmul (dims fused into large 2D shapes — XLA:TPU pads
    tiny trailing dims to full (8,128) tiles, so einsum graphs with many
    size-D axes waste up to ~18x HBM; explicit fused matmuls avoid it).
    """
    chi = C.shape[0]
    D = a.shape[1]
    # ct[x, (u,v,i)] = C[x,y] Ttop[y,(u,v,i)]; top-T enters with its
    # right index leading in storage [i,y,u,v] -> bring y first
    Tt = T.reshape(chi, chi, D, D).transpose(1, 2, 3, 0).reshape(chi, D * D * chi)
    ct = C @ Tt  # (chi, D^2 chi): x, (u,v,i)
    # q[(j,l,m),(u,v,i)] = Tl[x,(j,l,m)]^T ct[x,(u,v,i)]
    Tl = T.reshape(chi, chi * D * D)
    q = Tl.T @ ct  # (chi D^2, D^2 chi)
    # rearrange to rows (j,m,v,i), cols (u,l)
    q = q.reshape(chi, D, D, D, D, chi)  # j,l,m,u,v,i
    q = q.transpose(0, 2, 4, 5, 3, 1).reshape(chi * D * D * chi, D * D)
    return q


def c2x2_sl(a, C, T):
    """Single-layer enlarged upper-left corner as a (chi D^2, chi D^2) matrix.

    Row index = (down-chi, down-ket, down-bra), column index =
    (right-chi, right-ket, right-bra), matching reference
    ctm_components_c4v.py:52-130.  Cost O(chi^2 D^4 (D^2 + d)); every
    contraction is a large fused-dimension matmul for the MXU.
    """
    chi = C.shape[0]
    D = a.shape[1]
    d = a.shape[0]
    q = _ct_tl(a, C, T)  # [(j,m,v,i),(u,l)]
    # ket layer: (u,l) x a[(u,l),(s,e,r)]
    a_k = a.transpose(1, 2, 0, 3, 4).reshape(D * D, d * D * D)
    q = q @ a_k  # [(j,m,v,i),(s,e,r)]
    # bra layer: (m,v,s) x conj(a)[(m,v,s),(f,g)]
    q = q.reshape(chi, D, D, chi, d, D, D)  # j,m,v,i,s,e,r
    q = q.transpose(0, 3, 5, 6, 1, 2, 4).reshape(chi * chi * D * D, D * D * d)
    a_b = jnp.conj(a).transpose(2, 1, 0, 3, 4).reshape(D * D * d, D * D)
    q = q @ a_b  # [(j,i,e,r),(f,g)]
    q = q.reshape(chi, chi, D, D, D, D)  # j,i,e,r,f,g
    q = q.transpose(0, 2, 4, 1, 3, 5).reshape(chi * D * D, chi * D * D)
    return q


def open_c2x2_sl(a, C, T):
    """Enlarged upper-left corner with open physical indices.

    Returns ``[ (down-chi, dk, db), (right-chi, rk, rb), s, s' ]`` with
    ``s`` from the ket (non-conjugated) layer — reference
    rdm_c4v.py:24-92 (``_get_open_C2x2_LU_sl``).
    """
    chi = C.shape[0]
    D = a.shape[1]
    d = a.shape[0]
    q = _ct_tl(a, C, T)
    a_k = a.transpose(1, 2, 0, 3, 4).reshape(D * D, d * D * D)
    q = q @ a_k
    # bra layer keeping both physical indices open: contract (m,v) only
    q = q.reshape(chi, D, D, chi, d, D, D)  # j,m,v,i,s,e,r
    q = q.transpose(0, 3, 4, 5, 6, 1, 2).reshape(chi * chi * d * D * D, D * D)
    a_b = jnp.conj(a).transpose(2, 1, 0, 3, 4).reshape(D * D, d * D * D)
    q = q @ a_b  # [(j,i,s,e,r),(z,f,g)]
    q = q.reshape(chi, chi, d, D, D, d, D, D)  # j,i,s,e,r,z,f,g
    q = q.transpose(0, 3, 6, 1, 4, 7, 2, 5).reshape(chi * D * D, chi * D * D, d, d)
    return q


def _absorb_T(a, T, P4):
    """Renormalize the half-row tensor: T' = P^H (T a a*) P, layer by layer
    (reference ctmrg_c4v.py:380-445) — fused-dimension matmuls throughout
    (see :func:`_ct_tl` for why)."""
    chi = T.shape[0]
    D = a.shape[1]
    d = a.shape[0]
    chi_n = P4.shape[-1]
    # z[(u,v,p),(d,l,m)] = P[c,(u,v,p)]^T T[c,(d,l,m)]
    P_r = P4.reshape(chi, D * D * chi_n)
    T_r = T.reshape(chi, chi * D * D)
    z = P_r.T @ T_r  # (D^2 chi', chi D^2)
    # ket layer: rows (v,p,d,m), cols (u,l)
    z = z.reshape(D, D, chi_n, chi, D, D)  # u,v,p,d,l,m
    z = z.transpose(1, 2, 3, 5, 0, 4).reshape(D * chi_n * chi * D, D * D)
    a_k = a.transpose(1, 2, 0, 3, 4).reshape(D * D, d * D * D)
    z = z @ a_k  # [(v,p,d,m),(s,e,r)]
    # bra layer: rows (p,d,e,r), cols (m,v,s)
    z = z.reshape(D, chi_n, chi, D, d, D, D)  # v,p,d,m,s,e,r
    z = z.transpose(1, 2, 5, 6, 3, 0, 4).reshape(chi_n * chi * D * D, D * D * d)
    a_b = jnp.conj(a).transpose(2, 1, 0, 3, 4).reshape(D * D * d, D * D)
    z = z @ a_b  # [(p,d,e,r),(f,g)]
    # close with P*: rows (p,r,g), cols (d,e,f)
    z = z.reshape(chi_n, chi, D, D, D, D)  # p,d,e,r,f,g
    z = z.transpose(0, 3, 5, 1, 2, 4).reshape(chi_n * D * D, chi * D * D)
    Pc = jnp.conj(P4).reshape(chi * D * D, chi_n)
    nT = z @ Pc  # [(p,r,g), q]
    nT = nT.reshape(chi_n, D * D, chi_n).transpose(0, 2, 1)  # p,q,(r,g)
    # hermitian-symmetrize T'_{ija} = (T'_{ija} + T'*_{jia})/2 (ctmrg_c4v.py:447)
    nT = 0.5 * (nT + jnp.conj(nT.transpose(1, 0, 2)))
    return nT


def fix_phase_continuity(P, P_ref):
    """Phase-fix projector columns against a reference projector.

    The C4v CTMRG environment is only defined up to a per-eigenvector
    phase; with an absolute (pivot-based) gauge the iteration typically
    settles into a period-2 sign cycle in T and never reaches an
    elementwise fixed point.  Rotating each column of ``P`` so its
    overlap with the corresponding column of the previous iteration's
    projector is real-positive removes the cycle, which is what implicit
    differentiation of the fixed point requires.  Columns with ~zero
    overlap (first iteration, rank growth) fall back to the pivot gauge.
    Differentiable a.e. (phases enter through smooth complex division).
    """
    ov = jnp.sum(jnp.conj(P_ref) * P, axis=0)
    if jnp.iscomplexobj(P):
        phase = ov / jnp.maximum(jnp.abs(ov), 1e-300)
    else:
        phase = jnp.sign(ov)
    P_pivot = fix_eigvec_phase(P)
    small = jnp.abs(jax.lax.stop_gradient(ov)) < 1e-12
    return jnp.where(small[None, :], P_pivot, P * jnp.conj(phase)[None, :])


def ctm_move_sl(
    a,
    env: EnvC4v,
    P_ref=None,
    *,
    keep_multiplets: bool = True,
    eps_multiplet: float = 1.0e-12,
    ad_decomp_reg: float = 1.0e-12,
    absorb_normalization: str = "inf",
    sg_norm: bool = True,
    gauge_fix: bool = True,
    projector_method: str = "SYMEIG",
    n_power: int = 2,
):
    """One C4v CTMRG step (reference ``ctm_MOVE_sl``, ctmrg_c4v.py:325-464).

    1. build enlarged corner (single-layer),
    2. truncated symmetric eigendecomposition -> projector P,
    3. C' = diag(spectrum), T' = P^H (T a a*) P, symmetrized,
    4. normalize (C by leading eigenvalue, T by inf- or 2-norm).

    :param P_ref: previous/converged projector for the continuity gauge
        (see :func:`fix_phase_continuity`); with ``None`` an absolute
        pivot gauge is used.
    :param sg_norm: treat normalization scales as constants under AD
        (the reference computes them under ``torch.no_grad``,
        ctmrg_c4v.py:186-196).  The implicit-diff adjoint uses
        ``sg_norm=False`` so the differentiated map is exactly the
        iterated one.
    :param gauge_fix: phase-fix projector columns so the environment
        converges elementwise (required for implicit differentiation).
    :return: ``(EnvC4v(C', T'), spec, P)`` with ``spec`` the normalized
        corner spectrum (descending by magnitude) for convergence checks.
    """
    C, T = env
    chi = C.shape[0]
    D = a.shape[1]

    M = c2x2_sl(a, C, T)
    M = 0.5 * (M + M.conj().T)
    if projector_method == "QR":
        # QR-CTM projector (reference ctm_MOVE_QR_sl, ctmrg_c4v.py:465,
        # arXiv:2505.00494 pattern): the isometry is the Q factor of the
        # *half*-enlarged corner C.T reshaped (chi D^2, chi) — no
        # eigen/singular decomposition at all, a single tall QR.  The
        # corner C' = P^H M P is no longer diagonal; the spectrum for
        # convergence checks comes from a cheap chi x chi eigh.
        C1x2 = jnp.tensordot(C, T, ((1,), (1,)))      # (x, w, D^2)
        C1x2 = C1x2.transpose(0, 2, 1).reshape(chi * D * D, chi)
        P, _R = jnp.linalg.qr(C1x2)
        if gauge_fix:
            if P_ref is None:
                P = fix_eigvec_phase(P)
            else:
                P, _W = procrustes_align(P, P_ref)
        nC = P.conj().T @ (M @ P)
        nC = 0.5 * (nC + nC.conj().T)
        Dspec = jnp.linalg.eigvalsh(nC)
        order = jnp.argsort(-jnp.abs(Dspec))
        Dspec = Dspec[order]
        scale_C = jnp.abs(Dspec[0])
        if sg_norm:
            scale_C = lax.stop_gradient(scale_C)
        spec = Dspec / scale_C
        nC = nC / scale_C
        nT = _absorb_T(a, T, P.reshape(chi, D, D, chi))  # symmetrizes internally
        if absorb_normalization == "inf":
            scale_T = jnp.abs(nT).max()
        else:
            scale_T = jnp.linalg.norm(nT.ravel())
        if sg_norm:
            scale_T = lax.stop_gradient(scale_T)
        return EnvC4v(nC, nT / scale_T), spec, P
    if projector_method == "POWER":
        # warm-started subspace iteration: MXU matmuls + (chi x chi)
        # Rayleigh-Ritz only — the TPU-native projector (XLA's dense
        # eigh has pathological compile times at chi*D^2 scale)
        P0 = P_ref if P_ref is not None else cold_start_basis(M.shape[0], chi, M.dtype)
        Dspec, P = subspace_eigh(
            M, P0, n_power=n_power, keep_multiplets=keep_multiplets,
            eps_multiplet=eps_multiplet, ad_decomp_reg=ad_decomp_reg,
        )
    else:
        Dspec, P = truncated_eigh_sym(
            M, chi, keep_multiplets=keep_multiplets,
            ad_decomp_reg=ad_decomp_reg, eps_multiplet=eps_multiplet,
        )
    W = None
    if gauge_fix:
        if P_ref is None:
            P = fix_eigvec_phase(P)
        else:
            # full-basis Procrustes continuity: pins phases AND rotations
            # inside degenerate multiplets -> elementwise fixed point.
            # The column mask keeps the alignment block-diagonal w.r.t.
            # the multiplet-safe truncation (see procrustes_align).
            cmask = (jnp.abs(lax.stop_gradient(Dspec)) > 0)
            P, W = procrustes_align(P, P_ref, col_mask=cmask)

    scale_C = jnp.abs(Dspec[0])
    if sg_norm:
        scale_C = lax.stop_gradient(scale_C)
    spec = Dspec / scale_C
    if W is None:
        nC = jnp.diag(spec.astype(C.dtype))
    else:
        # C in the rotated basis: W^H diag(spec) W (hermitian, non-diagonal)
        nC = (W.conj().T * spec.astype(C.dtype)[None, :]) @ W

    nT = _absorb_T(a, T, P.reshape(chi, D, D, chi))
    if absorb_normalization == "inf":
        scale_T = jnp.abs(nT).max()
    else:
        scale_T = jnp.linalg.norm(nT.ravel())
    if sg_norm:
        scale_T = lax.stop_gradient(scale_T)
    nT = nT / scale_T

    return EnvC4v(nC, nT), spec, P


@partial(
    jax.jit,
    static_argnames=(
        "max_iter", "conv_tol", "keep_multiplets", "eps_multiplet",
        "ad_decomp_reg", "absorb_normalization", "conv_on",
        "projector_method", "n_power",
    ),
)
def run_fixed_point(
    a,
    env: EnvC4v,
    *,
    max_iter: int = 50,
    conv_tol: float = 1.0e-8,
    keep_multiplets: bool = True,
    eps_multiplet: float = 1.0e-12,
    ad_decomp_reg: float = 1.0e-12,
    absorb_normalization: str = "inf",
    conv_on: str = "spec",
    projector_method: str = "SYMEIG",
    n_power: int = 2,
):
    """Run CTMRG to convergence fully on-device (no AD through this).

    ``lax.while_loop`` over moves with the continuity gauge (the
    previous projector is carried and each new projector is phase-fixed
    against it), so the environment converges *elementwise*.

    Convergence criterion:

    * ``conv_on="spec"`` — l2 distance of successive normalized corner
      spectra, the gauge-invariant ``ctmrg_conv_specC`` of reference
      ctm/generic/env.py:817,
    * ``conv_on="env"`` — max-norm distance of successive (C, T)
      elementwise; required by implicit differentiation.

    :return: ``(env, n_iter, dist, P)`` with ``P`` the last projector
        (the gauge reference for the implicit adjoint).
    """
    move = partial(
        ctm_move_sl,
        keep_multiplets=keep_multiplets, eps_multiplet=eps_multiplet,
        ad_decomp_reg=ad_decomp_reg, absorb_normalization=absorb_normalization,
        sg_norm=True, gauge_fix=True,
        projector_method=projector_method, n_power=n_power,
    )
    chi = env.C.shape[0]
    D = a.shape[1]
    rdtype = env.C.real.dtype
    spec0 = jnp.full((chi,), jnp.inf, dtype=rdtype)
    # full-rank gauge reference: the Procrustes alignment needs a
    # non-degenerate overlap with the first projector
    P0 = cold_start_basis(chi * D * D, chi, env.C.dtype)

    def cond(carry):
        _, _, _, dist, i = carry
        return jnp.logical_and(i < max_iter, dist > conv_tol)

    def body(carry):
        e, P_prev, spec_prev, _, i = carry
        e2, spec, P = move(a, e, P_prev)
        if conv_on == "env":
            dist = jnp.maximum(
                jnp.abs(e2.C - e.C).max(), jnp.abs(e2.T - e.T).max()
            )
        else:
            dist = jnp.linalg.norm(jnp.abs(spec) - jnp.abs(spec_prev))
        dist = jnp.where(jnp.isfinite(dist), dist, jnp.inf)
        return (e2, P, jnp.abs(spec), dist, i + 1)

    carry = (env, P0, spec0, jnp.asarray(jnp.inf, dtype=rdtype), jnp.asarray(0))
    env, P, _, dist, n_iter = lax.while_loop(cond, body, carry)
    return env, n_iter, dist, P


# ---------------------------------------------------------------------------
# Differentiable convergence: implicit fixed-point differentiation
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_converge_implicit(
    keep_multiplets, eps_multiplet, ad_decomp_reg, absorb_normalization,
    max_iter, conv_tol, adjoint_max_iter, adjoint_tol,
    projector_method="SYMEIG", n_power=2,
):
    """Factory for the custom-VJP converged-environment function.

    Forward: run to the fixed point without AD.  Backward: solve the
    adjoint fixed-point equation ``u = (df/denv)^T u + ybar`` by Neumann
    iteration, accumulating ``abar = sum_k (df/da)^T u_k``.  This is the
    implicit-function-theorem gradient of the CTMRG fixed point —
    constant memory in the number of forward iterations.

    The Neumann series only converges when the move's Jacobian at the
    fixed point is contracting; near criticality its spectral radius
    approaches 1 and the series can diverge.  The backward loop guards
    against this: it tracks ``‖u_k‖`` and aborts (keeping the partial
    sum, warning via ``jax.debug.print``) once the norm has grown for
    two consecutive iterations — a silently wrong gradient becomes a
    loudly truncated one.  Use ``grad_mode="scan"`` near criticality.
    """
    move_ad = partial(
        ctm_move_sl,
        keep_multiplets=keep_multiplets, eps_multiplet=eps_multiplet,
        ad_decomp_reg=ad_decomp_reg, absorb_normalization=absorb_normalization,
        sg_norm=False, gauge_fix=True,
        projector_method=projector_method, n_power=n_power,
    )

    def _converge_raw(a, env):
        return run_fixed_point(
            a, env, max_iter=max_iter, conv_tol=conv_tol,
            keep_multiplets=keep_multiplets, eps_multiplet=eps_multiplet,
            ad_decomp_reg=ad_decomp_reg, absorb_normalization=absorb_normalization,
            conv_on="env",
            projector_method=projector_method, n_power=n_power,
        )

    @jax.custom_vjp
    def converge(a, env):
        e, _, _, _ = _converge_raw(a, env)
        return e

    def fwd(a, env):
        e, _, _, P = _converge_raw(a, env)
        return e, (a, e, P)

    def bwd(res, cot):
        a, e, P_star = res
        # differentiate the move in the converged continuity gauge: the
        # gauge reference is the fixed-point projector itself (constant)
        _, vjp_fn = jax.vjp(
            lambda a_, e_: move_ad(a_, e_, lax.stop_gradient(P_star))[0], a, e
        )

        def norm2(t):
            return sum(jnp.vdot(x, x).real for x in jax.tree_util.tree_leaves(t))

        cot_norm = norm2(cot)
        da0 = jax.tree_util.tree_map(jnp.zeros_like, a)

        def cond(carry):
            _, u, i, delta, _, grew = carry
            return jnp.logical_and(
                jnp.logical_and(i < adjoint_max_iter, delta > adjoint_tol**2 * cot_norm),
                grew < 2,  # divergence guard: stop on non-contracting series
            )

        def body(carry):
            da, u, i, delta, _, grew = carry
            da_i, u_next = vjp_fn(u)
            da = jax.tree_util.tree_map(jnp.add, da, da_i)
            delta_next = norm2(u_next)
            grew = jnp.where(delta_next > delta, grew + 1, 0)
            return (da, u_next, i + 1, delta_next, delta, grew)

        init = (da0, cot, jnp.asarray(0), cot_norm, jnp.asarray(jnp.inf), jnp.asarray(0))
        da, _, n_adj, delta_f, _, grew_f = lax.while_loop(cond, body, init)
        diverged = jnp.logical_and(grew_f >= 2, delta_f > adjoint_tol**2 * cot_norm)
        jax.lax.cond(
            diverged,
            lambda: jax.debug.print(
                "tpeps: implicit CTMRG adjoint diverging (|u| grew twice, "
                "iter {i}, |u|^2={d}); gradient truncated — use grad_mode='scan'",
                i=n_adj, d=delta_f,
            ),
            lambda: None,
        )
        zero_env = jax.tree_util.tree_map(jnp.zeros_like, e)
        return (da, zero_env)

    converge.defvjp(fwd, bwd)
    return converge


def _cfg_projector(ctm_cfg):
    """Resolve (projector_method, n_power) from CtmArgs.

    ``projector_svd_method`` follows the reference's SVD-method selector
    (config.py:246-415) reduced to the TPU-sensible zoo: DEFAULT/SYMEIG
    (dense symmetric eig), POWER (warm-started subspace iteration) or
    QR (decomposition-free half-corner isometry, reference
    ctm_MOVE_QR_sl)."""
    method = ctm_cfg.projector_svd_method
    if method in ("DEFAULT", "SYMEIG"):
        method = "SYMEIG"
    elif method not in ("POWER", "QR"):
        raise ValueError(f"Unsupported projector_svd_method {method}")
    return method, getattr(ctm_cfg, "n_power", 2)


def converge_env(a, env: EnvC4v, ctm_cfg) -> EnvC4v:
    """Differentiable converged environment with the strategy selected by
    ``ctm_cfg.grad_mode`` (see :class:`tpeps.config.CtmArgs`)."""
    method, n_power = _cfg_projector(ctm_cfg)
    if ctm_cfg.grad_mode == "implicit":
        # the implicit adjoint differentiates the projector
        # decompositions AT the fixed point, where exact spectral
        # multiplets make weakly-regularized gap inverses explode
        # (observed |u|^2 ~ 1e14 after one adjoint sweep on SU(2)
        # states); ad_decomp_reg only conditions the VJP — forward
        # values are unaffected — so floor it here
        fn = _make_converge_implicit(
            True, 1.0e-12,
            max(ctm_cfg.ad_decomp_reg, ctm_cfg.grad_adjoint_decomp_reg),
            ctm_cfg.ctm_absorb_normalization,
            ctm_cfg.ctm_max_iter, ctm_cfg.ctm_conv_tol,
            ctm_cfg.grad_adjoint_max_iter, ctm_cfg.grad_adjoint_tol,
            method, n_power,
        )
        return fn(a, env)
    if ctm_cfg.grad_mode == "scan":
        e0, _, _, _ = run_fixed_point(
            lax.stop_gradient(a), env,
            max_iter=ctm_cfg.ctm_max_iter, conv_tol=ctm_cfg.ctm_conv_tol,
            ad_decomp_reg=ctm_cfg.ad_decomp_reg,
            absorb_normalization=ctm_cfg.ctm_absorb_normalization,
            projector_method=method, n_power=n_power,
        )
        e0 = lax.stop_gradient(e0)
        return run_scan(a, e0, ctm_cfg.grad_tail_iter, ctm_cfg)
    raise ValueError(f"Unknown grad_mode {ctm_cfg.grad_mode}")


def run_scan(a, env: EnvC4v, n_iter: int, ctm_cfg) -> EnvC4v:
    """Differentiable fixed window of checkpointed moves.

    The analogue of the reference's backprop-through-CTMRG with
    ``fwd_checkpoint_move`` (ctmrg_c4v.py:454-458): each move is
    rematerialized in the backward pass (``jax.checkpoint``), so memory
    is one environment + one move regardless of ``n_iter``.
    """
    method, n_power = _cfg_projector(ctm_cfg)
    move = partial(
        ctm_move_sl,
        ad_decomp_reg=ctm_cfg.ad_decomp_reg,
        absorb_normalization=ctm_cfg.ctm_absorb_normalization,
        sg_norm=True, gauge_fix=True,
        projector_method=method, n_power=n_power,
    )

    def step(carry, _):
        e, P_prev = carry
        e2, _, P = move(a, e, P_prev)
        return (e2, P), None

    chi = env.C.shape[0]
    D = a.shape[1]
    P0 = cold_start_basis(chi * D * D, chi, env.C.dtype)
    (env, _), _ = lax.scan(jax.checkpoint(step), (env, P0), None, length=n_iter)
    return env
