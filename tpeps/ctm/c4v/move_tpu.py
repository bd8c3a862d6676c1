"""TPU-layout C4v CTMRG move: layout-aware contractions for HBM efficiency.

XLA:TPU tiles the two minor dimensions of every materialized array to
(8, 128); any intermediate whose minor dims are O(D) wastes up to ~20x
HBM in padding (measured: the einsum/naive-matmul moves OOM a 16 GB chip
at D=7, chi=147 despite ~1 GB of actual data).  This module implements
the same move as :func:`tpeps.ctm.c4v.ctmrg.ctm_move_sl` with
``projector_method="POWER"`` but with

* the environment edge kept in layout ``T[k, b, chi0, chi1]``
  (ket, bra, chi, chi — large dims minor),
* every ``dot_general`` arranged so its output trails with chi-sized
  dims (operand order chooses which free dims go last),
* the enlarged corner never materialized as a (chi D^2, chi D^2) matrix:
  it stays in factored 6-dim form ``M6[f,g,e,r,j,i]`` and the subspace
  iteration applies it as an operator.

Numerically identical to the reference-layout POWER move (validated in
tests); used by the benchmark and any large-D TPU run.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...linalg.eigh import eigh_desc, multiplet_mask
from ...linalg.power import cholesky_qr2, cold_start_basis, procrustes_align
from .env import EnvC4v


def _ozaki_slices(impl: str):
    """Parse ``"ozaki"`` / ``"ozaki:<s>"`` -> slice count, or None for
    ``"xla"``.  Strict: anything else raises."""
    if impl == "ozaki" or impl.startswith("ozaki:"):
        s = 8
        if ":" in impl:
            suffix = impl.split(":", 1)[1]
            if not suffix.isdigit() or int(suffix) < 1:
                raise ValueError(
                    f"dot_impl {impl!r}: expected 'ozaki' or 'ozaki:<positive int>'"
                )
            s = int(suffix)
        return s
    if impl != "xla":
        raise ValueError(
            f"unknown dot_impl {impl!r}: expected 'xla', 'ozaki' or 'ozaki:<int>'"
        )
    return None


def _dot(x, y, dn, impl: str):
    """dot_general dispatcher: ``impl="ozaki"`` routes real-f64
    contractions through the exact int8-MXU Ozaki path
    (tpeps/linalg/ozaki.py) instead of XLA's software double-float
    emulation — the f64-accuracy speed lever of the mixed driver.

    ``"ozaki:<s>"`` selects ``s`` mantissa slices (relative error
    ~ K * 2**(-7s); the default s=8 gives ~2^-56, s=7 ~2^-49 — still
    3+ digits below the 1e-8 energy-parity gate — at 28/36 the MXU
    passes)."""
    s = _ozaki_slices(impl)
    if s is not None:
        if x.dtype == jnp.float64 and y.dtype == jnp.float64:
            from ...linalg.ozaki import ozaki_dot_general

            return ozaki_dot_general(x, y, dn, slices=s)
    return lax.dot_general(x, y, dn)


def to_tpu_layout(T, D: int):
    """Public ``T[chi0, chi1, D^2]`` -> internal ``T[k, b, chi0, chi1]``."""
    chi = T.shape[0]
    return T.reshape(chi, chi, D, D).transpose(2, 3, 0, 1)


def from_tpu_layout(T_int):
    """Internal ``T[k, b, chi0, chi1]`` -> public ``T[chi0, chi1, D^2]``."""
    D, _, chi, _ = T_int.shape
    return T_int.transpose(2, 3, 0, 1).reshape(chi, chi, D * D)


def _c2x2_factored(a, C, T_int, slice_phys: bool = False, dot_impl: str = "xla"):
    """Enlarged corner in factored form ``M6[f, g, e, r, j, i]`` with the
    hermitian pairing rows=(j,e,f) [down-chi, ket, bra], cols=(i,r,g).

    All intermediates trail with chi-sized dims.  ``slice_phys`` slices
    the ket/bra pair over the physical index (the only index coupling
    the two layers), dividing the O(chi^2 D^4 d) peak intermediate by d —
    needed at D>=7 in f64 on a 16 GB chip (f64 is software-emulated at
    32 B/element on TPU v5e).
    """
    D = a.shape[1]
    d = a.shape[0]
    chi = C.shape[0]
    # top edge: chi0=i(right), chi1=y(left); ct[x,u,v,i] = C[x,y] Tt[u,v,i,y]
    Tt_r = T_int.transpose(3, 0, 1, 2).reshape(chi, D * D * chi)  # y,(u,v,i)
    ct = _dot(C, Tt_r, (((1,), (0,)), ((), ())), dot_impl).reshape(chi, D, D, chi)
    # left edge: chi0=x(up), chi1=j(down); contract x
    q1 = _dot(T_int, ct, (((2,), (0,)), ((), ())), dot_impl)  # (l,m,j)+(u,v,i)
    if not slice_phys:
        # ket layer: contract a(u,l) with q(u=3, l=0)
        q = _dot(a, q1, (((1, 2), (3, 0)), ((), ())), dot_impl)  # (s,e,r)+(m,j,v,i)
        # bra layer: contract conj(a)(s,v,m) with q(s=0, v=5, m=3)
        return _dot(jnp.conj(a), q, (((0, 1, 2), (0, 5, 3)), ((), ())), dot_impl)
    M6 = None
    ac = jnp.conj(a)
    for s in range(d):
        # (e,r)+(m,j,v,i)
        qs = _dot(a[s], q1, (((0, 1), (3, 0)), ((), ())), dot_impl)
        # conj(a)[s] (v,m,f,g): contract (v, m) with qs (4, 2)
        ms = _dot(ac[s], qs, (((0, 1), (4, 2)), ((), ())), dot_impl)
        M6 = ms if M6 is None else M6 + ms
    return M6  # (f,g)+(e,r,j,i)


def _m_apply(M6, P2d, chi: int, D: int, dot_impl: str = "xla"):
    """Apply the factored corner: ``Y = M @ P`` with P rows = (j,e,f).

    ``M`` cols = (i, r, g); P rows reshaped (i, r, g, p).
    """
    P4 = P2d.reshape(chi, D, D, -1)
    # contract (i=5, r=3, g=1) with (0, 1, 2)
    Y = _dot(M6, P4, (((5, 3, 1), (0, 1, 2)), ((), ())), dot_impl)  # (f,e,j,p)
    Y = Y.transpose(2, 1, 0, 3)  # (j,e,f,p) — minor stays chi'
    return Y.reshape(chi * D * D, -1)


def _subspace_eigh_op(m_apply, P0, chi: int, n_power: int,
                      eps_multiplet: float, ad_decomp_reg: float):
    """Operator-form warm-started subspace iteration
    (see :func:`tpeps.linalg.power.subspace_eigh`)."""
    n = P0.shape[0]
    colnorm = jnp.linalg.norm(lax.stop_gradient(P0), axis=0)
    fallback = jnp.eye(n, chi, dtype=P0.dtype)
    P = jnp.where(colnorm[None, :] > 1e-12, P0, fallback)
    P = cholesky_qr2(P)
    for _ in range(n_power):
        P = cholesky_qr2(m_apply(P))
    Y = m_apply(P)
    H = P.conj().T @ Y
    H = 0.5 * (H + H.conj().T)
    Dv, U = eigh_desc(H, ad_decomp_reg)
    P = P @ U
    Dpad = jnp.concatenate([Dv, jnp.zeros((1,), dtype=Dv.dtype)])
    mask = multiplet_mask(Dpad, chi, eps_multiplet=eps_multiplet)
    return Dv * mask, P * mask[None, :]


def _absorb_T_int(a, T_int, P2d, chi: int, chi_n: int, slice_phys: bool = False,
                  dot_impl: str = "xla"):
    """T' = P^H (T a a*) P in internal layout; returns ``T'[k,b,chi',chi']``."""
    D = a.shape[1]
    d = a.shape[0]
    # contract T chi0(=x up) with P's chi rows
    P4 = P2d.reshape(chi, D, D, chi_n)  # (c, u, v, p)
    z1 = _dot(T_int, P4, (((2,), (0,)), ((), ())), dot_impl)  # (l,m,d)+(u,v,p)
    if not slice_phys:
        # ket layer: contract a(u=1, l=2) with z(u=3, l=0)
        z = _dot(a, z1, (((1, 2), (3, 0)), ((), ())), dot_impl)  # (s,e,r)+(m,d,v,p)
        # bra layer: contract conj(a)(s=0, v=1, m=2) with z(s=0, v=5, m=3)
        z = _dot(jnp.conj(a), z, (((0, 1, 2), (0, 5, 3)), ((), ())), dot_impl)
        # z = (f,g)+(e,r,d,p)
    else:
        z = None
        ac = jnp.conj(a)
        for s in range(d):
            # a[s] (u,l,e,r): contract (u=0, l=1) with z1 (3, 0) -> (e,r)+(m,d,v,p)
            zs = _dot(a[s], z1, (((0, 1), (3, 0)), ((), ())), dot_impl)
            # conj(a)[s] (v,m,f,g): contract (v=0, m=1) with zs (4, 2)
            zs = _dot(ac[s], zs, (((0, 1), (4, 2)), ((), ())), dot_impl)
            z = zs if z is None else z + zs  # (f,g)+(e,r,d,p)
    # close with conj(P): contract (c=chi, u=ket-down, v=bra-down) with
    # z (d=4, e=2, f=0)
    nT = _dot(jnp.conj(P4), z, (((0, 1, 2), (4, 2, 0)), ((), ())), dot_impl)
    # nT = (q)+(g,r,p) -> internal layout (k=r, b=g, chi_top=p, chi_bot=q)
    nT = nT.transpose(2, 1, 3, 0)
    return nT


def ctm_move_sl_tpu(
    a,
    C,
    T_int,
    P_ref,
    *,
    n_power: int = 2,
    eps_multiplet: float = 1.0e-12,
    ad_decomp_reg: float = 1.0e-12,
    absorb_normalization: str = "inf",
    sg_norm: bool = True,
    slice_phys: bool = False,
    dot_impl: str = "xla",
):
    """One C4v move in TPU layout.  Returns ``(C', T'_int, spec, P)``."""
    chi = C.shape[0]
    D = a.shape[1]
    M6 = _c2x2_factored(a, C, T_int, slice_phys=slice_phys, dot_impl=dot_impl)
    # hermitian-symmetrize via the operator: (M + M^H)/2 applied lazily —
    # M is hermitian up to roundoff for C4v states; symmetrize H instead
    oz_s = _ozaki_slices(dot_impl)
    if oz_s is not None and M6.dtype == jnp.float64:
        # the subspace iteration applies the SAME corner operator
        # n_power+2 times per move; split its mantissa chunks once
        # (re-splitting the (chi D^2)^2 operand per application is pure
        # emulated-f64 overhead).  Forward-only, like the whole ozaki
        # polish phase — gradients use the implicit fixed-point adjoint.
        from ...linalg.ozaki import ozaki_matmul_presplit, ozaki_presplit

        d0, d1, d2, d3, d4, d5 = M6.shape
        M2 = M6.transpose(0, 2, 4, 5, 3, 1).reshape(d0 * d2 * d4,
                                                    d5 * d3 * d1)
        M2c, ea = ozaki_presplit(M2, oz_s)

        def m_apply(P2d):
            Y = ozaki_matmul_presplit(M2c, ea, P2d, oz_s)
            return (Y.reshape(d0, d2, d4, -1).transpose(2, 1, 0, 3)
                    .reshape(chi * D * D, -1))
    else:
        m_apply = partial(_m_apply, M6, chi=chi, D=D, dot_impl=dot_impl)
    Dspec, P = _subspace_eigh_op(
        m_apply, P_ref, chi, n_power, eps_multiplet, ad_decomp_reg
    )
    cmask = jnp.abs(lax.stop_gradient(Dspec)) > 0
    P, W = procrustes_align(P, P_ref, col_mask=cmask)

    scale_C = jnp.abs(Dspec[0])
    if sg_norm:
        scale_C = lax.stop_gradient(scale_C)
    spec = Dspec / scale_C
    nC = (W.conj().T * spec.astype(C.dtype)[None, :]) @ W

    nT = _absorb_T_int(a, T_int, P, chi, chi, slice_phys=slice_phys,
                       dot_impl=dot_impl)
    # hermitian symmetrization T'_{ija} = (T'_{ija}+T'*_{jia})/2 in
    # internal layout: swap the two chi axes
    nT = 0.5 * (nT + jnp.conj(nT.transpose(0, 1, 3, 2)))
    if absorb_normalization == "inf":
        scale_T = jnp.abs(nT).max()
    else:
        scale_T = jnp.linalg.norm(nT.ravel())
    if sg_norm:
        scale_T = lax.stop_gradient(scale_T)
    nT = nT / scale_T
    return nC, nT, spec, P


@partial(
    jax.jit,
    static_argnames=("max_iter", "conv_tol", "n_power", "eps_multiplet",
                     "ad_decomp_reg", "absorb_normalization", "conv_on",
                     "slice_phys", "dot_impl"),
)
def run_fixed_point_tpu(
    a,
    env: EnvC4v,
    *,
    max_iter: int = 100,
    conv_tol: float = 1.0e-8,
    n_power: int = 2,
    eps_multiplet: float = 1.0e-12,
    ad_decomp_reg: float = 1.0e-12,
    absorb_normalization: str = "inf",
    conv_on: str = "spec",
    slice_phys: bool = False,
    dot_impl: str = "xla",
):
    """CTMRG to convergence with the TPU-layout move; public-layout env in
    and out.  Same contract as :func:`tpeps.ctm.c4v.ctmrg.run_fixed_point`.
    """
    chi = env.C.shape[0]
    D = a.shape[1]
    rdtype = env.C.real.dtype
    T_int = to_tpu_layout(env.T, D)
    P0 = cold_start_basis(chi * D * D, chi, env.C.dtype)
    spec0 = jnp.full((chi,), jnp.inf, dtype=rdtype)

    move = partial(
        ctm_move_sl_tpu, n_power=n_power, eps_multiplet=eps_multiplet,
        ad_decomp_reg=ad_decomp_reg, absorb_normalization=absorb_normalization,
        slice_phys=slice_phys, dot_impl=dot_impl,
    )

    def cond(carry):
        _, _, _, _, dist, i = carry
        return jnp.logical_and(i < max_iter, dist > conv_tol)

    def body(carry):
        C, T, P_prev, spec_prev, _, i = carry
        C2, T2, spec, P = move(a, C, T, P_prev)
        if conv_on == "env":
            dist = jnp.maximum(jnp.abs(C2 - C).max(), jnp.abs(T2 - T).max())
        else:
            dist = jnp.linalg.norm(jnp.abs(spec) - jnp.abs(spec_prev))
        dist = jnp.where(jnp.isfinite(dist), dist, jnp.inf)
        return (C2, T2, P, jnp.abs(spec), dist, i + 1)

    carry = (env.C, T_int, P0, spec0, jnp.asarray(jnp.inf, dtype=rdtype), jnp.asarray(0))
    C, T_int, P, _, dist, n_iter = lax.while_loop(cond, body, carry)
    return EnvC4v(C, from_tpu_layout(T_int)), n_iter, dist, P


@partial(
    jax.jit,
    static_argnames=("n_power", "eps_multiplet", "ad_decomp_reg",
                     "absorb_normalization", "slice_phys", "n_moves",
                     "dot_impl"),
)
def _jit_move(a, C, T_int, P_ref, *, n_power=2, eps_multiplet=1.0e-12,
              ad_decomp_reg=1.0e-12, absorb_normalization="inf",
              slice_phys=False, n_moves=1, dot_impl="xla"):
    """``n_moves`` > 1 chains several moves in one compiled program
    (lax.scan): on a tunneled/remote accelerator the per-dispatch
    round-trip (~30 ms measured on this box) otherwise dominates the
    f32 move (~15 ms on-device at D=7, chi=147)."""
    def one(carry, _):
        C_, T_, P_ = carry
        nC, nT, spec, nP = ctm_move_sl_tpu(
            a, C_, T_, P_, n_power=n_power, eps_multiplet=eps_multiplet,
            ad_decomp_reg=ad_decomp_reg,
            absorb_normalization=absorb_normalization, slice_phys=slice_phys,
            dot_impl=dot_impl,
        )
        return (nC, nT, nP), spec

    if n_moves == 1:
        (nC, nT, nP), spec = one((C, T_int, P_ref), None)
        return nC, nT, spec, nP
    (nC, nT, nP), specs = lax.scan(one, (C, T_int, P_ref), None, length=n_moves)
    return nC, nT, specs[-1], nP


def run_ctmrg_tpu(
    a,
    env: EnvC4v,
    *,
    max_iter: int = 100,
    conv_tol: float = 1.0e-8,
    n_power: int = 2,
    slice_phys: bool = False,
    timers=None,
    moves_per_sync: int = 1,
    matmul_precision=None,
    stall_window: int = 0,
    P0=None,
    **move_kwargs,
):
    """Host-driven CTMRG loop over the jitted TPU-layout move.

    Compiles only the single move (seconds) instead of the whole
    ``while_loop`` program (minutes through a remote-compile tunnel, and
    observed to crash the TPU runtime for the largest D).  The
    convergence check pulls the chi-vector corner spectrum to the host
    each iteration — negligible traffic.

    :param timers: optional :class:`tpeps.profiling.PhaseTimers`
        accumulating per-phase wall-clock ("move", "conv_check")
    :param matmul_precision: optional jax matmul precision for the
        move ("highest" turns the MXU's default bf16-precision f32
        matmuls into true-f32 multi-pass ones — ~5x the move cost,
        ~4 extra accurate digits; used by the mixed driver's middle
        phase)
    :param stall_window: if > 0, stop early when the corner-spectra
        distance has not improved for this many consecutive checks
        (phase hand-off in the mixed driver)
    :param P0: optional warm-start subspace basis ``(chi D^2, chi)``
        (e.g. the previous phase's projector in the mixed driver —
        restarting the basis cold costs the first few moves of each
        phase extra subspace-iteration error, which is expensive
        exactly where moves are f64)
    :return: ``(env, n_iter, dist, P)`` — ``P`` is the final projector
        basis, reusable as the next call's ``P0``
    """
    import contextlib

    _null = contextlib.nullcontext()
    prec_cm = (jax.default_matmul_precision(matmul_precision)
               if matmul_precision else _null)

    def phase(name, sync=None):
        return timers.phase(name, sync=sync) if timers is not None else _null

    D = a.shape[1]
    chi = env.C.shape[0]
    T_int = to_tpu_layout(env.T, D)
    if P0 is not None:
        P = jnp.asarray(P0, dtype=env.C.dtype)
    else:
        P = cold_start_basis(chi * D * D, chi, env.C.dtype)
    C = env.C
    spec_prev = None
    dist = float("inf")
    best_dist = float("inf")
    no_improve = 0
    it = 0
    bad_streak = 0
    n_sync = max(1, (max_iter + moves_per_sync - 1) // moves_per_sync)
    for it_s in range(1, n_sync + 1):
        it = it_s * moves_per_sync
        with phase("move"):
            with prec_cm:
                nC, nT, spec, nP = _jit_move(
                    a, C, T_int, P, n_power=n_power, slice_phys=slice_phys,
                    n_moves=moves_per_sync, **move_kwargs
                )
            spec.block_until_ready()
        with phase("conv_check"):
            spec_h = np.abs(np.asarray(spec))
        # TPU f64 is software-emulated; the warm-started CholeskyQR/eigh
        # projector very occasionally degenerates there (observed at D=7:
        # a spurious zero eigenvalue one move, NaN the next) while the
        # identical move on CPU f64 is clean.  The host loop makes
        # recovery trivial: redo the move from a cold-start basis with
        # more power steps.  CTMRG is self-correcting, so a single
        # recomputed move costs one extra iteration of convergence at most.
        if not np.isfinite(spec_h).all():
            P_cold = cold_start_basis(chi * D * D, chi, env.C.dtype)
            nC, nT, spec, nP = _jit_move(
                a, C, T_int, P_cold, n_power=max(n_power, 4),
                slice_phys=slice_phys, **move_kwargs
            )
            spec_h = np.abs(np.asarray(spec))
            if not np.isfinite(spec_h).all():
                bad_streak += 1
                if bad_streak >= 3:
                    raise RuntimeError(
                        f"CTMRG projector non-finite for {bad_streak} "
                        f"consecutive moves at iteration {it}"
                    )
                continue  # keep previous env, try again next iteration
        bad_streak = 0
        C, T_int, P = nC, nT, nP
        if spec_prev is not None:
            dist = float(np.linalg.norm(spec_h - spec_prev))
            if dist < conv_tol:
                break
            if stall_window > 0:
                if dist < 0.7 * best_dist:
                    best_dist = dist
                    no_improve = 0
                else:
                    no_improve += 1
                    if no_improve >= stall_window:
                        break
        spec_prev = spec_h
    return EnvC4v(C, from_tpu_layout(T_int)), it, dist, P


def run_ctmrg_tpu_mixed(
    a,
    env: EnvC4v,
    *,
    max_iter: int = 100,
    conv_tol: float = 1.0e-8,
    switch_tol: float = 1.0e-5,
    n_power: int = 2,
    slice_phys: bool = False,
    slice_phys32: bool = False,
    timers=None,
    moves_per_sync: int = 1,
    f64_dot_impl: str = "ozaki",
    **move_kwargs,
):
    """Mixed-precision CTMRG: converge in float32 (native MXU speed),
    then polish to ``conv_tol`` in float64.

    TPU has no f64 hardware — XLA emulates every f64 contraction as
    multiple f32 passes (the dominant cost of the f64 move).  The CTM
    fixed point is attracting, so an f32-converged environment (spectra
    stationary to ``switch_tol``) is already within the f64 basin; the
    f64 phase then needs only a handful of moves to reach ``conv_tol``,
    and the RESULT is a genuine f64 fixed point — observables carry full
    f64 CTM accuracy (parity-tested against the pure-f64 driver).

    :param f64_dot_impl: dot implementation for the f64 polish phase
        ("ozaki" = exact int8-MXU splitting, "xla" = software-f64)
    :return: ``(env, n_iter_total, dist)`` with env in float64
    """
    a32 = a.astype(jnp.float32) if not jnp.iscomplexobj(a) else a.astype(jnp.complex64)
    env32 = EnvC4v(
        env.C.astype(a32.dtype),
        env.T.astype(a32.dtype),
    )
    # the f32 phase uses a quarter of the f64 memory (f64 buffers cost
    # 2x and XLA's f64 emulation doubles working set again), so it can
    # usually skip physical-index slicing even where f64 cannot
    env32, it32, dist32, P32 = run_ctmrg_tpu(
        a32, env32, max_iter=max_iter, conv_tol=max(switch_tol, conv_tol),
        n_power=n_power, slice_phys=slice_phys32, timers=timers,
        moves_per_sync=moves_per_sync, stall_window=4, **move_kwargs
    )
    # middle phase: true-f32 matmuls (multi-pass MXU; ~5x the bf16-
    # precision move, ~1/20 the f64-emulated move) pushes the spectra
    # several digits further before any f64 move runs.  Each later phase
    # warm-starts the subspace basis from the previous phase's projector.
    env32b, it32b, dist32b, P32 = run_ctmrg_tpu(
        a32, env32, max_iter=max_iter,
        conv_tol=max(conv_tol, 3.0e-7),
        n_power=n_power, slice_phys=slice_phys32, timers=timers,
        moves_per_sync=moves_per_sync, matmul_precision="highest",
        stall_window=3, P0=P32, **move_kwargs
    )
    it32 += it32b
    env32 = env32b
    env64 = EnvC4v(env32.C.astype(env.C.dtype), env32.T.astype(env.T.dtype))
    # f64 polish: route the contractions through the exact int8-MXU
    # Ozaki path by default (~f64 accuracy at a fraction of XLA's
    # software-f64 cost; tpeps/linalg/ozaki.py).  Pass
    # f64_dot_impl="xla" to fall back to emulated-f64 dots.
    env_out, it64, dist, _P = run_ctmrg_tpu(
        a, env64, max_iter=max_iter, conv_tol=conv_tol,
        n_power=n_power, slice_phys=slice_phys, timers=timers,
        moves_per_sync=moves_per_sync, dot_impl=f64_dot_impl, P0=P32,
        **move_kwargs
    )
    return env_out, it32 + it64, dist


# ---------------------------------------------------------------------------
# Performance notes (measured 2026-08-16, one TPU v5e chip via axon)
# ---------------------------------------------------------------------------
# D=7, chi=147, random C4v state, steady-state per move:
#   f32           :   43 ms   (XLA flop count 510 GF/move -> ~12 TF/s incl.
#                              ~28 ms remote-dispatch RTT; ~34 TF/s on-device)
#   f64 (emulated): 2616 ms   (~0.2 TF/s -- XLA emulates every f64
#                              contraction as multi-pass f32; the MXU has no
#                              f64 path)
#   mixed         : ~1.3 s    amortized when the polish runs as long as the
#                             f32 phase; a few moves on gapped states
# The 60x f32/f64 gap IS the f64-emulation tax: the move is MXU-bound, not
# HBM-bound (halving bytes by dtype alone did not change runtime until the
# silent f64 promotion via an untyped constant was removed -- see
# linalg/eigh.py multiplet_mask).  The remaining f32 gap to peak is the
# QR/eigh tail (vector unit) and D-sized reshape boundaries between the
# chi-major matmuls.
