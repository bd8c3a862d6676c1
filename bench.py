"""Headline benchmark: C4v CTMRG move wall-clock at D=7, chi=147, float64.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The benchmark converges a full C4v CTMRG fixed point for a random
J1-J2-like D=7 state at chi=147 in f64 on the available accelerator
(TPU-layout move with warm-started subspace projectors and
physical-index slicing; see tpeps/ctm/c4v/move_tpu.py), then times a
second, compile-cached run and reports per-move wall-clock.

Baseline: the reference peps-torch ``ctm_MOVE_sl`` at the same (D, chi,
dtype) measured on this host's CPU (single core, torch 2.13):
146622.5 ms/move (D=7), 30999.8 ms/move (D=6) — measured 2026-08-16
with linalg.custom_eig.truncated_eig_sym (SYMEIG default projector).
``vs_baseline`` = baseline_ms / our_ms (higher is better).
"""

import json
import subprocess
import sys
import time

import numpy as np

REF_CPU_MS = {7: 146622.5, 6: 30999.8, 5: 1448.3, 4: 152.0, 3: 10.4}


def accelerator_alive(timeout: int = 300, retries: int = 2) -> bool:
    """Probe the accelerator in a subprocess — a crashed TPU runtime can
    hang the first dispatch indefinitely, which must not hang the bench.
    Retries once: the first compile through a remote tunnel is
    occasionally slow enough to trip a single probe."""
    code = (
        "import jax, jax.numpy as jnp;"
        "jax.config.update('jax_enable_x64', True);"
        "x = jnp.ones((64, 64));"
        "print(float((x @ x)[0, 0]))"
    )
    for _ in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout,
                capture_output=True, text=True,
            )
            if r.returncode == 0 and "64" in r.stdout:
                return True
        except Exception:
            pass
    return False


def move_flops(D, chi, slice_phys):
    """XLA's own FLOP estimate for one jitted CTMRG move (receipts for
    the achieved-TFLOP/s number; counts the compiled HLO, not a model)."""
    import jax
    import jax.numpy as jnp

    from tpeps.ctm.c4v.env import init_env
    from tpeps.ctm.c4v.move_tpu import _jit_move, to_tpu_layout
    from tpeps.ipeps.ipeps_c4v import symmetrize_c4v

    rng = np.random.RandomState(0)
    a = symmetrize_c4v(jnp.asarray(rng.rand(2, D, D, D, D) - 0.5), normalize=True)
    env0 = init_env(a, chi, "CTMRG")
    T_int = to_tpu_layout(env0.T, D)
    P0 = jnp.zeros((chi * D * D, chi), dtype=a.dtype)
    try:
        lowered = _jit_move.lower(a, env0.C, T_int, P0, slice_phys=slice_phys)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_case_watchdog(D, chi, mode, timeout=1800, retries=1):
    """Run one :func:`bench_case` in a subprocess with a hard timeout.

    The axon TPU runtime can transiently hang a dispatch forever
    (observed 2026-08-18: a D=7 f64 program never returned while small
    probes succeeded); an in-process hang would leave the whole bench
    with no output.  A timed-out case is retried (the hang is a runtime
    hiccup, not a property of the program)."""
    import os
    import json as _json

    code = (
        "import json, sys; sys.path.insert(0, sys.argv[1]); import bench; "
        "ms, n, f = bench.bench_case(int(sys.argv[2]), int(sys.argv[3]), "
        "mode=sys.argv[4]); print('@@' + json.dumps([ms, int(n), f]))"
    )
    here = os.path.dirname(os.path.abspath(__file__))
    err = "no attempt"
    for _ in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code, here, str(D), str(chi), mode],
                timeout=timeout, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            err = f"timed out after {timeout}s (hung dispatch?)"
            continue
        if r.returncode == 0:
            for line in r.stdout.splitlines():
                if line.startswith("@@"):
                    ms, n, f = _json.loads(line[2:])
                    return ms, n, f
        err = (r.stderr or r.stdout)[-400:]
    raise RuntimeError(err)


def bench_case(D, chi, max_iter=48, mode="f64", moves_per_sync=4):
    """Converge a random C4v state and time a second, compile-cached run.

    ``mode``: "f64" (pure float64, the reference dtype) or "mixed"
    (float32 convergence + float64 polish via ``run_ctmrg_tpu_mixed`` —
    parity-tested to <1e-9 energy agreement in
    tests/test_power_parity.py).  Moves are batched ``moves_per_sync``
    per dispatch to amortize the remote-dispatch round-trip.
    """
    import jax.numpy as jnp

    from tpeps.ctm.c4v.env import init_env
    from tpeps.ctm.c4v.move_tpu import run_ctmrg_tpu, run_ctmrg_tpu_mixed
    from tpeps.ipeps.ipeps_c4v import symmetrize_c4v

    rng = np.random.RandomState(0)
    a = symmetrize_c4v(jnp.asarray(rng.rand(2, D, D, D, D) - 0.5), normalize=True)
    slice_phys = D >= 7 and mode != "f32"  # f64 moves need phys slicing
    if mode == "f32":
        # capability number: pure-f32 environment (the dtype the MXU
        # actually runs; used e.g. for line-search CTMs)
        a = a.astype(jnp.float32)
    env0 = init_env(a, chi, "CTMRG")
    runner = run_ctmrg_tpu_mixed if mode == "mixed" else run_ctmrg_tpu
    kwargs = dict(max_iter=max_iter, conv_tol=1e-8, slice_phys=slice_phys,
                  moves_per_sync=moves_per_sync)
    # first run: compile + converge (host loop over the jitted move)
    env, n, dist = runner(a, env0, **kwargs)[:3]
    if not np.isfinite(float(dist)):
        raise RuntimeError(f"non-finite CTMRG at D={D}")
    # timed run (compile cached)
    t0 = time.perf_counter()
    env2, n2, dist2 = runner(a, env0, **kwargs)[:3]
    _ = np.asarray(env2.C)  # true sync (block_until_ready is a no-op
    wall = time.perf_counter() - t0  # through the axon tunnel)
    ms_per_move = 1000.0 * wall / max(n2, 1)
    assert np.isfinite(np.asarray(env2.C)).all()
    flops = move_flops(D, chi, slice_phys=slice_phys)
    return ms_per_move, n2, flops


ABELIAN_BENCH_CODE = r"""
import os, time, json, sys
import numpy as np
import jax, jax.numpy as jnp
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the hosted-TPU sitecustomize overrides the env var; force it
    jax.config.update("jax_platforms", "cpu")
import tpeps
from tpeps.sym.tensor import AbelianTensor, leg
from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN, make_c4v_symm_A1_abelian
from tpeps.ctm.c4v_abelian import ctmrg as ctmrg_c4v
from tpeps.ctm.c4v_abelian import env as env_c4v
from tpeps.ctm.c4v_abelian.frozen import close_structure, freeze_from_env, run_frozen

D_SECTORS = {-2: 1, -1: 2, 0: 2, 1: 2, 2: 1}   # D=8 U(1) aux profile
chi = 160
a = AbelianTensor.random(jax.random.PRNGKey(0), "U1", (1, 1, 1, 1, 1),
                         (leg({-1: 1, 1: 1}), *(leg(D_SECTORS),) * 4), n=1,
                         backend="np")
a = make_c4v_symm_A1_abelian(a)
a = a * (1.0 / float(a.norm()))
st = IPEPS_ABELIAN("U1", {(0, 0): a})
env = env_c4v.init_env(st, chi)
pk = dict(svd_reltol=1e-12, eps_multiplet=1e-12)
# host (numpy) moves: structure warm-up + the host-engine timing
# baseline.  Kept to the minimum that saturates the chi-sector
# structure (round-4 post-mortem: 6 host moves at 12-45 s each ate the
# whole subprocess timeout before the frozen program ever compiled).
t0 = time.perf_counter()
env = ctmrg_c4v.ctm_move_sl(a, env, pk)
host_ms = 1000.0 * (time.perf_counter() - t0)
for _ in range(3):
    env = ctmrg_c4v.ctm_move_sl(a, env, pk)
keep = freeze_from_env(env)
A = a.to_backend("jnp")
C, T = close_structure(A, env.C.to_backend("jnp"), env.T.to_backend("jnp"),
                       dict(keep))
# compile + run the frozen program (10 fixed moves per call)
Cf, Tf, n, d2 = run_frozen(A, C, T, keep, max_iter=10, conv_tol=0.0)
jax.block_until_ready(jax.tree_util.tree_leaves(Cf))
t0 = time.perf_counter()
Cf, Tf, n, d2 = run_frozen(A, C, T, keep, max_iter=10, conv_tol=0.0)
jax.block_until_ready(jax.tree_util.tree_leaves(Cf))
ms = 1000.0 * (time.perf_counter() - t0) / int(n)
print(json.dumps({"host_ms": round(host_ms, 3), "frozen_ms": round(ms, 3)}))
"""


def bench_abelian(timeout: int = 1500):
    """Abelian C4v D=8 chi=160 move: frozen-jitted device program vs the
    host numpy engine (VERDICT r2 ask #4).  Runs in a subprocess with a
    hard timeout — the frozen move's one-time compile is minutes.

    Falls back to the CPU XLA backend when the hosted-TPU remote
    compiler rejects the program (the D=8 chi=160 frozen move's block
    zoo SIGKILLs the axon tpu_compile_helper — a compiler-resource
    wall, not a program error); the frozen-vs-host comparison is
    apples-to-apples on either backend."""
    import os

    err = "no attempt ran"
    hard_deadline = time.monotonic() + timeout  # TOTAL across attempts
    # CPU first: it is the attempt known to complete (round-4 receipt:
    # the TPU attempt burned the whole budget on the compiler wall and
    # starved the CPU fallback, so no abelian number landed at all)
    for env_extra, tag in (({"JAX_PLATFORMS": "cpu"}, "cpu"), (None, "tpu")):
        budget = hard_deadline - time.monotonic()
        if budget < 60:
            break
        env = dict(os.environ)
        if env_extra:
            env.update(env_extra)
        try:
            r = subprocess.run([sys.executable, "-c", ABELIAN_BENCH_CODE],
                               timeout=budget, capture_output=True, text=True,
                               env=env)
        except subprocess.TimeoutExpired:
            # a hung TPU attempt must not kill the CPU fallback
            err = f"{tag} attempt timed out after {budget:.0f}s"
            continue
        if r.returncode == 0:
            rec = json.loads(r.stdout.strip().splitlines()[-1])
            rec["device"] = tag
            return rec
        err = r.stderr[-500:]
    raise RuntimeError(err)


def main():
    """Run all bench cases under a GLOBAL wall-clock deadline, printing
    each JSON record AS SOON as it is measured (flushed).

    Round-3 post-mortem (BENCH_r03.json rc=124, empty tail): the old
    main() collected every record and printed only at the end; one hung
    TPU case (2 x 1800 s watchdog retries) ran past the driver's own
    timeout and the whole bench died with ZERO output.  Now (a) output
    is incremental + flushed so a timeout still leaves every completed
    metric on stdout, (b) a global deadline (default 1500 s, override
    via TPEPS_BENCH_DEADLINE) caps total runtime below any plausible
    driver timeout, and (c) the headline (D=7 mixed, the f64-accurate
    number) runs FIRST so it can never be deadline-starved, and is
    re-emitted as the final stdout line — tagged ``"headline": true``
    so aggregators of all lines can drop the duplicate — for drivers
    that parse only the last line."""
    import os

    deadline = time.monotonic() + float(os.environ.get("TPEPS_BENCH_DEADLINE", "1500"))

    def remaining():
        return deadline - time.monotonic()

    def emit(rec):
        print(json.dumps(rec), flush=True)

    n_emitted = 0
    on_accel = accelerator_alive(timeout=min(240, max(60, int(remaining() / 4))))
    if not on_accel:
        # crashed/absent accelerator: fall back to the CPU backend so the
        # benchmark still reports a meaningful number (vs the same-host
        # CPU reference baseline)
        import jax

        jax.config.update("jax_platforms", "cpu")
        print("# accelerator unavailable; benchmarking on CPU backend",
              file=sys.stderr, flush=True)

    import tpeps  # noqa: F401  (enables x64)

    # HEADLINE (D=7 mixed, the f64-accurate number) runs FIRST so it can
    # never be deadline-starved by cheaper cases (round-4 dry run: a
    # 600 s abelian timeout + D=6 left no budget and the headline was
    # skipped).  The headline record is re-emitted as the LAST stdout
    # line so a driver that parses the final line picks it up.
    headline_rec = None
    cases = (
        ((7, 147, "mixed"), (7, 147, "f32"), (6, 108, "f64"))
        if on_accel else ((5, 75, "f64"), (4, 48, "f64"))
    )
    # D=7 pure-XLA-f64 is informative but expendable (the mixed case IS
    # the f64-accurate number); it runs dead last, after the abelian
    # case, with whatever budget remains (round-4 receipt: it hit its
    # 506 s watchdog and starved the abelian case when ordered earlier).
    tail_cases = ((7, 147, "f64"),) if on_accel else ()
    for D, chi, mode in cases:
        budget = remaining() - 30
        if budget < 120:
            print(f"# deadline: skipping D={D} {mode}", file=sys.stderr, flush=True)
            continue
        t_case = time.monotonic()
        try:
            if on_accel:
                # hang-proof: each accelerator case in a watchdogged
                # subprocess (see bench_case_watchdog)
                ms, n_moves, flops = bench_case_watchdog(
                    D, chi, mode, timeout=int(min(900, budget)))
            else:
                ms, n_moves, flops = bench_case(D, chi, mode=mode)
        except Exception as e:
            print(f"# D={D} {mode} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            continue
        print(f"# case D={D} {mode}: {time.monotonic() - t_case:.0f}s total",
              file=sys.stderr, flush=True)
        rec = {
            "metric": f"ctmrg_move_c4v_D{D}_chi{chi}_{mode}"
            + ("" if on_accel else "_cpufallback"),
            "value": round(ms, 3),
            "unit": "ms/move",
            "vs_baseline": round(REF_CPU_MS[D] / ms, 1),
        }
        if flops > 0:
            rec["flops_per_move"] = flops
            rec["achieved_tflops"] = round(flops / (ms / 1000.0) / 1e12, 4)
        emit(rec)
        n_emitted += 1
        if (D, mode) == (7, "mixed"):
            headline_rec = rec

    # abelian case LAST (its one-time frozen-program compile can eat
    # minutes; never let it starve the dense numbers)
    try:
        if remaining() > 240:
            ab = bench_abelian(timeout=min(420, int(remaining() - 60)))
            emit({
                "metric": "ctmrg_move_c4v_abelian_D8_chi160_frozen",
                "value": ab["frozen_ms"],
                "unit": "ms/move",
                # baseline here = this repo's host-numpy abelian engine on
                # the same case (the reference publishes no abelian
                # wall-clock)
                "vs_baseline": round(ab["host_ms"] / max(ab["frozen_ms"], 1e-9), 1),
                "host_engine_ms": ab["host_ms"],
            })
            n_emitted += 1
        else:
            print("# deadline: skipping abelian case", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"# abelian bench failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    for D, chi, mode in tail_cases:
        budget = remaining() - 30
        if budget < 180:
            print(f"# deadline: skipping D={D} {mode}", file=sys.stderr, flush=True)
            continue
        try:
            ms, n_moves, flops = bench_case_watchdog(
                D, chi, mode, timeout=int(min(900, budget)))
        except Exception as e:
            print(f"# D={D} {mode} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            continue
        rec = {
            "metric": f"ctmrg_move_c4v_D{D}_chi{chi}_{mode}",
            "value": round(ms, 3), "unit": "ms/move",
            "vs_baseline": round(REF_CPU_MS[D] / ms, 1),
        }
        if flops > 0:
            rec["flops_per_move"] = flops
            rec["achieved_tflops"] = round(flops / (ms / 1000.0) / 1e12, 4)
        emit(rec)
        n_emitted += 1

    if headline_rec is not None:
        # final line = headline for last-line parsers; the tag marks it
        # as a re-emission so all-line aggregators can deduplicate
        emit({**headline_rec, "headline": True})
    if n_emitted == 0:
        emit({"metric": "ctmrg_move_c4v", "value": -1, "unit": "ms/move",
              "vs_baseline": 0})


if __name__ == "__main__":
    main()
