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


def move_flops(D, chi, slice_phys, mode="f64", n_moves=1):
    """XLA's own FLOP estimate for one jitted CTMRG move (receipts for
    the achieved-TFLOP/s number; counts the compiled HLO, not a model).

    Lowers only programs the bench case actually compiled (or the
    long-cached f64 single-move program), so this costs seconds from
    the persistent compile cache — lowering a program the run never
    built can burn minutes of fresh TPU compile or OOM outright
    (round-4/5 receipt: the f32 case spent its wall-clock failing to
    compile an f64 no-slice D=7 program for this counter).

    For "mixed"/"f64" the count is the emulated-f64 single-move HLO
    (the series reported since BENCH_r02 — i.e. flops of the f64 work
    the device is replacing); for "f32" it is the logical f32 move.
    """
    import jax.numpy as jnp

    from tpeps.ctm.c4v.env import init_env
    from tpeps.ctm.c4v.move_tpu import _jit_move, to_tpu_layout
    from tpeps.ipeps.ipeps_c4v import symmetrize_c4v

    rng = np.random.RandomState(0)
    a = symmetrize_c4v(jnp.asarray(rng.rand(2, D, D, D, D) - 0.5), normalize=True)
    if mode == "f32":
        a = a.astype(jnp.float32)
    else:
        n_moves = 1  # the cached f64 reference program is single-move
    env0 = init_env(a, chi, "CTMRG")
    T_int = to_tpu_layout(env0.T, D)
    P0 = jnp.zeros((chi * D * D, chi), dtype=a.dtype)
    try:
        lowered = _jit_move.lower(a, env0.C, T_int, P0, slice_phys=slice_phys,
                                  n_moves=n_moves)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) / n_moves
    except Exception:
        return 0.0


TPU_GROUP_CODE = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
deadline = time.monotonic() + float(sys.argv[2])
import bench
for D, chi, mode in json.loads(sys.argv[3]):
    rem = deadline - time.monotonic()
    if rem < 120:
        print("##deadline: skipping D=%d %s (%.0fs left)" % (D, mode, rem),
              flush=True)
        continue
    t0 = time.monotonic()
    try:
        ms, n, f = bench.bench_case(D, chi, mode=mode)
    except Exception as e:
        print("##D=%d %s failed: %s: %s" % (D, mode, type(e).__name__, e),
              flush=True)
        continue
    print("##case D=%d %s: %.0fs total" % (D, mode, time.monotonic() - t0),
          flush=True)
    print("@@" + json.dumps([D, chi, mode, ms, int(n), f]), flush=True)
"""


def run_tpu_cases(cases, deadline_s, emit_case):
    """Run all accelerator cases in ONE subprocess, streaming results.

    One subprocess instead of one per case: TPU-runtime init through
    the axon tunnel costs minutes each, and consecutive cases share
    jitted programs in-process (the f32 case's program IS the mixed
    case's phase-1 program — round-5 receipt: per-case subprocesses
    spent 390+ s on a case whose compute is ~3 s).  The child enforces
    the deadline between cases; the parent backstops a hung dispatch by
    killing the child, keeping every record streamed so far (the
    round-3 zero-output lesson).

    :param emit_case: callback ``(D, chi, mode, ms, n_moves, flops)``
        invoked from a reader thread as each case lands
    """
    import os
    import threading

    here = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.Popen(
        [sys.executable, "-c", TPU_GROUP_CODE, here, str(deadline_s),
         json.dumps(cases)],
        stdout=subprocess.PIPE, text=True,
    )
    done = threading.Event()

    def reader():
        for line in proc.stdout:
            line = line.strip()
            if line.startswith("@@"):
                try:
                    emit_case(*json.loads(line[2:]))
                except Exception as e:
                    print(f"# emit failed: {e}", file=sys.stderr, flush=True)
            elif line.startswith("##"):
                print(f"# {line[2:]}", file=sys.stderr, flush=True)
        done.set()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    if not done.wait(timeout=deadline_s + 60):
        print("# tpu case group hit the deadline backstop; killing",
              file=sys.stderr, flush=True)
        proc.kill()
        done.wait(10)
    proc.wait()


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
    flops = move_flops(D, chi, slice_phys=slice_phys, mode=mode,
                       n_moves=moves_per_sync)
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


def start_abelian_cpu():
    """Launch the abelian CPU case as a background subprocess.

    The case is CPU-only (host numpy engine + CPU-XLA frozen program),
    so when the dense cases run on the TPU the two can overlap — the
    abelian case then gets the whole bench deadline instead of the
    leftovers (rounds 3-5 receipts: run sequentially it was
    deadline-starved every time).  The box has ONE CPU core, so the
    subprocess runs at nice 19: the dense cases' host dispatch loops
    are tiny but latency-critical (un-niced, the abelian host moves
    took 98% of the core and the TPU sat idle — measured round 5),
    while the abelian case is throughput-bound and soaks up whatever
    is left."""
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen([sys.executable, "-c", ABELIAN_BENCH_CODE],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, env=env,
                            preexec_fn=lambda: os.nice(19))


def collect_abelian(proc, timeout):
    """Wait for :func:`start_abelian_cpu` and parse its JSON line."""
    try:
        out, errs = proc.communicate(timeout=max(1, timeout))
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        raise RuntimeError(f"abelian case timed out after {timeout:.0f}s")
    if proc.returncode != 0:
        raise RuntimeError((errs or out)[-500:])
    rec = json.loads(out.strip().splitlines()[-1])
    rec["device"] = "cpu"
    return rec


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
    state = {"n_emitted": 0, "headline": None, "proc_ab": None}

    def emit_case(D, chi, mode, ms, n_moves, flops):
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
        state["n_emitted"] += 1
        if (D, mode) == (7, "mixed"):
            state["headline"] = rec
        if on_accel and state["proc_ab"] is None:
            # first TPU case landed (normally the headline): launch the
            # niced background abelian case — CPU-only, so it overlaps
            # the remaining TPU cases without perturbing the headline
            state["proc_ab"] = start_abelian_cpu()

    if on_accel:
        # ALL accelerator cases in one streaming subprocess (shared TPU
        # init + in-process jit cache; see run_tpu_cases).  D=7 pure-
        # XLA-f64 is expendable (the mixed case IS the f64-accurate
        # number): it runs last and the child skips it near deadline.
        run_tpu_cases(
            [[7, 147, "mixed"], [7, 147, "f32"], [6, 108, "mixed"],
             [7, 147, "f64"]],
            deadline_s=max(60, remaining() - 120), emit_case=emit_case)
    else:
        for D, chi, mode in ((5, 75, "f64"), (4, 48, "f64")):
            if remaining() - 30 < 120:
                print(f"# deadline: skipping D={D} {mode}", file=sys.stderr,
                      flush=True)
                continue
            try:
                ms, n_moves, flops = bench_case(D, chi, mode=mode)
            except Exception as e:
                print(f"# D={D} {mode} failed: {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)
                continue
            emit_case(D, chi, mode, ms, n_moves, flops)

    n_emitted = state["n_emitted"]
    headline_rec = state["headline"]
    proc_ab = state["proc_ab"]

    # collect the abelian case (overlapped with the TPU cases when on
    # the accelerator; run inline on the CPU fallback).  Minimum 180 s
    # grace even at the deadline: the subprocess has been running for
    # most of the bench and killing it seconds before it lands wastes
    # the whole investment (round-5 receipt: killed at "0s" when the
    # dense cases overran).
    try:
        if proc_ab is not None:
            ab = collect_abelian(proc_ab, timeout=max(180, remaining() - 30))
        elif remaining() > 240:
            ab = bench_abelian(timeout=min(420, int(remaining() - 60)))
        else:
            ab = None
            print("# deadline: skipping abelian case", file=sys.stderr, flush=True)
        if ab is not None:
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
    except Exception as e:
        print(f"# abelian bench failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    if headline_rec is not None:
        # final line = headline for last-line parsers; the tag marks it
        # as a re-emission so all-line aggregators can deduplicate
        emit({**headline_rec, "headline": True})
    if n_emitted == 0:
        emit({"metric": "ctmrg_move_c4v", "value": -1, "unit": "ms/move",
              "vs_baseline": 0})


if __name__ == "__main__":
    main()
