"""Profiling utilities (counterpart of reference profiling.py:9 and the
per-phase timers in ctm/one_site_c4v/ctmrg_c4v.py:178).

The reference walks gc for live CUDA tensors; the TPU-native equivalents
are (1) XLA device memory statistics, (2) ``jax.profiler`` traces
viewable in TensorBoard/Perfetto, and (3) lightweight named wall-clock
phase timers that the CTM drivers and the optimizer aggregate.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


def device_memory_stats(device=None) -> dict:
    """Per-device allocator statistics (bytes). Empty dict on backends
    without memory_stats (e.g. CPU)."""
    dev = device or jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


def log_device_mem(prefix: str = "", device=None) -> str:
    """One-line humanized memory report (reference ``_log_cuda_mem``)."""
    st = device_memory_stats(device)
    if not st:
        return f"{prefix} mem: n/a"
    gib = 1024**3
    line = (
        f"{prefix} mem: in_use {st.get('bytes_in_use', 0)/gib:.2f} GiB, "
        f"peak {st.get('peak_bytes_in_use', 0)/gib:.2f} GiB, "
        f"limit {st.get('bytes_limit', 0)/gib:.2f} GiB"
    )
    return line


class PhaseTimers:
    """Named wall-clock accumulators for algorithm phases
    (projectors / absorb / conv-check / rdm / grad ...)."""

    def __init__(self):
        self.t = defaultdict(float)
        self.n = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """Time a phase; pass ``sync=array`` to block on an output so
        async dispatch doesn't hide device time."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.t[name] += time.perf_counter() - t0
            self.n[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": self.t[k], "calls": self.n[k]} for k in self.t}

    def reset(self):
        self.t.clear()
        self.n.clear()


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tpeps_trace"):
    """jax.profiler trace context — open the result with TensorBoard or
    ui.perfetto.dev.  Usage::

        with tpeps.profiling.trace("/tmp/trace"):
            run_ctmrg_tpu(a, env, ...)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
