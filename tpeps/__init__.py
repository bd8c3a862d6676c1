"""tpeps — a TPU-native iPEPS framework built on JAX/XLA/Pallas.

A from-scratch rebuild of the capabilities of jurajHasik/peps-torch
(variational iPEPS optimization via CTMRG + reverse-mode AD + L-BFGS),
re-designed for TPUs:

* environments are pytrees evolved by pure, jitted CTMRG moves,
* gradients flow either through implicit differentiation of the CTMRG
  fixed point (constant memory) or through a checkpointed ``lax.scan``
  over moves (mirroring the reference's ``fwd_checkpoint_move``),
* truncated decompositions use ``jax.custom_vjp`` rules with
  degenerate-spectrum regularization,
* all shapes are static so every hot path compiles once per (D, chi).

Numerical precision: iPEPS ground-state energies are targeted to 1e-8
accuracy, which requires float64.  We therefore enable JAX x64 mode at
import time (the TPU backend supports f64 through XLA emulation; tests
run on CPU natively in f64).  Set the environment variable
``TPEPS_NO_X64=1`` before import to opt out.
"""

import os as _os

import jax as _jax

if not _os.environ.get("TPEPS_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: CTMRG programs (especially the
# frozen abelian engine, whose traced move unrolls per-sector block
# arithmetic) can take minutes to compile; caching makes every process
# after the first start instantly.  Opt out with TPEPS_NO_COMPILE_CACHE=1
# or redirect with TPEPS_COMPILE_CACHE_DIR.
if not _os.environ.get("TPEPS_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "TPEPS_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "tpeps_xla"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # cache is an optimization; never fail import
        pass

__version__ = "0.1.0"
