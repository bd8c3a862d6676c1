"""Finite-difference gradients, batched over devices.

Counterpart of reference optim/fd_optim_lbfgs_mod.py:116-253 (``grad_fd``
— per-coefficient forward differences under no_grad) and
optim/fd_optim_lbfgs_mod_distributed.py:36-221 (the torch.distributed/
gloo master-worker parallel FD — the reference's only multi-process
machinery, SURVEY.md §5).

TPU-native design: displaced loss evaluations are embarrassingly
parallel, so they become one ``vmap`` over a displacement batch (one
chip) which `jit` lowers to batched CTMRG — and shard the batch axis
over a device mesh for multi-chip (no host-side message passing).
Intended for ansaetze where AD is impractical (linear-combination
coefficient ansaetze, reference examples/su2_c4v/*_FD*.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree


def make_fd_grad(loss_fn, params_proto, fd_eps: float = 1.0e-4, chunk: int = 16):
    """Build a finite-difference gradient function over flat parameters.

    :param loss_fn: ``params_pytree -> scalar`` (no AD required; may
        contain host-loop CTMRG as long as it is vmappable — use the
        jitted fixed-iteration or while_loop variants)
    :param params_proto: pytree prototype for unraveling
    :param chunk: displacements evaluated concurrently per vmap batch
    :return: ``fd_grad(x_flat) -> (loss0, grad_flat)``
    """
    _, unravel = ravel_pytree(params_proto)

    def loss_flat(x):
        return loss_fn(unravel(x))

    batched = jax.jit(jax.vmap(loss_flat))
    loss_jit = jax.jit(loss_flat)

    def fd_grad(x_flat):
        x = jnp.asarray(x_flat)
        n = x.shape[0]
        f0 = float(loss_jit(x))
        grad = np.zeros(n)
        eye = jnp.eye(n, dtype=x.dtype)
        for start in range(0, n, chunk):
            idx = slice(start, min(start + chunk, n))
            xs = x[None, :] + fd_eps * eye[idx]
            fs = np.asarray(batched(xs))
            grad[idx] = (fs - f0) / fd_eps
        return f0, grad

    return fd_grad


def optimize_state_fd(params, loss_fn, *, cfg, fd_grad_fn=None, **kwargs):
    """L-BFGS driven by finite-difference gradients
    (reference optim/fd_optim_lbfgs_mod.py:37-253).

    Same contract as :func:`tpeps.optim.driver.optimize_state` but the
    AD closure is replaced by the batched FD gradient; ``loss_fn`` needs
    no AD support.

    :param fd_grad_fn: optional replacement gradient closure
        ``x_flat -> (loss0, grad_flat)`` over the split-complex flat
        parameters — e.g. the mesh-parallel
        :func:`tpeps.parallel.sharded.fd_grad_sharded` (the SPMD
        counterpart of the reference's distributed FD,
        fd_optim_lbfgs_mod_distributed.py:36-221).
    """
    from .driver import merge_complex, optimize_state, split_complex

    proto_real = split_complex(params)
    fd_grad = fd_grad_fn if fd_grad_fn is not None else make_fd_grad(
        lambda pr: loss_fn(merge_complex(pr, params)), proto_real,
        fd_eps=cfg.opt.fd_eps,
    )

    # adapt optimize_state by monkey-wiring the closure: reuse its loop by
    # passing a loss_fn whose gradient optimize_state computes via AD —
    # instead we implement the small loop directly here.
    import time

    from jax.flatten_util import ravel_pytree as _rp

    from .lbfgs import LBFGS

    x0, unravel = _rp(proto_real)
    x0 = np.asarray(x0, dtype=np.float64)

    def closure(x):
        f0, g = fd_grad(jnp.asarray(x))
        return f0, g

    def closure_ls(x):
        return float(jax.jit(lambda pr: loss_fn(merge_complex(pr, params)))(unravel(jnp.asarray(x))))

    opt_args = cfg.opt
    opt = LBFGS(
        n_params=x0.size, lr=opt_args.lr, max_iter=opt_args.max_iter_per_epoch,
        history_size=opt_args.history_size, tolerance_grad=opt_args.tolerance_grad,
        tolerance_change=opt_args.tolerance_change,
        line_search_fn={"default": "backtracking", "backtracking": "backtracking",
                        "strong_wolfe": "strong_wolfe", "none": None}[opt_args.line_search],
    )
    x = x0
    history = {"loss": []}
    best = (np.inf, x0)
    for epoch in range(cfg.main.opt_max_iter):
        x, loss, grad, info = opt.step_2c(x, closure, closure_ls)
        history["loss"].append(loss)
        if loss < best[0]:
            best = (loss, x.copy())
        if np.abs(grad).max() < opt_args.tolerance_grad:
            break
    return merge_complex(unravel(jnp.asarray(best[1])), params), history
