"""Optimization driver (counterpart of reference optim/ad_optim_lbfgs_mod.py:132-357).

``optimize_state`` runs the epoch loop:

* per epoch: checkpoint (pickle) -> L-BFGS ``step_2c`` with an AD
  closure (jitted ``value_and_grad`` of the loss) and an optional
  no-grad line-search closure,
* best-so-far state written as portable JSON whenever the loss improves
  (reference ad_optim_lbfgs_mod.py:206-212),
* JSON-line metric logging (loss, grad norms, timings —
  ad_optim_lbfgs_mod.py:215-246),
* termination on loss/grad/step tolerances.

Parameters are an arbitrary pytree of (possibly complex) jnp arrays;
complex leaves are split into real pairs before differentiation so the
host-side L-BFGS sees one flat float64 vector.
"""

from __future__ import annotations

import json
import logging
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from ..errors import EnvError, NoFixedPointError
from .lbfgs import LBFGS

log = logging.getLogger(__name__)


def split_complex(tree):
    """Map complex leaves to ``{"re":..., "im":...}`` dicts (real pytree)."""
    def f(x):
        if jnp.iscomplexobj(x):
            return {"re": x.real, "im": x.imag}
        return x
    return jax.tree_util.tree_map(f, tree)


def merge_complex(tree, like):
    """Inverse of :func:`split_complex` guided by the original ``like`` tree."""
    def f(x, proto):
        if jnp.iscomplexobj(proto):
            return x["re"] + 1j * x["im"]
        return x
    return jax.tree_util.tree_map(
        f, tree, like, is_leaf=lambda t: isinstance(t, dict) and set(t) == {"re", "im"}
    )


def optimize_state(
    params,
    loss_fn,
    *,
    cfg,
    obs_fn=None,
    post_proc=None,
    loss_fn_linesearch=None,
    loss_ctx_fn=None,
    checkpoint_file=None,
    best_state_writer=None,
    opt_resume=None,
    regauge_fn=None,
    status_ctx=None,
    max_recoveries: int = 3,
):
    """Epoch loop of L-BFGS optimization.

    :param params: pytree of variational parameters (jnp arrays)
    :param loss_fn: differentiable ``params -> loss`` (scalar), or
        ``(params, ctx) -> loss`` when ``loss_ctx_fn`` is given
    :param cfg: :class:`tpeps.config.Config`
    :param loss_fn_linesearch: optional cheaper no-grad ``params -> loss``
        — called eagerly on the host (may contain host-loop CTMRG)
    :param loss_ctx_fn: optional host-side ``params -> ctx`` evaluated
        once per epoch outside AD (e.g. a fully converged environment for
        stacks whose convergence loop is host-driven); ``ctx`` is passed
        as a traced argument so the jitted gradient is not retraced.
        This reproduces the reference's env-reuse semantics
        (ad_optim_lbfgs_mod.py ``current_env``).
    :param best_state_writer: callable ``(params, loss)`` invoked when the
        loss improves (e.g. writes the ``_state.json``)
    :param opt_resume: checkpoint path to resume from
    :param regauge_fn: optional ``params -> params`` applied on
        :class:`tpeps.errors.EnvError` before rebuilding the optimizer
        (reference ``opt_args.env_sens_regauge``,
        ad_optim_lbfgs_mod.py:318-327)
    :param status_ctx: optional dict the caller's closures may mutate;
        ``status_ctx["STATUS"] == "ENV_ANTIVAR"`` terminates with an
        error ("over-optimized environment",
        reference ad_optim_lbfgs_mod.py:349-352)
    :param max_recoveries: give up after this many *consecutive*
        noise-restart/regauge recoveries
    :return: ``(best_params, history)``
    """
    opt_args = cfg.opt
    params_proto = params
    params_real = split_complex(params)
    x0, unravel = ravel_pytree(params_real)
    x0 = np.asarray(x0, dtype=np.float64)

    def to_params(x):
        return merge_complex(unravel(jnp.asarray(x)), params_proto)

    if loss_ctx_fn is None:
        vag = jax.jit(jax.value_and_grad(lambda pr: loss_fn(merge_complex(pr, params_proto))))
    else:
        vag_ctx = jax.jit(
            jax.value_and_grad(lambda pr, ctx: loss_fn(merge_complex(pr, params_proto), ctx))
        )

    t_closure = {"grad": 0.0, "ls": 0.0}
    current_ctx = [None]

    def closure(x):
        t0 = time.perf_counter()
        if loss_ctx_fn is None:
            val, grad = vag(unravel(jnp.asarray(x)))
        else:
            val, grad = vag_ctx(unravel(jnp.asarray(x)), current_ctx[0])
        gflat, _ = ravel_pytree(grad)
        val = float(val)
        gflat = np.asarray(gflat, dtype=np.float64)
        t_closure["grad"] += time.perf_counter() - t0
        return val, gflat

    closure_ls = None
    if loss_fn_linesearch is not None:

        def closure_ls(x):
            t0 = time.perf_counter()
            # eager: the line-search loss may contain host-driven loops
            val = float(loss_fn_linesearch(to_params(x)))
            t_closure["ls"] += time.perf_counter() - t0
            return val

    line_search = {"default": "strong_wolfe", "strong_wolfe": "strong_wolfe",
                   "backtracking": "backtracking", "none": None}[opt_args.line_search]

    def make_optimizer():
        """Fresh optimizer (also used to clear L-BFGS history on
        recovery, reference ad_optim_lbfgs_mod.py:311-316)."""
        if getattr(opt_args, "opt_type", "LBFGS").upper() == "SGD":
            from .sgd import SGD

            # SGD supports only the derivative-free backtracking line
            # search (reference sgd_modified.py:210-230)
            sgd_ls = "backtracking" if line_search == "backtracking" else None
            return SGD(
                lr=opt_args.lr,
                momentum=opt_args.momentum,
                line_search_fn=sgd_ls,
                max_iter=opt_args.max_iter_per_epoch,
            )
        return LBFGS(
            n_params=x0.size,
            lr=opt_args.lr,
            max_iter=opt_args.max_iter_per_epoch,
            history_size=opt_args.history_size,
            tolerance_grad=opt_args.tolerance_grad,
            tolerance_change=opt_args.tolerance_change,
            line_search_fn=line_search,
        )

    opt = make_optimizer()

    epoch0 = 0
    if opt_resume:
        with open(opt_resume, "rb") as f:
            ckpt = pickle.load(f)
        x0 = np.asarray(ckpt["x"], dtype=np.float64)
        opt.load_state_dict(ckpt["optimizer"], history_size=opt_args.history_size)
        epoch0 = ckpt["epoch"] + 1
        log.info(f"resumed from {opt_resume} at epoch {epoch0}")

    x = x0
    best_loss = np.inf
    history = {"loss": [], "grad_norm": [], "t_grad": [], "alpha": [], "recoveries": []}
    prev_loss = None
    n_consec_recoveries = 0
    noise_rng = np.random.RandomState(cfg.main.seed + 7919)

    for epoch in range(epoch0, cfg.main.opt_max_iter):
        if checkpoint_file:
            with open(checkpoint_file, "wb") as f:
                pickle.dump({"epoch": epoch, "x": x, "optimizer": opt.state_dict(),
                             "loss": best_loss}, f)

        t_closure["grad"] = t_closure["ls"] = 0.0
        if loss_ctx_fn is not None:
            current_ctx[0] = loss_ctx_fn(to_params(x))
        t0 = time.perf_counter()
        try:
            x, loss, grad, info = opt.step_2c(x, closure, closure_ls)
        except NoFixedPointError as e:
            # recovery: perturb the state with noise, rebuild the
            # optimizer (clears L-BFGS history) and retry
            # (reference ad_optim_lbfgs_mod.py:306-317)
            n_consec_recoveries += 1
            if n_consec_recoveries > max_recoveries:
                raise
            log.info(f"{e.message} — adding noise 0.1 and restarting optimizer "
                     f"(recovery {n_consec_recoveries}/{max_recoveries})")
            scale = 0.1 * max(float(np.abs(x).max()), 1e-30)
            x = x + scale * (noise_rng.rand(x.size) - 0.5)
            opt = make_optimizer()
            history["recoveries"].append({"epoch": epoch, "kind": "noise"})
            prev_loss = None
            continue
        except EnvError as e:
            n_consec_recoveries += 1
            if n_consec_recoveries > max_recoveries:
                raise
            log.info(f"{e.message} — "
                     + ("regauging and " if regauge_fn else "")
                     + "restarting optimizer")
            if regauge_fn is not None:
                pr = split_complex(regauge_fn(to_params(x)))
                x = np.asarray(ravel_pytree(pr)[0], dtype=np.float64)
            opt = make_optimizer()
            history["recoveries"].append({"epoch": epoch, "kind": "regauge"})
            prev_loss = None
            continue
        n_consec_recoveries = 0
        t_epoch = time.perf_counter() - t0

        if status_ctx is not None and status_ctx.get("STATUS") == "ENV_ANTIVAR":
            raise RuntimeError(
                "Over-optimized environment (ENV_ANTIVAR): the loss is more "
                "sensitive to the environment approximation than to the state "
                "(reference ad_optim_lbfgs_mod.py:349-352)"
            )

        history["loss"].append(loss)
        history["grad_norm"].append(float(np.linalg.norm(grad)))
        history["t_grad"].append(t_closure["grad"])
        history["alpha"].extend(info.get("alpha", []))

        if opt_args.opt_logging:
            log_entry = {
                "epoch": epoch, "loss": loss,
                "t_epoch": t_epoch, "t_grad": t_closure["grad"], "t_ls": t_closure["ls"],
                "ls_evals": info.get("ls_evals", []), "alpha": info.get("alpha", []),
            }
            if opt_args.opt_log_grad:
                log_entry["grad_l2"] = float(np.linalg.norm(grad))
                log_entry["grad_max"] = float(np.abs(grad).max())
            log.info(json.dumps(log_entry))

        if loss < best_loss:
            best_loss = loss
            if best_state_writer is not None:
                best_state_writer(to_params(x), loss)

        if obs_fn is not None:
            obs_fn(to_params(x), {"epoch": epoch, "loss": loss, "history": history})
        if post_proc is not None:
            new_params = post_proc(to_params(x), {"epoch": epoch, "loss": loss})
            if new_params is not None:
                pr = split_complex(new_params)
                x = np.asarray(ravel_pytree(pr)[0], dtype=np.float64)

        gmax = float(np.abs(grad).max())
        if gmax < opt_args.tolerance_grad:
            log.info(f"converged: max|grad| {gmax} < {opt_args.tolerance_grad}")
            break
        if prev_loss is not None and abs(loss - prev_loss) < opt_args.tolerance_change:
            log.info(f"converged: |dloss| < {opt_args.tolerance_change}")
            break
        prev_loss = loss

    return to_params(x), history
