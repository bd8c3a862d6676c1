"""Optimizer recovery tests (VERDICT r1 item 7: inject a
NaN/non-convergent CTM and show the optimizer recovers).

Mirrors reference optim/ad_optim_lbfgs_mod.py:306-327 semantics:
NoFixedPointError -> noise restart + fresh optimizer;
EnvError -> optional regauge + fresh optimizer;
ENV_ANTIVAR status -> hard termination.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpeps.config import Config, MainArgs, OptArgs
from tpeps.errors import EnvError, NoFixedPointError
from tpeps.optim.driver import optimize_state


def _quadratic_loss(target):
    def loss(p):
        return jnp.sum((p - target) ** 2)
    return loss


def test_no_fixed_point_noise_restart():
    """Loss raises NoFixedPointError on the first two epochs (e.g. a
    non-convergent CTM); the driver must perturb, rebuild and converge."""
    target = jnp.asarray([1.0, -2.0, 0.5])
    calls = {"n": 0}
    base = _quadratic_loss(target)

    def flaky_ls(p):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise NoFixedPointError("injected CTM non-convergence")
        return base(p)

    cfg = Config(main=MainArgs(opt_max_iter=40, seed=0),
                 opt=OptArgs(line_search="backtracking", lr=1.0))
    p0 = jnp.zeros(3)
    params, history = optimize_state(p0, base, cfg=cfg, loss_fn_linesearch=flaky_ls)
    assert len(history["recoveries"]) == 2
    assert all(r["kind"] == "noise" for r in history["recoveries"])
    assert float(jnp.abs(params - target).max()) < 1e-4


def test_no_fixed_point_gives_up_after_max_recoveries():
    def always_fails(p):
        raise NoFixedPointError("injected permanent failure")

    cfg = Config(main=MainArgs(opt_max_iter=20, seed=0),
                 opt=OptArgs(line_search="backtracking"))
    with pytest.raises(NoFixedPointError):
        optimize_state(jnp.zeros(2), _quadratic_loss(jnp.ones(2)), cfg=cfg,
                       loss_fn_linesearch=always_fails, max_recoveries=3)


def test_env_error_regauge():
    target = jnp.asarray([2.0, 1.0])
    calls = {"n": 0}
    regauges = {"n": 0}
    base = _quadratic_loss(target)

    def flaky_ls(p):
        calls["n"] += 1
        if calls["n"] == 1:
            raise EnvError("injected env sensitivity")
        return base(p)

    def regauge(p):
        regauges["n"] += 1
        return p

    cfg = Config(main=MainArgs(opt_max_iter=40, seed=0),
                 opt=OptArgs(line_search="backtracking", lr=1.0))
    params, history = optimize_state(
        jnp.zeros(2), base, cfg=cfg, loss_fn_linesearch=flaky_ls,
        regauge_fn=regauge,
    )
    assert regauges["n"] == 1
    assert history["recoveries"] == [{"epoch": 0, "kind": "regauge"}]
    assert float(jnp.abs(params - target).max()) < 1e-4


def test_env_antivar_terminates():
    status = {}

    def loss_ls(p):
        status["STATUS"] = "ENV_ANTIVAR"
        return float(jnp.sum(p**2))

    cfg = Config(main=MainArgs(opt_max_iter=10, seed=0),
                 opt=OptArgs(line_search="backtracking"))
    with pytest.raises(RuntimeError, match="ENV_ANTIVAR"):
        optimize_state(jnp.ones(2), _quadratic_loss(jnp.zeros(2)), cfg=cfg,
                       loss_fn_linesearch=loss_ls, status_ctx=status)
