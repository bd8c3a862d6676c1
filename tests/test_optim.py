"""Optimization smoke tests (reference examples/j1j2/optim_j1j2_c4v.py
TestOpt pattern: tiny D/chi, few epochs, loss must decrease)."""

import numpy as np
import pytest

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp

from tpeps.config import Config, CtmArgs, MainArgs, OptArgs
from tpeps.ctm.c4v.ctmrg import converge_env, run_fixed_point
from tpeps.ctm.c4v.env import init_env
from tpeps.ipeps.ipeps_c4v import symmetrize_c4v
from tpeps.models.j1j2 import J1J2_C4V_BIPARTITE
from tpeps.optim.driver import optimize_state
from tpeps.optim.lbfgs import LBFGS


class TestLBFGS:
    def test_quadratic(self):
        rng = np.random.RandomState(0)
        Q = rng.rand(10, 10)
        Q = Q @ Q.T + np.eye(10)
        b = rng.rand(10)

        def closure(x):
            return 0.5 * x @ Q @ x - b @ x, Q @ x - b

        opt = LBFGS(10, max_iter=50, line_search_fn="strong_wolfe", tolerance_grad=1e-12)
        x, loss, grad, _ = opt.step_2c(np.zeros(10), closure)
        x_star = np.linalg.solve(Q, b)
        loss_star = 0.5 * x_star @ Q @ x_star - b @ x_star
        assert loss - loss_star < 1e-9

    def test_rosenbrock_backtracking(self):
        def f(x):
            return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

        def closure(x):
            g = np.array([
                -2 * (1 - x[0]) - 400 * x[0] * (x[1] - x[0] ** 2),
                200 * (x[1] - x[0] ** 2),
            ])
            return f(x), g

        opt = LBFGS(2, max_iter=200, line_search_fn="backtracking", tolerance_grad=1e-9,
                    tolerance_change=1e-16)
        x, loss, grad, _ = opt.step_2c(np.array([-1.0, 1.0]), closure, lambda x: f(x))
        assert loss < 1e-8


@pytest.mark.slow
class TestOptimizeC4v:
    def test_j1j2_c4v_energy_decreases(self, tmp_path):
        """Tiny version of README Ex.1: D=2, chi=8, j2=0 — a few L-BFGS
        epochs must reach the Neel-like plateau below -0.6."""
        chi, D = 8, 2
        rng = np.random.RandomState(2)
        A0 = jnp.asarray(rng.rand(2, D, D, D, D) - 0.5)
        model = J1J2_C4V_BIPARTITE(j1=1.0, j2=0.0)
        ctm_cfg = CtmArgs(ctm_max_iter=300, ctm_conv_tol=1e-10, grad_mode="implicit",
                          grad_adjoint_max_iter=200, grad_adjoint_tol=1e-8)
        cfg = Config(
            main=MainArgs(opt_max_iter=12, chi=chi, bond_dim=D),
            ctm=ctm_cfg,
            opt=OptArgs(line_search="backtracking", max_iter_per_epoch=1),
        )

        def loss_fn(p):
            a = symmetrize_c4v(p, normalize=True)
            e0 = init_env(jax.lax.stop_gradient(a), chi, "CTMRG")
            e = converge_env(a, e0, ctm_cfg)
            return model.energy_1x1_lowmem(a, e)

        def loss_ng(p):
            a = symmetrize_c4v(p, normalize=True)
            e0 = init_env(a, chi, "CTMRG")
            e, *_ = run_fixed_point(a=a, env=e0, max_iter=300, conv_tol=1e-10)
            return model.energy_1x1_lowmem(a, e)

        params, history = optimize_state(
            A0, loss_fn, cfg=cfg, loss_fn_linesearch=loss_ng,
            checkpoint_file=str(tmp_path / "ckpt.p"),
        )
        e0 = float(loss_ng(A0))
        e_fin = history["loss"][-1]
        assert e_fin < e0
        assert e_fin < -0.6, f"expected Heisenberg-like energy, got {e_fin}"


def test_sgd_quadratic():
    """SGD with momentum + backtracking minimizes a quadratic."""
    from tpeps.optim.sgd import SGD

    A = np.diag(np.asarray([1.0, 3.0, 10.0]))
    b = np.asarray([1.0, -2.0, 0.5])

    def closure(x):
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    def closure_ls(x):
        return 0.5 * x @ A @ x - b @ x

    opt = SGD(lr=0.5, momentum=0.5, line_search_fn="backtracking", max_iter=1)
    x = np.zeros(3)
    for _ in range(60):
        x, loss, g, info = opt.step_2c(x, closure, closure_ls)
    xstar = np.linalg.solve(A, b)
    assert np.abs(x - xstar).max() < 1e-4


def test_optimize_state_sgd_driver():
    """The epoch driver runs with opt_type=SGD on a tiny C4v problem and
    lowers the energy."""
    import jax
    from tpeps.config import CtmArgs, OptArgs
    from tpeps.ctm.c4v.ctmrg import converge_env
    from tpeps.ctm.c4v.env import init_env
    from tpeps.ipeps.ipeps_c4v import symmetrize_c4v
    from tpeps.models.j1j2 import J1J2_C4V_BIPARTITE
    from tpeps.optim.driver import optimize_state

    a0 = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 2, 2, 2), dtype=jnp.float64)
    a0 = symmetrize_c4v(a0)
    a0 = a0 / jnp.abs(a0).max()
    model = J1J2_C4V_BIPARTITE(j1=1.0)
    ctm = CtmArgs(ctm_max_iter=40, ctm_conv_tol=1e-8, grad_mode="scan",
                  grad_tail_iter=8)

    def loss_fn(params):
        a = symmetrize_c4v(params["a"])
        a = a / jnp.abs(a).max()
        from tpeps.ctm.c4v.ctmrg import run_scan
        env = run_scan(a, init_env(a, 8), 20, ctm)
        return model.energy_1x1(a, env)

    def loss_ls(params):
        a = symmetrize_c4v(params["a"])
        a = a / jnp.abs(a).max()
        env = converge_env(a, init_env(a, 8), ctm)
        return model.energy_1x1(a, env)

    from tpeps.config import Config, MainArgs
    cfg = Config(main=MainArgs(opt_max_iter=4),
                 opt=OptArgs(opt_type="SGD", lr=0.2, momentum=0.0,
                             line_search="backtracking"),
                 ctm=ctm)
    e0 = float(loss_ls({"a": a0}))
    x, history = optimize_state({"a": a0}, loss_fn, cfg=cfg,
                                loss_fn_linesearch=loss_ls)
    e1 = float(loss_ls(x))
    assert e1 < e0 - 1e-4, (e0, e1)
