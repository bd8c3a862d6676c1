"""Ground-state optimization of the transverse-field Ising model with a
1-site iPEPS (counterpart of reference examples/ising/optim_ising.py)."""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.ctmrg import run, run_differentiable
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import IPEPS, read_ipeps, write_ipeps
from tpeps.models.ising import ISING
from tpeps.optim.driver import optimize_state

parser = get_args_parser()
parser.add_argument("--hx", type=float, default=0.0, help="transverse field")
parser.add_argument("--q", type=float, default=0.0, help="plaquette interaction")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    chi = cfg.main.chi
    model = ISING(hx=args.hx, q=args.q, dtype=cfg.global_args.jnp_dtype)

    if cfg.main.instate is not None:
        state0 = read_ipeps(cfg.main.instate)
        A0 = next(iter(state0.sites.values()))
    else:
        key = jax.random.PRNGKey(cfg.main.seed)
        D = cfg.main.bond_dim
        A0 = jax.random.uniform(key, (2, D, D, D, D), dtype=cfg.global_args.real_dtype)
        A0 = A0 / jnp.linalg.norm(A0)

    def make_state(p):
        return IPEPS({(0, 0): p / jnp.linalg.norm(p)}, lX=1, lY=1)

    def converge(p):
        st = make_state(p)
        env = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env, _ = run(st, env, cfg.ctm)
        return st, env

    def loss_fn_ng(p):
        st, env = converge(p)
        return model.energy_1x1(st, env)

    def loss_ctx_fn(p):
        # converged environment, computed host-side once per epoch
        _, env = converge(p)
        return (dict(env.C), dict(env.T))

    def loss_fn(p, ctx):
        from tpeps.ctm.generic.env import ENV

        C, T = ctx
        st = make_state(p)
        env = run_differentiable(dict(st.sites), ENV(chi, C, T), st, cfg.ctm)
        return model.energy_1x1(st, env)

    outfile = cfg.main.out_prefix + "_state.json"

    def best_writer(p, loss):
        write_ipeps(make_state(p), outfile)

    def obs_fn(p, ctx):
        st, env = converge(p)
        obs_values, obs_labels = model.eval_obs(st, env)
        if ctx["epoch"] == 0:
            print(", ".join(["epoch", "energy"] + obs_labels))
        print(", ".join([str(ctx["epoch"]), f"{ctx['loss']}"] + [str(v) for v in obs_values]))

    params, history = optimize_state(
        A0, loss_fn, cfg=cfg, loss_fn_linesearch=loss_fn_ng,
        loss_ctx_fn=loss_ctx_fn, obs_fn=obs_fn,
        best_state_writer=best_writer,
        checkpoint_file=cfg.main.out_prefix + "_checkpoint.p",
        opt_resume=cfg.main.opt_resume,
    )
    st, env = converge(next(iter(params.values())) if isinstance(params, dict) else params)
    e = float(model.energy_1x1(st, env))
    print(f"FINAL {e}")
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptIsing(unittest.TestCase):
    def test_small_opt(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.hx = 3.0
        args.bond_dim = 2
        args.chi = 8
        args.opt_max_iter = 8
        args.out_prefix = "/tmp/RESULT_ising_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 60
        args.CTMARGS_grad_tail_iter = 10
        e = main()
        # hx=3.0 TFIM: energy must be below the product-state bound
        self.assertLess(e, -3.0)
