"""Spin-1/2 kagome Heisenberg — ground-state optimization of a generic
iPESS ansatz (counterpart of reference
examples/kagome/optim_kagome_spin_half.py).

The variational parameters are the 5 elementary iPESS tensors
(T_u, T_d, B_a, B_b, B_c); the on-site square-lattice tensor is
reassembled inside the differentiable loss.

    python examples/kagome/optim_kagome_spin_half.py --bond_dim 2 --chi 16
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.ctmrg import run, run_differentiable
from tpeps.ctm.generic.env import ENV, init_env
from tpeps.ipeps.ipess_kagome import (
    IPESS_KAGOME_GENERIC,
    read_ipess_kagome_generic,
    write_ipess_kagome_generic,
)
from tpeps.models.spin_half_kagome import S_HALF_KAGOME
from tpeps.optim.driver import optimize_state

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--JD", type=float, default=0.0)
parser.add_argument("--jtrip", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    chi = cfg.main.chi
    model = S_HALF_KAGOME(j1=args.j1, JD=args.JD, jtrip=args.jtrip,
                          dtype=cfg.global_args.jnp_dtype)

    if cfg.main.instate is not None:
        state0 = read_ipess_kagome_generic(cfg.main.instate)
        params0 = state0.get_parameters()
    else:
        D = cfg.main.bond_dim
        key = jax.random.PRNGKey(cfg.main.seed)
        ks = jax.random.split(key, 5)
        rd = cfg.global_args.real_dtype
        td = {
            "T_u": jax.random.uniform(ks[0], (D, D, D), dtype=rd, minval=-0.5, maxval=0.5),
            "T_d": jax.random.uniform(ks[1], (D, D, D), dtype=rd, minval=-0.5, maxval=0.5),
            "B_a": jax.random.uniform(ks[2], (2, D, D), dtype=rd, minval=-0.5, maxval=0.5),
            "B_b": jax.random.uniform(ks[3], (2, D, D), dtype=rd, minval=-0.5, maxval=0.5),
            "B_c": jax.random.uniform(ks[4], (2, D, D), dtype=rd, minval=-0.5, maxval=0.5),
        }
        params0 = {(0, 0): td}

    def make_state(params):
        return IPESS_KAGOME_GENERIC({c: dict(td) for c, td in params.items()})

    def converge(params):
        st = make_state(params)
        env = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env, _ = run(st, env, cfg.ctm)
        return st, env

    def loss_ng(params):
        st, env = converge(params)
        return model.energy_per_site(st, env)

    def loss_ctx_fn(params):
        _, env = converge(params)
        return (dict(env.C), dict(env.T))

    def loss_fn(params, ctx):
        C, T = ctx
        st = make_state(params)
        env = run_differentiable(dict(st.sites), ENV(chi, C, T), st, cfg.ctm)
        return model.energy_per_site(st, env)

    outfile = cfg.main.out_prefix + "_state.json"

    def best_writer(params, loss):
        write_ipess_kagome_generic(make_state(params), outfile)

    params, history = optimize_state(
        params0, loss_fn, cfg=cfg, loss_fn_linesearch=loss_ng,
        loss_ctx_fn=loss_ctx_fn, best_state_writer=best_writer,
        checkpoint_file=cfg.main.out_prefix + "_checkpoint.p",
        opt_resume=cfg.main.opt_resume,
    )
    st, env = converge(params)
    e = float(model.energy_per_site(st, env))
    print(f"FINAL {e}")
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptKagome(unittest.TestCase):
    def test_small_opt(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.j1 = 1.0
        args.bond_dim = 2
        args.chi = 8
        args.opt_max_iter = 3
        args.seed = 7
        args.out_prefix = "/tmp/RESULT_kagome_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 30
        args.CTMARGS_grad_tail_iter = 6
        e = main()
        # kagome HAFM per-site energy well below the classical -1/8... use
        # a loose variational sanity bound
        self.assertLess(e, -0.1)
