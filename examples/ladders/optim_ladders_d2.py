"""Coupled-ladders optimization over the D2-symmetric single-parent
ansatz (counterpart of reference examples/ladders/optim_ladders_d2.py):

    python examples/ladders/optim_ladders_d2.py --alpha 0.3 --bond_dim 2

One parent tensor A[s,u,l,d,r] with A = A[s,u,r,d,l] generates the 1x2
cell (the lower site is the u<->d transpose); the strong ladder rungs
sit on the "down" bonds, the weak (alpha) bonds on "up".  The AFM
pattern enters through rotated operators in the energy evaluation
(tpeps/models/coupledLadders.py COUPLEDLADDERS_D2_BIPARTITE).
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.ctmrg import converge_env_generic, run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import write_ipeps
from tpeps.ipeps.ipeps_c4v import IPEPS_D2SYM, read_ipeps_d2
from tpeps.models import coupledLadders
from tpeps.optim.driver import optimize_state

parser = get_args_parser()
parser.add_argument("--alpha", type=float, default=0.0,
                    help="inter-ladder coupling")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    chi = cfg.main.chi
    model = coupledLadders.COUPLEDLADDERS_D2_BIPARTITE(
        alpha=args.alpha, dtype=cfg.global_args.jnp_dtype)

    if cfg.main.instate is not None:
        state0 = read_ipeps_d2(cfg.main.instate)
        if cfg.main.instate_noise:
            state0 = state0.add_noise(cfg.main.instate_noise, key=cfg.main.seed)
    else:
        D = cfg.main.bond_dim
        key = jax.random.PRNGKey(cfg.main.seed)
        A = jax.random.uniform(key, (model.phys_dim, D, D, D, D),
                               dtype=cfg.global_args.real_dtype)
        state0 = IPEPS_D2SYM(A / jnp.abs(A).max())

    def make_state(params):
        a = params["parent"]
        return IPEPS_D2SYM(a / jnp.abs(a).max())

    def converge(params):
        st = make_state(params)
        env = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env, _ = run(st, env, cfg.ctm)
        return st, env

    def loss_ng(params):
        st, env = converge(params)
        return model.energy_2x1_1x2(st, env)

    def loss_fn(params):
        st = make_state(params)
        env0 = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env = converge_env_generic(dict(st.sites), env0, st, cfg.ctm)
        return model.energy_2x1_1x2(st, env)

    outfile = cfg.main.out_prefix + "_state.json"

    def best_writer(params, loss):
        write_ipeps(make_state(params), outfile)

    params, history = optimize_state(
        state0.get_parameters(), loss_fn, cfg=cfg, loss_fn_linesearch=loss_ng,
        best_state_writer=best_writer,
        checkpoint_file=cfg.main.out_prefix + "_checkpoint.p",
        opt_resume=cfg.main.opt_resume,
    )
    st, env = converge(params)
    e = float(model.energy_2x1_1x2(st, env))
    obs_values, obs_labels = model.eval_obs(st, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptLaddersD2(unittest.TestCase):
    """At alpha=1 the model is the square-lattice HAFM: a short D=2
    optimization of the D2 ansatz must head into the AFM basin
    (e < -0.55; the D=2 optimum is ~-0.6602, reference README Ex.1)."""

    def test_opt_ladders_d2(self):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        args.alpha = 1.0
        args.instate = None
        args.bond_dim = 2
        args.chi = 16
        args.seed = 2
        args.opt_max_iter = 12
        args.out_prefix = "/tmp/RESULT_ladders_d2_test"
        args.CTMARGS_ctm_max_iter = 50
        e = main()
        assert e < -0.55, e
