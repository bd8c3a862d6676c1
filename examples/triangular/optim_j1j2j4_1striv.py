"""Triangular-lattice J1-J2-J4 optimization over the constrained 1-site
ansatz zoo (counterpart of reference
examples/triangular/optim_j1j2j4_1striv.py):

    python examples/triangular/optim_j1j2j4_1striv.py --tiling 1STRIV \\
        --bond_dim 3 --chi 27

Tilings: 1SITEQ (plain tensor + spiral pitch q), 1STRIV (split
aux/physical trivalent tensors, C3v-A1-projected), 1SPG (one trivalent
aux tensor used twice + a two-leg physical bond tensor,
tpeps/ipeps/ipeps_trgl_pg.py IPEPS_TRGL_1S_TBT_PG).
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
from tpeps.ipeps.ipeps_1s_q import IPEPS_1S_Q, read_ipeps_1s_q, write_ipeps_1s_q
from tpeps.ipeps.ipeps_trgl_pg import (
    IPEPS_TRGL_1S_TBT_PG,
    IPEPS_TRGL_1S_TTPHYS_PG,
    read_ipeps_trgl_1s_pg,
)
from tpeps.models import spin_triangular
from tpeps.optim.driver import optimize_state

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--j4", type=float, default=0.0)
parser.add_argument("--diag", type=float, default=1.0)
parser.add_argument("--q", type=float, default=1.0, help="pitch vector (1SITEQ)")
parser.add_argument("--tiling", default="1STRIV",
                    choices=["1SITEQ", "1STRIV", "1SPG"])
args, unknown_args = parser.parse_known_args()


def init_state(cfg):
    D = cfg.main.bond_dim
    rd = cfg.global_args.real_dtype
    if cfg.main.instate is not None:
        if args.tiling == "1SITEQ":
            return read_ipeps_1s_q(cfg.main.instate,
                                   q=(1.0 / args.q, 1.0 / args.q))
        return read_ipeps_trgl_1s_pg(cfg.main.instate)
    key = jax.random.PRNGKey(cfg.main.seed)
    k1, k2 = jax.random.split(key)
    if args.tiling == "1SITEQ":
        A = jax.random.uniform(k1, (2, D, D, D, D), dtype=rd,
                               minval=-0.5, maxval=0.5)
        return IPEPS_1S_Q({(0, 0): A / jnp.abs(A).max()},
                          q=(1.0 / args.q, 1.0 / args.q))
    if args.tiling == "1STRIV":
        t_aux = jax.random.uniform(k1, (D, D, D), dtype=rd)
        t_phys = jax.random.uniform(k2, (D, D, D, 2), dtype=rd)
        return IPEPS_TRGL_1S_TTPHYS_PG(
            t_aux, t_phys, pgs=IPEPS_TRGL_1S_TTPHYS_PG.PG_A1,
            pg_symmetrize=True)
    t_aux = jax.random.uniform(k1, (D, D, D), dtype=rd)
    t_phys = jax.random.uniform(k2, (D, D, 2), dtype=rd)
    return IPEPS_TRGL_1S_TBT_PG(
        t_aux, t_phys, pgs=IPEPS_TRGL_1S_TBT_PG.PG_A1_A, pg_symmetrize=True)


def main():
    cfg = configure(args)
    chi = cfg.main.chi
    if args.tiling == "1SITEQ":
        model = spin_triangular.J1J2J4_1SITEQ(
            j1=args.j1, j2=args.j2, j4=args.j4, diag=args.diag,
            dtype=cfg.global_args.jnp_dtype)
    else:
        model = spin_triangular.J1J2J4_1SITE(
            j1=args.j1, j2=args.j2, j4=args.j4,
            dtype=cfg.global_args.jnp_dtype)
    state0 = init_state(cfg)

    def make_state(params):
        # normalize the dominant parameter tensor scale (traceable:
        # the loss closures are jitted)
        scale = jnp.max(jnp.stack([
            jnp.abs(t).max() for t in
            jax.tree_util.tree_leaves(jax.lax.stop_gradient(params))]))
        params = jax.tree_util.tree_map(lambda t: t / scale, params)
        return state0.set_parameters(params)

    def converge(params):
        st = make_state(params)
        env = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env, _ = run(st, env, cfg.ctm)
        return st, env

    def loss_ng(params):
        st, env = converge(params)
        return model.energy_per_site(st, env)

    def loss_fn(params):
        st = make_state(params)
        env0 = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env = converge_env_generic(dict(st.sites), env0, st, cfg.ctm)
        return model.energy_per_site(st, env)

    outfile = cfg.main.out_prefix + "_state.json"

    def best_writer(params, loss):
        st = make_state(params)
        if isinstance(st, IPEPS_1S_Q):
            write_ipeps_1s_q(st, outfile)
        else:
            st.write_to_file(outfile)

    params, history = optimize_state(
        state0.get_parameters(), loss_fn, cfg=cfg, loss_fn_linesearch=loss_ng,
        best_state_writer=best_writer,
        checkpoint_file=cfg.main.out_prefix + "_checkpoint.p",
        opt_resume=cfg.main.opt_resume,
    )
    st, env = converge(params)
    e = float(model.energy_per_site(st, env))
    obs_values, obs_labels = model.eval_obs(st, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptTrgl1SConstrained(unittest.TestCase):
    """Short D=2 optimizations of the constrained 1-site ansatze on the
    triangular HAFM: both trivalent tilings must reach below the
    uncorrelated bound (the 120-degree classical energy is -0.375;
    a few steps from random already pass e < -0.2)."""

    def _run(self, tiling):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        args.tiling = tiling
        args.instate = None
        args.j1, args.j2, args.j4 = 1.0, 0.0, 0.0
        args.bond_dim = 2
        args.chi = 8
        args.seed = 5
        args.opt_max_iter = 6
        args.out_prefix = f"/tmp/RESULT_trgl_{tiling}_test"
        args.CTMARGS_ctm_max_iter = 30
        return main()

    def test_opt_1striv(self):
        e = self._run("1STRIV")
        assert e < -0.2, e

    def test_opt_1spg(self):
        e = self._run("1SPG")
        assert e < -0.2, e
