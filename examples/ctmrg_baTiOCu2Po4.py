"""Observables of a stored BaTiOCu2(PO4)2 8-site state (counterpart of
reference examples/ctmrg_baTiOCu2Po4.py):

    python examples/ctmrg_baTiOCu2Po4.py --instate <state.json> --chi 32
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import read_ipeps
from tpeps.models.baTiOCu2Po4 import BaTiOCu2Po4

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--jp2", type=float, default=0.0)
parser.add_argument("--jp11", type=float, default=0.0)
parser.add_argument("--jp12", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def lattice_to_site(coord):
    shift_x = coord[0] + 2 * (coord[1] // 2)
    return (shift_x % 4, coord[1] % 2)


def main():
    cfg = configure(args)
    model = BaTiOCu2Po4(j1=args.j1, j2=args.j2, jp2=args.jp2,
                        jp11=args.jp11, jp12=args.jp12,
                        dtype=cfg.global_args.jnp_dtype)
    state = read_ipeps(cfg.main.instate, vertexToSite=lattice_to_site)
    env = init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, _ = run(state, env, cfg.ctm)
    e = float(model.energy_2x2_8site(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgBaTiOCu2Po4(unittest.TestCase):
    """Measure the state produced by the optim test (if present) or a
    freshly optimized short run; the measurement must reproduce the
    optimizer's FINAL energy exactly (same engine, same chi)."""

    def test_ctmrg_measures_optimized(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        import optim_baTiOCu2Po4 as opt

        opt.args.instate = None
        opt.args.j1, opt.args.j2 = 1.0, 0.0
        opt.args.jp2, opt.args.jp11, opt.args.jp12 = 0.0, 0.0, 0.0
        opt.args.bond_dim = 2
        opt.args.chi = 8
        opt.args.seed = 2
        opt.args.opt_max_iter = 3
        opt.args.out_prefix = "/tmp/RESULT_batio_ctm_test"
        opt.args.CTMARGS_ctm_max_iter = 30
        e_opt = opt.main()

        args.instate = "/tmp/RESULT_batio_ctm_test_state.json"
        args.j1, args.j2 = 1.0, 0.0
        args.jp2, args.jp11, args.jp12 = 0.0, 0.0, 0.0
        args.chi = 8
        args.CTMARGS_ctm_max_iter = 30
        e = main()
        assert abs(e - e_opt) < 5e-5, (e, e_opt)
