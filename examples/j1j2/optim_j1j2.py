"""J1-J2 model, generic unit cells — ground-state optimization
(counterpart of reference examples/j1j2/optim_j1j2.py).

    python examples/j1j2/optim_j1j2.py --j2 0.3 --tiling 2SITE --bond_dim 2
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from optim_common import optimize_generic, state_from_args  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.j1j2 import J1J2

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--tiling", default="2SITE")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = J1J2(j1=args.j1, j2=args.j2, dtype=cfg.global_args.jnp_dtype)
    if args.tiling == "2SITE":
        coords = [(0, 0), (1, 0)]

        def v2s(coord):
            return ((coord[0] + abs(coord[0]) * 2) % 2, 0)

        sites0 = state_from_args(cfg, coords, 2, vertexToSite=v2s)
        e, *_ = optimize_generic(
            cfg, model.energy_2x2_2site, sites0, vertexToSite=v2s, lX=2, lY=2,
            obs_f=model.eval_obs,
        )
    elif args.tiling == "4SITE":
        coords = [(0, 0), (1, 0), (0, 1), (1, 1)]
        sites0 = state_from_args(cfg, coords, 2)
        e, *_ = optimize_generic(
            cfg, model.energy_2x2_4site, sites0, obs_f=model.eval_obs,
        )
    else:
        raise ValueError(f"Invalid tiling: {args.tiling}")
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptJ1J2Generic(unittest.TestCase):
    def test_small_opt_2site(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.j1, args.j2 = 1.0, 0.0
        args.tiling = "2SITE"
        args.bond_dim = 2
        args.chi = 8
        args.opt_max_iter = 7
        args.seed = 8
        args.out_prefix = "/tmp/RESULT_j1j2gen_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 30
        args.CTMARGS_grad_tail_iter = 6
        e = main()
        # Heisenberg: a few epochs from random D=2 head toward -0.66
        self.assertLess(e, -0.38)
