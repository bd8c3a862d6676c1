"""Triangular-lattice J1-J2-J4 model — ground-state optimization
(counterpart of reference examples/triangular/optim_j1j2j4.py).

    python examples/triangular/optim_j1j2j4.py --j2 0.1 --bond_dim 2
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from optim_common import optimize_generic, state_from_args  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.spin_triangular import J1J2J4_1SITE

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--j4", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = J1J2J4_1SITE(j1=args.j1, j2=args.j2, j4=args.j4,
                         dtype=cfg.global_args.jnp_dtype)
    sites0 = state_from_args(cfg, [(0, 0)], 2)
    e, *_ = optimize_generic(
        cfg, lambda st, env: model.energy_per_site(st, env), sites0, lX=1, lY=1,
    )
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptTriangular(unittest.TestCase):
    def test_small_opt(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.j1, args.j2, args.j4 = 1.0, 0.0, 0.0
        args.bond_dim = 2
        args.chi = 8
        args.opt_max_iter = 3
        args.seed = 6
        args.out_prefix = "/tmp/RESULT_trgl_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 30
        args.CTMARGS_grad_tail_iter = 6
        e = main()
        # triangular Heisenberg: frustrated, but still well below zero
        self.assertLess(e, -0.2)
