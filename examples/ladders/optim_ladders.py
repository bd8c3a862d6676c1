"""Coupled two-leg Heisenberg ladders — ground-state optimization
(counterpart of reference examples/ladders/optim_ladders.py).

    python examples/ladders/optim_ladders.py --alpha 0.3 --bond_dim 2
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from optim_common import optimize_generic, state_from_args  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.coupledLadders import COUPLEDLADDERS

parser = get_args_parser()
parser.add_argument("--alpha", type=float, default=0.0, help="inter-ladder coupling")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = COUPLEDLADDERS(alpha=args.alpha, dtype=cfg.global_args.jnp_dtype)
    coords = [(0, 0), (1, 0), (0, 1), (1, 1)]
    sites0 = state_from_args(cfg, coords, 2)
    e, *_ = optimize_generic(cfg, model.energy_2x1_1x2, sites0)
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptLadders(unittest.TestCase):
    def test_small_opt(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.alpha = 0.0
        args.bond_dim = 2
        args.chi = 8
        args.opt_max_iter = 4
        args.seed = 5
        args.out_prefix = "/tmp/RESULT_ladders_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 30
        args.CTMARGS_grad_tail_iter = 6
        e = main()
        self.assertLess(e, -0.3)  # decoupled-ladder energy well below 0
