"""S=1 bilinear-biquadratic model with XY anisotropy (coupled chains)
— ground-state optimization (counterpart of reference
examples/blbqS1/optim_blbqS1_anisotropy.py, models/hb_anisotropy.py).

    python examples/blbqS1/optim_blbqS1_anisotropy.py --j1_x 1 --j1_y 0.3
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from optim_common import optimize_generic, state_from_args  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.hb_anisotropy import COUPLEDCHAINS

parser = get_args_parser()
parser.add_argument("--j1_x", type=float, default=1.0)
parser.add_argument("--j1_y", type=float, default=1.0)
parser.add_argument("--k1_x", type=float, default=0.0)
parser.add_argument("--k1_y", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = COUPLEDCHAINS(
        phys_dim=3, j1_x=args.j1_x, j1_y=args.j1_y, k1_x=args.k1_x,
        k1_y=args.k1_y, dtype=cfg.global_args.jnp_dtype,
    )
    coords = [(0, 0), (1, 0), (0, 1), (1, 1)]
    sites0 = state_from_args(cfg, coords, 3)
    e, *_ = optimize_generic(cfg, model.energy_2x1_1x2, sites0)
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptBLBQ(unittest.TestCase):
    def test_small_opt(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.j1_x, args.j1_y = 1.0, 0.3
        args.k1_x = args.k1_y = 0.1
        args.bond_dim = 2
        args.chi = 8
        args.opt_max_iter = 3
        args.seed = 3
        args.out_prefix = "/tmp/RESULT_blbq_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 30
        args.CTMARGS_grad_tail_iter = 6
        e = main()
        self.assertLess(e, 0.0)
