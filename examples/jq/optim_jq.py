"""Ground-state optimization of the J-Q model with a generic unit cell
(counterpart of reference examples/jq/optim_jq.py).

    python examples/jq/optim_jq.py --j1 1 --q 0.5 --bond_dim 2 --chi 16
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from optim_common import optimize_generic, state_from_args  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.jq import JQ

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--q", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = JQ(j1=args.j1, q=args.q, dtype=cfg.global_args.jnp_dtype)
    coords = [(0, 0), (1, 0), (0, 1), (1, 1)]
    sites0 = state_from_args(cfg, coords, 2)
    e, *_ = optimize_generic(
        cfg, model.energy_2x2_4site, sites0, obs_f=model.eval_obs,
    )
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptJQ(unittest.TestCase):
    def test_small_opt(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.j1, args.q = 0.0, 1.0  # pure Q term (reference optim_jq.py:133)
        args.bond_dim = 2
        args.chi = 8
        args.opt_max_iter = 4
        args.seed = 2
        args.out_prefix = "/tmp/RESULT_jq_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 40
        args.CTMARGS_grad_tail_iter = 8
        e = main()
        self.assertLess(e, -0.2)  # Q-term plaquette energy is negative
