"""CZX SPT model: CTMRG of the exact CZX state and ground-state
optimization (counterpart of reference examples/czx/optim_czx.py).

    python examples/czx/optim_czx.py --g_czx 1.0 --bond_dim 2 --chi 16
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from optim_common import optimize_generic, state_from_args  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.czx import CZX

parser = get_args_parser()
parser.add_argument("--g_czx", type=float, default=1.0)
parser.add_argument("--g_zxz", type=float, default=0.0)
parser.add_argument("--V", type=float, default=0.0)
parser.add_argument("--delta", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = CZX(g_czx=args.g_czx, g_zxz=args.g_zxz, V=args.V, delta=args.delta,
                dtype=cfg.global_args.jnp_dtype)
    sites0 = state_from_args(cfg, [(0, 0)], model.phys_dim)
    e, *_ = optimize_generic(cfg, model.energy_per_site, sites0, lX=1, lY=1)
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCZX(unittest.TestCase):
    def test_ctmrg_exact_czx_state(self):
        """The exact CZX PEPS is the zero-... -1-per-site eigenstate of
        the pure CZX term (tests/test_czx.py anchors)."""
        import jax

        jax.config.update("jax_platforms", "cpu")
        from tpeps.config import CtmArgs
        from tpeps.ctm.generic.ctmrg import run
        from tpeps.ctm.generic.env import init_env
        from tpeps.ipeps.ipeps import IPEPS
        from tpeps.models.czx import CZX, czx_ground_state

        A = czx_ground_state()
        st = IPEPS({(0, 0): A}, lX=1, lY=1)
        env = init_env(st, 16, "CTMRG")
        env, _ = run(st, env, CtmArgs(ctm_max_iter=40, ctm_conv_tol=1e-10))
        model = CZX(g_czx=1.0)
        e = float(model.energy_per_site(st, env))
        self.assertAlmostEqual(e, -1.0, delta=1e-8)

    def test_small_opt(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.g_czx = 1.0
        args.bond_dim = 2
        args.chi = 8
        args.opt_max_iter = 3
        args.seed = 1
        args.out_prefix = "/tmp/RESULT_czx_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 40
        args.CTMARGS_grad_tail_iter = 6
        e = main()
        self.assertLess(e, 0.0)
