"""S=2 AKLT model ground-state optimization (counterpart of reference
examples/akltS2/optim_akltS2.py).

The AKLT Hamiltonian is a sum of projectors, so the exact ground-state
energy is 0 — a parameter-free anchor for the optimization.

    python examples/akltS2/optim_akltS2.py --bond_dim 2 --chi 16
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from optim_common import optimize_generic, state_from_args  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.akltS2 import AKLTS2

parser = get_args_parser()
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = AKLTS2(dtype=cfg.global_args.jnp_dtype)
    coords = [(0, 0), (1, 0)]

    def bipartite(coord):
        return ((coord[0] + coord[1]) % 2, 0)

    sites0 = state_from_args(cfg, coords, 5, vertexToSite=bipartite)
    e, *_ = optimize_generic(
        cfg, model.energy_2x1_1x2, sites0, vertexToSite=bipartite, lX=2, lY=2,
    )
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptAKLT(unittest.TestCase):
    def test_small_opt(self):
        """H >= 0 (sum of projectors): optimization from the committed
        AKLT product state must stay at 0 to numerical precision."""
        import jax

        jax.config.update("jax_platforms", "cpu")
        REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")
        f = os.path.join(REF, "test-input", "AKLT-S2_2x1_biLat.in")
        args.instate = f if os.path.exists(f) else None
        args.bond_dim = 2
        args.chi = 8
        args.opt_max_iter = 2
        args.seed = 4
        args.out_prefix = "/tmp/RESULT_aklt_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 40
        args.CTMARGS_grad_tail_iter = 6
        e = main()
        if args.instate:
            self.assertLess(abs(e), 1e-7)  # already the exact ground state
        else:
            self.assertGreater(e, -1e-7)  # variational bound e >= 0
