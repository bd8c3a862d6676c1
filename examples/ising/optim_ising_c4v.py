"""Ground-state optimization of the TFIM with a 1-site C4v iPEPS.

Counterpart of reference examples/ising/optim_ising_c4v.py: for q=0 the
energy is the NN contraction from rdm2x1; a finite plaquette coupling q
switches to the full 2x2-plaquette evaluation.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.models.ising import ISING_C4V

from optim_common_c4v import initial_site_c4v, optimize_c4v

parser = get_args_parser()
parser.add_argument("--hx", type=float, default=0.0, help="transverse field")
parser.add_argument("--q", type=float, default=0.0, help="plaquette interaction")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = ISING_C4V(hx=args.hx, q=args.q, dtype=cfg.global_args.jnp_dtype)
    energy_f = model.energy_1x1_nn if args.q == 0 else model.energy_1x1_plaqette
    A0 = initial_site_c4v(cfg, model.phys_dim)
    e, *_ = optimize_c4v(cfg, model, energy_f, A0)
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOpt(unittest.TestCase):
    """Smoke test of reference examples/ising/optim_ising_c4v.py:170-186."""

    def setUp(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.instate = None
        args.hx = 3.0
        args.q = 0.0
        args.bond_dim = 2
        args.chi = 16
        args.opt_max_iter = 8
        args.seed = 11
        args.out_prefix = "/tmp/RESULT_ising_c4v_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 60

    def test_opt_SYMEIG(self):
        e = main()
        # must beat the trivial product bound E = -hx at hx=3
        self.assertLess(e, -3.0)
