"""Ground-state optimization of the S=2 AKLT model with a 1-site C4v iPEPS.

Counterpart of reference examples/akltS2/optim_akltS2_c4v.py: the
Hamiltonian is the sum of spin-4 projectors on NN bonds (shifted so the
exact AKLT state has E = 0), evaluated through the bipartite-rotated
C4v rdm2x1.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.models.akltS2 import AKLTS2_C4V_BIPARTITE

from optim_common_c4v import initial_site_c4v, optimize_c4v

parser = get_args_parser()
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = AKLTS2_C4V_BIPARTITE(dtype=cfg.global_args.jnp_dtype)
    A0 = initial_site_c4v(cfg, model.phys_dim)
    e, *_ = optimize_c4v(cfg, model, model.energy_1x1, A0)
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOpt(unittest.TestCase):
    """Smoke test of reference examples/akltS2/optim_akltS2_c4v.py:119-140."""

    def setUp(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.instate = None
        args.bond_dim = 2
        args.chi = 16
        args.opt_max_iter = 3
        args.seed = 2
        args.out_prefix = "/tmp/RESULT_akltS2_c4v_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 60

    def test_opt_SYMEIG(self):
        e = main()
        # projector Hamiltonian: energy is non-negative and should
        # head towards the AKLT point E=0
        self.assertLess(e, 2.0)
