"""Ground-state optimization of the J1-J2-lambda chiral model with a
complex 1-site C4v iPEPS.

Counterpart of reference examples/j1j2/optim_j1j2lambda_c4v.py.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.models.j1j2lambda import J1J2LAMBDA_C4V_BIPARTITE

from optim_common_c4v import initial_site_c4v, optimize_c4v

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--j3", type=float, default=0.0)
parser.add_argument("--lmbd", type=float, default=0.0,
                    help="chiral plaquette interaction")
parser.add_argument("--hz_stag", type=float, default=0.0)
parser.add_argument("--delta_zz", type=float, default=1.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = J1J2LAMBDA_C4V_BIPARTITE(
        j1=args.j1, j2=args.j2, j3=args.j3, lmbd=args.lmbd,
        hz_stag=args.hz_stag, delta_zz=args.delta_zz,
        dtype=cfg.global_args.jnp_dtype,
    )
    A0 = initial_site_c4v(cfg, model.phys_dim)
    e, *_ = optimize_c4v(cfg, model, model.energy_1x1, A0)
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOpt(unittest.TestCase):
    """Smoke tests (reference examples/j1j2/optim_j1j2lambda_c4v.py:
    TestOpt): short optimization runs at lmbd>0 in complex dtype."""

    def setUp(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.instate = None
        args.j2 = 0.0
        args.lmbd = 0.5
        args.bond_dim = 2
        args.chi = 16
        args.opt_max_iter = 3
        args.seed = 17
        args.out_prefix = "/tmp/RESULT_j1j2lambda_c4v_test"
        args.GLOBALARGS_dtype = "complex128"
        args.CTMARGS_ctm_max_iter = 60

    def test_opt_SYMEIG_LS_backtracking(self):
        args.OPTARGS_line_search = "backtracking"
        e = main()
        self.assertLess(e, 0.0)

    def test_opt_SYMEIG_LS_strong_wolfe(self):
        args.OPTARGS_line_search = "strong_wolfe"
        e = main()
        self.assertLess(e, 0.0)
