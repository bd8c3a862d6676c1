"""Observables of a stored/random J-Q C4v iPEPS via C4v CTMRG.

Counterpart of reference examples/jq/ctmrg_jq_c4v.py: converge the
one-site C4v environment of a TI/BIPARTITE/PLAQUETTE J-Q ansatz, print
energy + observables and optionally the transfer-operator spectrum.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.ctm.c4v import transferops as transferops_c4v
from tpeps.models import jq

from optim_common_c4v import ctmrg_c4v, initial_site_c4v

parser = get_args_parser()
parser.add_argument("--c4v_type", default="TI",
                    help="C4v ansatz: TI, BIPARTITE or PLAQUETTE")
parser.add_argument("--j1", type=float, default=0.0)
parser.add_argument("--q", type=float, default=1.0)
parser.add_argument("--q_inter", type=float, default=None)
parser.add_argument("--top_n", type=int, default=0,
                    help="number of transfer-operator eigenvalues")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    from optim_jq_c4v import make_model

    model = make_model(cfg)
    A0 = initial_site_c4v(cfg, model.phys_dim)
    e, a, env, *_ = ctmrg_c4v(cfg, model, model.energy_1x1, A0)
    if args.top_n > 0:
        l = transferops_c4v.get_Top_spec_c4v(args.top_n, a, env)
        for i in range(l.shape[0]):
            print(f"{i} {float(l[i, 0])} {float(l[i, 1])}")
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrg(unittest.TestCase):
    """Smoke tests of reference examples/jq/ctmrg_jq_c4v.py."""

    def setUp(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.j1 = 0.0
        args.q = 1.0
        args.instate = None
        args.bond_dim = 2
        args.chi = 16
        args.seed = 3
        args.top_n = 0
        args.CTMARGS_ctm_max_iter = 60

    def test_ctmrg_SYMEIG(self):
        args.c4v_type = "TI"
        e = main()
        self.assertTrue(abs(e) < 10.0)

    def test_ctmrg_PLAQUETTE(self):
        args.c4v_type = "PLAQUETTE"
        e = main()
        self.assertTrue(abs(e) < 10.0)
