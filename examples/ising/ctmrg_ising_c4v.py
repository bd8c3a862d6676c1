"""Observables of a stored/random TFIM C4v iPEPS via C4v CTMRG.

Counterpart of reference examples/ising/ctmrg_ising_c4v.py.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.ctm.c4v import transferops as transferops_c4v
from tpeps.models.ising import ISING_C4V

from optim_common_c4v import ctmrg_c4v, initial_site_c4v

parser = get_args_parser()
parser.add_argument("--hx", type=float, default=0.0, help="transverse field")
parser.add_argument("--q", type=float, default=0.0, help="plaquette interaction")
parser.add_argument("--top_n", type=int, default=0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = ISING_C4V(hx=args.hx, q=args.q, dtype=cfg.global_args.jnp_dtype)
    energy_f = model.energy_1x1_nn if args.q == 0 else model.energy_1x1_plaqette
    A0 = initial_site_c4v(cfg, model.phys_dim)
    e, a, env, *_ = ctmrg_c4v(cfg, model, energy_f, A0)
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
    """Smoke test of reference examples/ising/ctmrg_ising_c4v.py."""

    def setUp(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.instate = None
        args.hx = 3.0
        args.q = 0.0
        args.bond_dim = 2
        args.chi = 16
        args.seed = 5
        args.top_n = 0
        args.CTMARGS_ctm_max_iter = 60

    def test_ctmrg_SYMEIG(self):
        e = main()
        self.assertTrue(abs(e) < 20.0)
