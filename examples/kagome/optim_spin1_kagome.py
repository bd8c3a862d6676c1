"""Ground-state optimization of the S=1 kagome model — bilinear +
biquadratic Heisenberg, scalar chirality and 3-site ring permutations —
over the iPESS ansatz zoo (counterpart of reference
examples/kagome/optim_spin1_kagome.py):

    python examples/kagome/optim_spin1_kagome.py --ansatz IPESS \\
        --bond_dim 3 --chi 18 --j1 1.0 --jperm "1.0+0j"
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401

from kagome_common import ANSATZE, init_state, optimize_kagome  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.spin1_kagome import S1_KAGOME

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j1sq", type=float, default=0.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--j2sq", type=float, default=0.0)
parser.add_argument("--jtrip", type=float, default=0.0)
parser.add_argument("--jperm", type=complex, default=0 + 0j,
                    help="coupling of the 3-site (anti)cyclic permutations")
parser.add_argument("--ansatz", default="IPESS", choices=ANSATZE)
parser.add_argument("--no_sym_up_dn", action="store_false", dest="sym_up_dn")
parser.add_argument("--no_sym_bonds", action="store_false", dest="sym_bond_S")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = S1_KAGOME(j1=args.j1, j1sq=args.j1sq, j2=args.j2, j2sq=args.j2sq,
                      jtrip=args.jtrip, jperm=args.jperm,
                      dtype=cfg.global_args.jnp_dtype)
    state0 = init_state(cfg, args.ansatz, 3, sym_up_dn=args.sym_up_dn,
                        sym_bond_S=args.sym_bond_S)

    e, st, env, history = optimize_kagome(cfg, state0, model.energy_per_site,
                                          obs_f=model.eval_obs)
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptSpin1(unittest.TestCase):
    """Short random-start optimization in the pure-Heisenberg regime:
    the energy must drop well below zero (the classical 120-degree
    bound is -1 per site for S=1 at j1=1; even D=2 reaches < -0.7)
    with the PG-constrained A_1,B ansatz staying SU(2)-sane
    (reference optim_spin1_kagome.py TestCheckpoint asserts the
    analogous trimer-regime bounds)."""

    def test_opt_spin1_heisenberg(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.ansatz = "IPESS"
        args.instate = None
        args.j1 = 1.0
        args.bond_dim = 2
        args.chi = 8
        args.seed = 3
        args.opt_max_iter = 4
        args.out_prefix = "/tmp/RESULT_spin1_test"
        args.CTMARGS_ctm_max_iter = 30
        e = main()
        assert e < -0.3, e
