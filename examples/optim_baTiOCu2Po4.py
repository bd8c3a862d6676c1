"""Ground-state optimization of the BaTiOCu2(PO4)2 plaquette
antiferromagnet over its 8-site (4x2) unit cell (counterpart of
reference examples/optim_baTiOCu2Po4.py):

    python examples/optim_baTiOCu2Po4.py --bond_dim 2 --chi 16 \\
        --j1 1.0 --jp11 0.1
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from optim_common import optimize_generic, state_from_args  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.baTiOCu2Po4 import BaTiOCu2Po4

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0,
                    help="NN interaction (strong plaquettes)")
parser.add_argument("--j2", type=float, default=0.0,
                    help="NNN interaction (strong plaquettes)")
parser.add_argument("--jp2", type=float, default=0.0,
                    help="NNN interaction (weak plaquettes)")
parser.add_argument("--jp11", type=float, default=0.0,
                    help="NN interaction (weak plaquettes)")
parser.add_argument("--jp12", type=float, default=0.0,
                    help="NN interaction (weak plaquettes)")
args, unknown_args = parser.parse_known_args()

COORDS = [(x, y) for x in range(4) for y in range(2)]


def lattice_to_site(coord):
    """8SITE tiling (reference examples/optim_baTiOCu2Po4.py:39-44)."""
    shift_x = coord[0] + 2 * (coord[1] // 2)
    return (shift_x % 4, coord[1] % 2)


def main():
    cfg = configure(args)
    model = BaTiOCu2Po4(j1=args.j1, j2=args.j2, jp2=args.jp2,
                        jp11=args.jp11, jp12=args.jp12,
                        dtype=cfg.global_args.jnp_dtype)
    sites0 = state_from_args(cfg, COORDS, 2, vertexToSite=lattice_to_site)
    e, *_ = optimize_generic(
        cfg, model.energy_2x2_8site, sites0,
        vertexToSite=lattice_to_site, lX=4, lY=2, obs_f=model.eval_obs,
    )
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptBaTiOCu2Po4(unittest.TestCase):
    """Decoupled strong plaquettes (j1 only): the exact ground state is
    a product of plaquette singlets at -2 per plaquette = -0.5 per site
    x 8 sites = -4 per cell; a short D=2 optimization must head well
    into that basin (e < -2.0 per cell)."""

    def test_opt_strong_plaquettes(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.instate = None
        args.j1, args.j2 = 1.0, 0.0
        args.jp2, args.jp11, args.jp12 = 0.0, 0.0, 0.0
        args.bond_dim = 2
        args.chi = 8
        args.seed = 2
        args.opt_max_iter = 6
        args.out_prefix = "/tmp/RESULT_batio_test"
        args.CTMARGS_ctm_max_iter = 30
        e = main()
        assert e < -2.0, e
