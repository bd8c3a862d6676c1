"""Ground-state optimization of the SU(3) kagome model
(J 2-site exchange, K/h real/imaginary 3-site ring exchange) over the
iPESS ansatz zoo (counterpart of reference
examples/kagome/optim_su3_kagome.py):

    python examples/kagome/optim_su3_kagome.py --ansatz IPESS \\
        --bond_dim 3 --chi 18 --phi 0.5 --theta 0.0

Couplings are parametrized as J=cos(pi phi), K=sin(pi phi)cos(pi theta),
h=sin(pi phi)sin(pi theta).
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401
import numpy as np

from kagome_common import ANSATZE, init_state, optimize_kagome  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.su3_kagome import KAGOME_SU3

parser = get_args_parser()
parser.add_argument("--phi", type=float, default=0.5,
                    help="angle in units of pi: J=cos(phi pi), K=sin(phi pi)cos(theta pi)")
parser.add_argument("--theta", type=float, default=0.0)
parser.add_argument("--ansatz", default="IPESS", choices=ANSATZE)
parser.add_argument("--no_sym_up_dn", action="store_false", dest="sym_up_dn")
parser.add_argument("--no_sym_bonds", action="store_false", dest="sym_bond_S")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    j = float(np.round(np.cos(np.pi * args.phi), 12))
    k = float(np.round(np.sin(np.pi * args.phi) * np.cos(np.pi * args.theta), 12))
    h = float(np.round(np.sin(np.pi * args.phi) * np.sin(np.pi * args.theta), 12))
    model = KAGOME_SU3(phys_dim=3, j=j, k=k, h=h)
    state0 = init_state(cfg, args.ansatz, 3, sym_up_dn=args.sym_up_dn,
                        sym_bond_S=args.sym_bond_S)

    e, st, env, history = optimize_kagome(
        cfg, state0, model.energy_per_site_2x2subsystem, obs_f=model.eval_obs)
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptSU3AKLT(unittest.TestCase):
    """Noise-perturbed AKLT instate must re-converge toward E = -2/3 at
    the AKLT point phi=0.5 (reference optim_su3_kagome.py:298-357)."""

    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def test_opt_su3_aklt_ipess(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(self.REF, "test-input",
                         "AKLT_SU3_KAGOME_D3_IPESS_state.json")
        if not os.path.isfile(f):
            self.skipTest("reference test-input not available")
        args.ansatz = "IPESS"
        args.instate = f
        args.instate_noise = 0.03
        args.seed = 1
        args.bond_dim = 3
        args.chi = 9
        args.phi = 0.5
        args.theta = 0.0
        args.opt_max_iter = 3
        args.out_prefix = "/tmp/RESULT_su3_aklt_test"
        args.CTMARGS_ctm_max_iter = 40
        e = main()
        assert e < -0.64, e  # re-approaches -2/3 from the noisy start
