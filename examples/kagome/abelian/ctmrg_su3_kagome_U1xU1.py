"""Observables of a stored U(1)xU(1) SU(3) kagome iPESS through the
block-sparse abelian CTM (counterpart of reference
examples/kagome/abelian/ctmrg_su3_kagome_U1xU1.py):

    python examples/kagome/abelian/ctmrg_su3_kagome_U1xU1.py \\
        --instate <abelian_U1xU1_state.json> --phi 0.5 --chi 27
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401
import numpy as np

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_a
from tpeps.ctm.generic_abelian import env as env_a
from tpeps.ipeps.ipess_kagome_abelian import read_ipess_kagome_abelian
from tpeps.models.abelian.su3_kagome import KAGOME_SU3_U1xU1

parser = get_args_parser()
parser.add_argument("--phi", type=float, default=0.5,
                    help="angle in units of pi: J=cos(phi pi), K=sin(phi pi)cos(theta pi)")
parser.add_argument("--theta", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    j = float(np.round(np.cos(np.pi * args.phi), 12))
    k = float(np.round(np.sin(np.pi * args.phi) * np.cos(np.pi * args.theta), 12))
    h = float(np.round(np.sin(np.pi * args.phi) * np.sin(np.pi * args.theta), 12))
    model = KAGOME_SU3_U1xU1(phys_dim=3, j=j, k=k, h=h)

    state = read_ipess_kagome_abelian(cfg.main.instate)
    fused = state.fused()
    env = env_a.init_env(fused, cfg.main.chi)
    env, _ = ctmrg_a.run(fused, env, cfg.ctm)

    e = float(model.energy_per_site_2x2subsystem(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgSU3U1xU1(unittest.TestCase):
    """The committed U(1)xU(1) AKLT D=3 state gives E/site = -2/3 at
    the AKLT point phi=0.5 (the same golden the dense
    examples/kagome/ctmrg_su3_kagome.py reproduces)."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "IPESS_AKLT_3b_D3_1x1_abelian-U1xU1_T3T8_state.json")

    def test_ctmrg_su3_aklt_u1xu1(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.phi = 0.5
        args.theta = 0.0
        args.chi = 18
        args.CTMARGS_ctm_max_iter = 80
        args.CTMARGS_ctm_conv_tol = 1e-9
        e = main()
        self.assertAlmostEqual(e, -2.0 / 3.0, delta=1e-6)
