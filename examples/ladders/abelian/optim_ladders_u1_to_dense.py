"""Optimize a U(1) coupled-ladders state with the DENSE engine after
densification (counterpart of reference
examples/ladders/abelian/optim_ladders_u1_to_dense.py — the abelian
state provides the structured initial point, the dense AD stack does
the optimization):

    python examples/ladders/abelian/optim_ladders_u1_to_dense.py \\
        --instate <abelian_state.json> --alpha 0.1 --chi 24
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

from optim_common import optimize_generic  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.coupledLadders import COUPLEDLADDERS
from tpeps.sym.io import read_ipeps_abelian

parser = get_args_parser()
parser.add_argument("--alpha", type=float, default=0.0)
parser.add_argument("--bz_stag", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = COUPLEDLADDERS(alpha=args.alpha, bz_val=args.bz_stag,
                           dtype=cfg.global_args.jnp_dtype)
    if cfg.main.instate is None:
        raise ValueError("--instate is required (as in the reference example)")
    state = read_ipeps_abelian(cfg.main.instate).to_dense()
    if cfg.main.instate_noise:
        state = state.add_noise(cfg.main.instate_noise)

    e, *_ = optimize_generic(
        cfg, model.energy_2x1_1x2, dict(state.sites),
        vertexToSite=state.vertexToSite, lX=state.lX, lY=state.lY,
        obs_f=model.eval_obs,
    )
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptimLaddersU1ToDense(unittest.TestCase):
    """Short dense optimization from the noisy committed D=2 alpha=0.1
    state must drop below the noisy starting energy and stay below the
    unperturbed committed value minus tolerance."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "ABU1_BFGS100LS_D2-chi24-a0.1-run0-svd8_i2SUVBSn0_state.json")

    def test_opt_ladders_u1_d2_to_dense(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.alpha = 0.1
        args.chi = 16
        args.instate_noise = 0.05
        args.seed = 300
        args.opt_max_iter = 8
        args.out_prefix = "/tmp/RESULT_opt_ladders_u1_dense"
        args.CTMARGS_ctm_max_iter = 50
        e = main()
        assert e < -0.42, e
