"""Cross-consistency: measure a stored U(1) coupled-ladders state with
the DENSE engine after charge-basis densification (counterpart of
reference examples/ladders/abelian/ctmrg_ladders_u1_to_dense.py):

    python examples/ladders/abelian/ctmrg_ladders_u1_to_dense.py \\
        --instate <abelian_state.json> --alpha 0.1 --chi 32
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic import ctmrg as ctmrg_d
from tpeps.ctm.generic import env as env_d
from tpeps.models.coupledLadders import COUPLEDLADDERS, StaggeredLocalField
from tpeps.sym.io import read_ipeps_abelian

parser = get_args_parser()
parser.add_argument("--alpha", type=float, default=0.0)
parser.add_argument("--bz_stag", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = COUPLEDLADDERS(alpha=args.alpha, bz_val=args.bz_stag,
                           dtype=cfg.global_args.jnp_dtype)
    state = read_ipeps_abelian(cfg.main.instate).to_dense()

    env = env_d.init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, _ = ctmrg_d.run(state, env, cfg.ctm)
    e = float(model.energy_2x1_1x2(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgLaddersU1ToDense(unittest.TestCase):
    """Densified measurement agrees with the block-sparse measurement
    (ctmrg_ladders_u1.py) on the committed D=2 alpha=0.1 state."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "ABU1_BFGS100LS_D2-chi24-a0.1-run0-svd8_i2SUVBSn0_state.json")

    def test_ctmrg_ladders_u1_d2_to_dense(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.alpha = 0.1
        args.chi = 16
        args.CTMARGS_ctm_max_iter = 100
        args.CTMARGS_ctm_conv_tol = 1e-9
        e = main()

        from tpeps.config import CtmArgs
        from tpeps.ctm.generic_abelian import ctmrg as ctmrg_a
        from tpeps.ctm.generic_abelian import env as env_a
        from tpeps.models.abelian.coupledLadders import COUPLEDLADDERS_ABELIAN

        state = read_ipeps_abelian(args.instate)
        envA, _ = ctmrg_a.run(state, env_a.init_env(state, 16),
                              CtmArgs(ctm_max_iter=100, ctm_conv_tol=1e-9))
        eA = float(COUPLEDLADDERS_ABELIAN(alpha=0.1).energy_2x1_1x2(state, envA))
        assert abs(e - eA) < 1e-6, (e, eA)
