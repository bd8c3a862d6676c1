"""Observables of stored coupled-ladder iPEPS (counterpart of reference
examples/ladders/ctmrg_ladders.py)."""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import read_ipeps
from tpeps.models.coupledLadders import COUPLEDLADDERS

parser = get_args_parser()
parser.add_argument("--alpha", type=float, default=0.0, help="inter-ladder coupling")
parser.add_argument("--bz_stag", type=float, default=0.0, help="staggered field")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = COUPLEDLADDERS(alpha=args.alpha, bz_val=args.bz_stag, dtype=cfg.global_args.jnp_dtype)
    state = read_ipeps(cfg.main.instate)
    env = init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, _ = run(state, env, cfg.ctm)
    e = float(model.energy_2x1_1x2(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestLadders(unittest.TestCase):
    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def test_vbs_dimer_energy(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(self.REF, "test-input", "VBS_2x2_ABCD.in")
        if not os.path.exists(f):
            self.skipTest("reference test-input not available")
        args.instate = f
        args.chi = 16
        args.alpha = 0.3
        e = main()
        self.assertAlmostEqual(e, -0.375, delta=1e-9)
