"""Observables of a stored transverse-field Ising iPEPS
(counterpart of reference examples/ising/ctmrg_ising.py).

    python examples/ising/ctmrg_ising.py --instate <state.json> --hx 3.0
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import read_ipeps
from tpeps.models.ising import ISING

parser = get_args_parser()
parser.add_argument("--hx", type=float, default=0.0)
parser.add_argument("--q", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = ISING(hx=args.hx, q=args.q, dtype=cfg.global_args.jnp_dtype)
    state = read_ipeps(cfg.main.instate)
    env = init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, _ = run(state, env, cfg.ctm)
    e = float(model.energy_1x1(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgIsing(unittest.TestCase):
    def test_ctmrg_product_states(self):
        """Exact anchor: the spin-up product state at hx=0 has
        e = -2 (two sigma-z sigma-z bonds per site)."""
        import jax

        jax.config.update("jax_platforms", "cpu")
        REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")
        f = os.path.join(REF, "test-input", "spin-up_1x1.in")
        if not os.path.exists(f):
            self.skipTest("reference test-input not available")
        args.instate = f
        args.chi = 8
        args.hx = 0.0
        e = main()
        # ferromagnetic product state, sigma-z convention: 2 bonds/site
        # each contributing -<sz sz> = -1
        self.assertAlmostEqual(e, -2.0, delta=1e-8)
