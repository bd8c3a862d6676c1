"""Observables of a stored U(1) C4v iPEPS via the native C4v abelian CTMRG.

Counterpart of reference examples/j1j2/abelian/ctmrg_j1j2_c4v_u1.py:
load a 1-site C4v block-sparse U(1) state, converge the single-(C,T)
abelian environment, print energy + observables.  The embedded TestCase
reproduces the reference CI golden (energy/site -0.6283009062904991,
reference ctmrg_j1j2_c4v_u1.py:195).

    python examples/j1j2/abelian/ctmrg_j1j2_c4v_u1.py \\
        --instate <abelian_c4v_state.json> --chi 36 --j2 0.1
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "..")))

import tpeps  # noqa: F401

from tpeps.config import configure, get_args_parser
from tpeps.ctm.c4v_abelian import ctmrg as ctmrg_c4v
from tpeps.ctm.c4v_abelian import env as env_c4v
from tpeps.models.abelian.j1j2 import J1J2_ABELIAN
from tpeps.sym.io import read_ipeps_abelian

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = J1J2_ABELIAN(j1=args.j1, j2=args.j2, dtype=cfg.global_args.jnp_dtype)
    state = read_ipeps_abelian(cfg.main.instate)
    print(state)

    env = env_c4v.init_env(state, cfg.main.chi)
    env, history = ctmrg_c4v.run(state, env, cfg.ctm)

    state_bp, env_g = env_c4v.as_generic(state, env)
    e = float(model.energy_per_site(state_bp, env_g))
    obs_values, obs_labels = model.eval_obs(state_bp, env_g)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e, obs_values, obs_labels


if __name__ == "__main__":
    if len(unknown_args) > 0:
        print("args not recognized: " + str(unknown_args))
        raise Exception("Unknown command line arguments")
    main()


class TestCtmrgC4vU1(unittest.TestCase):
    """Golden regression vs reference CI (ctmrg_j1j2_c4v_u1.py:150-205)."""

    tol = 1.0e-6
    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def test_ctmrg_j1j2_c4v_u1_d4(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(
            self.REF,
            "test-input/abelian/c4v/BFGS100LS_U1B_D4-chi97-j20.0-run0-iU1BD4j20chi97n0_blocks_1site_state.json",
        )
        if not os.path.exists(f):
            self.skipTest("reference test-input not available")
        args.instate = f
        args.chi = 36
        args.j1, args.j2 = 1.0, 0.1
        e, obs, labels = main()
        self.assertAlmostEqual(e, -0.6283009062904991, delta=self.tol)
        od = dict(zip(labels, obs))
        self.assertAlmostEqual(od["m(0, 0)"], 0.3359288237708855, delta=self.tol)
        self.assertAlmostEqual(
            od["SS2x1(0, 0)"], -0.33448352974913287, delta=self.tol
        )
