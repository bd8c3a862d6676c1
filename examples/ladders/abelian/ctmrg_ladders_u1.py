"""Observables of a stored U(1) coupled-ladders state through the
block-sparse abelian CTM (counterpart of reference
examples/ladders/abelian/ctmrg_ladders_u1.py):

    python examples/ladders/abelian/ctmrg_ladders_u1.py \\
        --instate <abelian_state.json> --alpha 0.1 --chi 32 [--top_n 2]

Prints energy + observables, the charge-resolved corner spectra and
(optionally) the leading transfer-operator spectrum evaluated
block-sparse per charge sector.
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
from tpeps.models.abelian.coupledLadders import COUPLEDLADDERS_ABELIAN
from tpeps.sym.io import read_ipeps_abelian

parser = get_args_parser()
parser.add_argument("--alpha", type=float, default=0.0,
                    help="inter-ladder coupling")
parser.add_argument("--bz_stag", type=float, default=0.0,
                    help="staggered field")
parser.add_argument("--top_n", type=int, default=0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = COUPLEDLADDERS_ABELIAN(alpha=args.alpha, bz_val=args.bz_stag)
    state = read_ipeps_abelian(cfg.main.instate)

    env = env_a.init_env(state, cfg.main.chi)
    env, hist = ctmrg_a.run(state, env, cfg.ctm)

    e = float(model.energy_2x1_1x2(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))

    for c_loc, c_ten in env.C.items():
        print(f"\nspectrum C[{c_loc}] (by charge sector)")
        for q, blk in sorted(c_ten.blocks.items()):
            s = np.linalg.svd(np.asarray(blk), compute_uv=False)
            for i, v in enumerate(s):
                print(f"{q} {i} {v}")

    if args.top_n > 0:
        from tpeps.ctm.generic_abelian.transferops import get_Top_spec

        l = np.asarray(get_Top_spec(args.top_n, (0, 0), (1, 0), state, env))
        print("\nspectrum(T)")
        for i in range(l.shape[0]):
            print(f"{i} {l[i, 0]} {l[i, 1]}")
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgLaddersU1(unittest.TestCase):
    """The committed U(1) D=3 alpha=0.1 state: the abelian pipeline must
    agree with the dense pipeline on the densified state to ~1e-8 (the
    same cross-check the reference runs between its np and torch yastn
    backends)."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "ABU1_BFGS100LS_D3-chi71-a0.1-run0-svd8_c12SUVBSn0_state.json")

    def test_ctmrg_ladders_u1_d3(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.alpha = 0.1
        args.chi = 24
        args.top_n = 0
        args.CTMARGS_ctm_max_iter = 100
        args.CTMARGS_ctm_conv_tol = 1e-9
        e = main()

        # dense cross-check on the densified state
        from tpeps.config import CtmArgs
        from tpeps.ctm.generic import ctmrg as ctmrg_d
        from tpeps.ctm.generic import env as env_d
        from tpeps.models.coupledLadders import COUPLEDLADDERS

        state = read_ipeps_abelian(args.instate)
        stD = state.to_dense()
        envD, _ = ctmrg_d.run(stD, env_d.init_env(stD, 24, "CTMRG"),
                              CtmArgs(ctm_max_iter=100, ctm_conv_tol=1e-9))
        eD = float(COUPLEDLADDERS(alpha=0.1).energy_2x1_1x2(stD, envD))
        assert abs(e - eD) < 1e-6, (e, eD)
