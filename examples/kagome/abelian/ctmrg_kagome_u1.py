"""Observables of a stored U(1) kagome iPESS through the abelian CTM
(counterpart of reference examples/kagome/abelian/
optim_kagome_spin_half_u1.py measurement path)."""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import numpy as np

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_a
from tpeps.ctm.generic_abelian import env as env_a
from tpeps.ipeps.ipess_kagome_abelian import read_ipess_kagome_abelian
from tpeps.models.abelian.kagome_u1 import KAGOME_U1

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = KAGOME_U1(j1=args.j1)
    state = read_ipess_kagome_abelian(cfg.main.instate)
    fused = state.fused()
    env = env_a.init_env(fused, cfg.main.chi)
    env, _ = ctmrg_a.run(fused, env, cfg.ctm)
    e = float(model.energy_per_site(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + list(obs_labels)))
    print(", ".join(["FINAL", str(e)] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrg_RVB_D3_U1(unittest.TestCase):
    """The committed U(1) RVB D=3 kagome state: the abelian pipeline
    must reproduce the dense pipeline exactly, and the energy matches
    the known kagome NN-RVB value."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"),
        "test-input", "abelian", "IPESS_KAGOME_RVB_D3_abelian-U1_state.json")

    def test_rvb_energy(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from tpeps.config import CtmArgs
        from tpeps.ctm.generic import ctmrg as ctmrg_d
        from tpeps.ctm.generic import env as env_d
        from tpeps.ipeps.ipeps_kagome import IPEPS_KAGOME
        from tpeps.models.spin_half_kagome import S_HALF_KAGOME

        if not os.path.isfile(self.STATE):
            raise unittest.SkipTest("reference test-input not available")
        state = read_ipess_kagome_abelian(self.STATE)
        fused = state.fused()
        cfg = CtmArgs(ctm_max_iter=120, ctm_conv_tol=1e-10)
        envA, _ = ctmrg_a.run(fused, env_a.init_env(fused, 27), cfg)
        eA = float(KAGOME_U1(j1=1.0).energy_per_site(state, envA))

        a7 = np.asarray(state.to_dense7()[(0, 0)])
        d, D = a7.shape[0], a7.shape[3]
        a5 = jnp.asarray(a7.reshape(d ** 3, D, D, D, D))
        stD = IPEPS_KAGOME({(0, 0): a5 / jnp.abs(a5).max()}, lX=1, lY=1)
        envD, _ = ctmrg_d.run(stD, env_d.init_env(stD, 27, "CTMRG"), cfg)
        eD = float(S_HALF_KAGOME(j1=1.0).energy_per_site(stD, envD))

        assert abs(eA - eD) < 1e-7, (eA, eD)
        # kagome NN-RVB (D=3) energy per site ~ -0.3931 (chi-converged);
        # regression value computed by this package at chi=27
        assert abs(eA - (-0.393124)) < 5e-3, eA
