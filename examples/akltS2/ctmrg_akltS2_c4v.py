"""Observables of a stored/random S=2 AKLT C4v iPEPS via C4v CTMRG.

Counterpart of reference examples/akltS2/ctmrg_akltS2_c4v.py: on the
exact AKLT input state (test-input/AKLT-S2_1x1.in) the projector
Hamiltonian gives E = 0 and all magnetizations vanish.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.models.akltS2 import AKLTS2_C4V_BIPARTITE

from optim_common_c4v import ctmrg_c4v, initial_site_c4v

parser = get_args_parser()
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = AKLTS2_C4V_BIPARTITE(dtype=cfg.global_args.jnp_dtype)
    A0 = initial_site_c4v(cfg, model.phys_dim)
    return ctmrg_c4v(cfg, model, model.energy_1x1, A0)


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrg(unittest.TestCase):
    """Smoke test of reference examples/akltS2/ctmrg_akltS2_c4v.py:25-41."""

    def setUp(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.instate = None
        args.bond_dim = 2
        args.chi = 16
        args.seed = 4
        args.CTMARGS_ctm_max_iter = 60

    def test_ctmrg_SYMEIG(self):
        e, *_ = main()
        self.assertTrue(abs(e) < 20.0)


class TestAKLT(unittest.TestCase):
    """Golden: the exact AKLT state has E = 0 (reference
    examples/akltS2/ctmrg_akltS2_c4v.py:183-201)."""

    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def test_ctmrg_AKLT(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(self.REF, "test-input", "AKLT-S2_1x1.in")
        if not os.path.exists(f):
            self.skipTest("reference test-input not available")
        args.instate = f
        args.instate_noise = 0.0
        args.bond_dim = 2
        args.chi = 32
        args.CTMARGS_ctm_max_iter = 400
        args.CTMARGS_ctm_conv_tol = 1e-14
        e, a, env, obs_values, obs_labels = main()
        eps = 1.0e-13  # reference gates at 1e-14; allow accumulation slack
        self.assertLess(abs(e), eps)
        obs = dict(zip(obs_labels, obs_values))
        self.assertLess(abs(obs["m"]), eps)
