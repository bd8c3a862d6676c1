"""Observables of a stored S=1 BLBQ-anisotropy iPEPS (counterpart of
reference examples/blbqS1/ctmrg_blbqS1_anisotropy.py).

    python examples/blbqS1/ctmrg_blbqS1_anisotropy.py --instate <state.json>
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
from tpeps.models.hb_anisotropy import COUPLEDCHAINS

parser = get_args_parser()
parser.add_argument("--j1_x", type=float, default=1.0)
parser.add_argument("--j1_y", type=float, default=1.0)
parser.add_argument("--k1_x", type=float, default=0.0)
parser.add_argument("--k1_y", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = COUPLEDCHAINS(
        phys_dim=3, j1_x=args.j1_x, j1_y=args.j1_y, k1_x=args.k1_x,
        k1_y=args.k1_y, dtype=cfg.global_args.jnp_dtype,
    )
    state = read_ipeps(cfg.main.instate)
    env = init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, _ = run(state, env, cfg.ctm)
    e = float(model.energy_2x1_1x2(state, env))
    print(f"FINAL {e}")
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgBLBQ(unittest.TestCase):
    def test_ctmrg_isotropic_limit_on_aklt(self):
        """Sanity anchor: the spin-1 AKLT-like committed states are not
        available; instead run on a random D=2 state and check the
        isotropic limit equals the HB model (tests/test_models.py:125)."""
        import jax

        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        import numpy as np

        from tpeps.config import CtmArgs
        from tpeps.ipeps.ipeps import IPEPS
        from tpeps.models.hb import HB

        rng = np.random.RandomState(0)
        A = jnp.asarray(rng.rand(3, 2, 2, 2, 2) - 0.5)
        st = IPEPS({(0, 0): A / jnp.linalg.norm(A)}, lX=1, lY=1)
        env = init_env(st, 12, "CTMRG")
        env, _ = run(st, env, CtmArgs(ctm_max_iter=40, ctm_conv_tol=1e-9))
        iso = HB(spin_s=3, j1=1.0, k1=0.2)
        ani = COUPLEDCHAINS(phys_dim=3, j1_x=1.0, j1_y=1.0, k1_x=0.2, k1_y=0.2)
        e_iso = float(iso.energy_2x1_1x2(st, env))
        e_ani = float(ani.energy_2x1_1x2(st, env))
        self.assertAlmostEqual(e_iso, e_ani, delta=1e-10)
