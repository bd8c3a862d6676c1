"""Coarse-grained maple-leaf Heisenberg — ground-state optimization
(counterpart of reference examples/maple_leaf/optim_maple_leaf.py).

Six spin-1/2's per effective triangular-lattice site (d = 64); bond
Hamiltonians evaluated through compact MPOs threaded into the double
layer (no open d^2 RDMs).

    python examples/maple_leaf/optim_maple_leaf.py --bond_dim 2 --chi 8
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from optim_common import optimize_generic  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.maple_leaf import MAPLE_LEAF, mf_product_state

parser = get_args_parser()
parser.add_argument("--Jd", type=float, default=1.0, help="dimer coupling")
parser.add_argument("--Jh", type=float, default=1.0, help="hexagon coupling")
parser.add_argument("--Jt", type=float, default=1.0, help="triangle coupling")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = MAPLE_LEAF(Jd=args.Jd, Jh=args.Jh, Jt=args.Jt)
    state0 = mf_product_state(
        noise=args.instate_noise if args.instate_noise else 0.1,
        bond_dim=args.bond_dim,
        seed=args.seed,
    )
    e, *_ = optimize_generic(
        cfg, lambda st, env: model.energy_1site(st, env),
        dict(state0.sites), lX=1, lY=1,
    )
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestMapleLeafMF(unittest.TestCase):
    def test_mf_product_energy_exact(self):
        """D=1 Neel product state: the full CTM + MPO evaluation must
        reproduce the exactly computable product-state energy."""
        import jax

        jax.config.update("jax_platforms", "cpu")
        import numpy as np

        from tpeps.config import CtmArgs
        from tpeps.ctm.generic import ctmrg
        from tpeps.ctm.generic.env import init_env
        from tpeps.models.maple_leaf import build_h_eff

        model = MAPLE_LEAF()
        state = mf_product_state(noise=0.0, bond_dim=1)
        env = init_env(state, 4)
        env, *_ = ctmrg.run(state, env, CtmArgs(ctm_max_iter=4, ctm_conv_tol=1e-12))
        e = float(model.energy_1site(state, env))

        # exact product-state expectation of the three rotated gates
        h, u = build_h_eff()
        v = np.array([1.0])
        for i in range(6):
            v = np.kron(v, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0])
        vr = u @ v  # rotated second site
        vv = np.kron(v, vr)
        e_exact = sum(float(vv @ hk @ vv) for hk in h)
        self.assertAlmostEqual(e, e_exact, places=10)


class TestOptMapleLeaf(unittest.TestCase):
    def test_small_opt_improves_mf(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.bond_dim = 2
        args.chi = 6
        args.opt_max_iter = 2
        args.instate_noise = 0.05
        args.seed = 3
        args.out_prefix = "/tmp/RESULT_maple_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 12
        args.CTMARGS_ctm_conv_tol = 1e-8
        args.CTMARGS_grad_tail_iter = 4
        e = main()
        # Neel MF reference energy is ~ -1.125 (3 x -0.375); optimization
        # from a noised MF start must not be (much) worse
        self.assertLess(e, -0.8)
