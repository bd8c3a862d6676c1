"""Observables of a J1-J2-lambda (chiral plaquette) C4v iPEPS.

Counterpart of reference examples/j1j2/ctmrg_j1j2lambda_c4v.py: complex
one-site C4v ansatz with the i*lambda*(P - P^-1) plaquette term; at
lmbd=0 the RVB golden of ctmrg_j1j2_c4v.py must be reproduced in
complex arithmetic.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.ctm.c4v import transferops as transferops_c4v
from tpeps.models.j1j2lambda import J1J2LAMBDA_C4V_BIPARTITE

from optim_common_c4v import ctmrg_c4v, initial_site_c4v

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--j3", type=float, default=0.0)
parser.add_argument("--lmbd", type=float, default=0.0,
                    help="chiral plaquette interaction")
parser.add_argument("--hz_stag", type=float, default=0.0)
parser.add_argument("--delta_zz", type=float, default=1.0)
parser.add_argument("--top_n", type=int, default=0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = J1J2LAMBDA_C4V_BIPARTITE(
        j1=args.j1, j2=args.j2, j3=args.j3, lmbd=args.lmbd,
        hz_stag=args.hz_stag, delta_zz=args.delta_zz,
        dtype=cfg.global_args.jnp_dtype,
    )
    A0 = initial_site_c4v(cfg, model.phys_dim)
    e, a, env, obs_values, obs_labels = ctmrg_c4v(cfg, model, model.energy_1x1, A0)
    if args.top_n > 0:
        l = transferops_c4v.get_Top_spec_c4v(args.top_n, a, env)
        for i in range(l.shape[0]):
            print(f"{i} {float(l[i, 0])} {float(l[i, 1])}")
    return e, obs_values, obs_labels


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgBase(unittest.TestCase):
    """Smoke (reference examples/j1j2/ctmrg_j1j2lambda_c4v.py:280-299)."""

    def setUp(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.instate = None
        args.j2 = 0.0
        args.lmbd = 0.5
        args.bond_dim = 2
        args.chi = 16
        args.seed = 13
        args.top_n = 0
        args.GLOBALARGS_dtype = "complex128"
        args.CTMARGS_ctm_max_iter = 60

    def test_ctmrg_SYMEIG(self):
        e, *_ = main()
        self.assertTrue(abs(e) < 10.0)


class TestCtmrgStates(unittest.TestCase):
    """RVB golden at lmbd=0 in complex arithmetic
    (reference examples/j1j2/ctmrg_j1j2lambda_c4v.py:301-343)."""

    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def test_ctmrg_RVB(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(self.REF, "test-input", "RVB_1x1.in")
        if not os.path.exists(f):
            self.skipTest("reference test-input not available")
        args.instate = f
        args.instate_noise = 0.0
        args.j2 = 0.5
        args.lmbd = 0.0
        args.bond_dim = 3
        args.chi = 16
        args.top_n = 0
        args.GLOBALARGS_dtype = "complex128"
        args.CTMARGS_ctm_max_iter = 200
        args.CTMARGS_ctm_conv_tol = 1e-12
        e, obs_values, obs_labels = main()
        obs = dict(zip(obs_labels, obs_values))
        self.assertLess(abs(e - (-0.47684229)), 1.0e-8)
        self.assertLess(abs(obs["m"]), 1.0e-8)
