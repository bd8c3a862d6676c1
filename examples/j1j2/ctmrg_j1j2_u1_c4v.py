"""Observables of a U(1)-classified linear-combination C4v iPEPS.

Counterpart of reference examples/j1j2/ctmrg_j1j2_u1_c4v.py: evaluate a
J1-J2 state given as coefficients over a U(1)-filtered C4v-A_1
elementary-tensor basis (--instate in the LC JSON format, or random
coefficients over the programmatically generated basis).
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

import tpeps  # noqa: F401
import jax.numpy as jnp

from tpeps.config import configure, get_args_parser
from tpeps.ipeps.ipeps_lc import IPEPS_LC_1SITE_PG, read_ipeps_lc_1site_pg
from tpeps.models import j1j2
from tpeps.u1sym.basis import generate_a_basis

from optim_common_c4v import converge_c4v

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--u1_charges", type=str, default=None,
                    help="comma-separated d+D charges, e.g. '1,-1,0,2,0'")
parser.add_argument("--u1_total_charge", type=int, default=1)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    D = cfg.main.bond_dim
    model = j1j2.J1J2_C4V_BIPARTITE(j1=args.j1, j2=args.j2,
                                    dtype=cfg.global_args.jnp_dtype)

    if cfg.main.instate is not None:
        state = read_ipeps_lc_1site_pg(cfg.main.instate)
    else:
        if args.u1_charges is not None:
            charges = tuple(int(x) for x in args.u1_charges.split(","))
        elif D == 3:
            charges = (1, -1, 0, 2, 0)  # the reference's D3_U1_B class
        else:
            charges = None
        basis = generate_a_basis(
            2, D, u1_charges=charges,
            u1_total_charge=args.u1_total_charge if charges else 0)
        elem = [({"meta": {"pg": "A_1"}}, t.astype(cfg.global_args.jnp_dtype))
                for t in basis]
        rng = np.random.RandomState(cfg.main.seed)
        state = IPEPS_LC_1SITE_PG(
            elem, {(0, 0): jnp.asarray(rng.rand(len(elem)) - 0.5)})

    a = state.site((0, 0))
    a = a / jnp.linalg.norm(a)
    env = converge_c4v(cfg, a)
    e = float(model.energy_1x1_lowmem(a, env))
    obs_values, obs_labels = model.eval_obs(a, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrg(unittest.TestCase):
    """Smoke (reference examples/j1j2/ctmrg_j1j2_u1_c4v.py TestCtmrg)."""

    def setUp(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.instate = None
        args.j2 = 0.0
        args.bond_dim = 3
        args.chi = 16
        args.seed = 21
        args.CTMARGS_ctm_max_iter = 60

    def test_ctmrg_SYMEIG(self):
        e = main()
        self.assertTrue(abs(e) < 10.0)
