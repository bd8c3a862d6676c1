"""Cross-consistency: measure a stored U(1) bipartite J1-J2 state with
the DENSE engine after charge-basis densification (counterpart of
reference examples/j1j2/abelian/ctmrg_j1j2_u1_to_dense.py):

    python examples/j1j2/abelian/ctmrg_j1j2_u1_to_dense.py \\
        --instate <abelian_2site_state.json> --chi 32
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic import ctmrg as ctmrg_d
from tpeps.ctm.generic import env as env_d
from tpeps.models import j1j2
from tpeps.sym.io import read_ipeps_abelian

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def bipartite(coord):
    vx = (coord[0] + abs(coord[0]) * 2) % 2
    vy = abs(coord[1])
    return ((vx + vy) % 2, 0)


def main():
    cfg = configure(args)
    model = j1j2.J1J2(j1=args.j1, j2=args.j2,
                      dtype=cfg.global_args.jnp_dtype)
    state = read_ipeps_abelian(cfg.main.instate,
                               vertexToSite=bipartite).to_dense()
    env = env_d.init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, _ = ctmrg_d.run(state, env, cfg.ctm)
    e = float(model.energy_2x2_2site(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgJ1J2U1ToDense(unittest.TestCase):
    """Densified measurement of the committed U(1) D=3 2-site state
    must reproduce the reference golden -0.6645979511667757
    (reference ctmrg_j1j2_u1.py:218)."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "c4v",
        "BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_blocks_2site_state.json")

    def test_ctmrg_u1_d3_to_dense(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.chi = 32
        args.j1, args.j2 = 1.0, 0.0
        args.CTMARGS_ctm_max_iter = 120
        args.CTMARGS_ctm_conv_tol = 1e-10
        e = main()
        self.assertAlmostEqual(e, -0.6645979511667757, delta=5e-6)
