"""Optimize a U(1) triangular J1-J2-J4 state with the DENSE engine
after densification (counterpart of reference
examples/triangular/abelian/optim_j1j2j4_u1_to_dense.py):

    python examples/triangular/abelian/optim_j1j2j4_u1_to_dense.py \\
        --instate <abelian_2site_state.json> --chi 24
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

import tpeps  # noqa: F401

from optim_common import optimize_generic  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models.spin_triangular import J1J2J4
from tpeps.sym.io import read_ipeps_abelian

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--j4", type=float, default=0.0)
parser.add_argument("--diag", type=float, default=1.0)
args, unknown_args = parser.parse_known_args()


def bipartite(coord):
    vx = (coord[0] + abs(coord[0]) * 2) % 2
    vy = abs(coord[1])
    return ((vx + vy) % 2, 0)


def main():
    cfg = configure(args)
    if cfg.main.instate is None:
        raise ValueError("--instate is required (as in the reference example)")
    state = read_ipeps_abelian(cfg.main.instate, vertexToSite=bipartite).to_dense()
    model = J1J2J4(j1=args.j1, j2=args.j2, j4=args.j4, diag=args.diag,
                   dtype=state.site((0, 0)).dtype)
    e, *_ = optimize_generic(
        cfg, model.energy_per_site, dict(state.sites),
        vertexToSite=bipartite, lX=state.lX, lY=state.lY,
        obs_f=model.eval_obs,
    )
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptimTrglU1ToDense(unittest.TestCase):
    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "c4v",
        "BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_blocks_2site_state.json")

    def test_opt_trgl_u1_d3_to_dense(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.chi = 16
        args.j1, args.j2 = 1.0, 0.0
        args.opt_max_iter = 4
        args.out_prefix = "/tmp/RESULT_opt_trgl_u1_dense"
        args.CTMARGS_ctm_max_iter = 50
        e = main()
        # triangular energy of the (square-optimized) start is ~-0.25;
        # a few steps must already improve beyond it
        assert e < -0.3, e
