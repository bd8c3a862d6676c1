"""Ground-state optimization of the J-Q model with a 1-site C4v iPEPS.

Counterpart of reference examples/jq/optim_jq_c4v.py: the --c4v_type
flag selects the translationally-invariant (TI), sublattice-rotated
(BIPARTITE) or plaquette-merged (PLAQUETTE, phys_dim 2^4) ansatz.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.models import jq

from optim_common_c4v import initial_site_c4v, optimize_c4v

parser = get_args_parser()
parser.add_argument("--c4v_type", default="TI",
                    help="C4v ansatz: TI, BIPARTITE or PLAQUETTE")
parser.add_argument("--j1", type=float, default=0.0, help="nearest-neighbour coupling")
parser.add_argument("--q", type=float, default=1.0, help="plaquette interaction")
parser.add_argument("--q_inter", type=float, default=None,
                    help="inter-plaquette ring exchange (PLAQUETTE only)")
args, unknown_args = parser.parse_known_args()


def make_model(cfg):
    if args.c4v_type == "TI":
        return jq.JQ_C4V(j1=args.j1, q=args.q, dtype=cfg.global_args.jnp_dtype)
    if args.c4v_type == "BIPARTITE":
        return jq.JQ_C4V_BIPARTITE(j1=args.j1, q=args.q,
                                   dtype=cfg.global_args.jnp_dtype)
    if args.c4v_type == "PLAQUETTE":
        q_inter = args.q if args.q_inter is None else args.q_inter
        return jq.JQ_C4V_PLAQUETTE(j1=args.j1, q=args.q, q_inter=q_inter,
                                   dtype=cfg.global_args.jnp_dtype)
    raise ValueError(f"Unsupported C4v ansatz: {args.c4v_type}")


def main():
    cfg = configure(args)
    model = make_model(cfg)
    A0 = initial_site_c4v(cfg, model.phys_dim)
    e, *_ = optimize_c4v(cfg, model, model.energy_1x1, A0)
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOpt(unittest.TestCase):
    """Smoke tests of reference examples/jq/optim_jq_c4v.py:139-158."""

    def setUp(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.j1 = 0.0
        args.q = 1.0
        args.instate = None
        args.bond_dim = 2
        args.chi = 16
        args.opt_max_iter = 3
        args.seed = 7
        args.out_prefix = "/tmp/RESULT_jq_c4v_test"
        args.OPTARGS_line_search = "backtracking"
        args.CTMARGS_ctm_max_iter = 60

    def test_opt_SYMEIG_BIPARTITE(self):
        args.c4v_type = "BIPARTITE"
        e = main()
        # pure Q model: energy must drop below zero within a few epochs
        self.assertLess(e, 0.0)

    def test_opt_PLAQUETTE(self):
        args.c4v_type = "PLAQUETTE"
        e = main()
        self.assertLess(e, 0.0)
