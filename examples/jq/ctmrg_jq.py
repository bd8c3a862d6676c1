"""Observables of a stored J-Q model iPEPS via generic CTMRG
(counterpart of reference examples/jq/ctmrg_jq.py).

    python examples/jq/ctmrg_jq.py --instate <state.json> --j1 1 --q 0.5
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
from tpeps.models.jq import JQ

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--q", type=float, default=0.0)
parser.add_argument("--tiling", default="BIPARTITE")
args, unknown_args = parser.parse_known_args()


def lattice_to_site_fn(tiling):
    if tiling == "BIPARTITE":
        def f(coord):
            vx = (coord[0] + abs(coord[0]) * 2) % 2
            vy = abs(coord[1])
            return ((vx + vy) % 2, 0)
    elif tiling == "2SITE":
        def f(coord):
            return ((coord[0] + abs(coord[0]) * 2) % 2, 0)
    elif tiling == "4SITE":
        def f(coord):
            return ((coord[0] + abs(coord[0]) * 2) % 2, (coord[1] + abs(coord[1]) * 2) % 2)
    else:
        raise ValueError(f"Invalid tiling: {tiling}")
    return f


def main():
    cfg = configure(args)
    model = JQ(j1=args.j1, q=args.q, dtype=cfg.global_args.jnp_dtype)
    state = read_ipeps(cfg.main.instate, vertexToSite=lattice_to_site_fn(args.tiling))
    env = init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, _ = run(state, env, cfg.ctm)
    e = float(model.energy_2x2_4site(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgJQ(unittest.TestCase):
    """Smoke on a committed spin-1/2 state (reference jq/ctmrg_jq.py:132
    pattern); at q=0 the J-Q energy must equal the pure-Heisenberg one."""

    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def test_ctmrg_jq_heisenberg_limit(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(
            self.REF, "test-input", "gesdd-D2-chi50-j20.55-run0-iRND2x1_state.json"
        )
        if not os.path.exists(f):
            self.skipTest("no committed D=2 state available")
        args.instate = f
        args.chi = 16
        args.j1, args.q = 1.0, 0.0
        args.tiling = "2SITE"
        e = main()
        self.assertTrue(e < 0.0)
