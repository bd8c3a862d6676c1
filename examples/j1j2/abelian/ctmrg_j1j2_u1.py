"""Observables of a stored U(1)-symmetric J1-J2 iPEPS via abelian CTMRG.

Counterpart of reference examples/j1j2/abelian/ctmrg_j1j2_u1.py: load a
block-sparse U(1) state, converge the abelian block-sparse environment,
print energy + observables.  The embedded TestCase reproduces the
reference CI golden (energy/site -0.6645979511667757,
reference ctmrg_j1j2_u1.py:218).

    python examples/j1j2/abelian/ctmrg_j1j2_u1.py \\
        --instate <abelian_state.json> --chi 32 --GLOBALARGS_device cpu
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "..")))

import tpeps  # noqa: F401

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic_abelian.ctmrg import run
from tpeps.ctm.generic_abelian.env import init_env
from tpeps.models.abelian.j1j2 import J1J2_ABELIAN
from tpeps.sym.io import read_ipeps_abelian


def lattice_to_site_fn(tiling):
    """Tiling maps (reference examples/j1j2/abelian/ctmrg_j1j2_u1.py:56-80)."""
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


parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--tiling", default="BIPARTITE")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = J1J2_ABELIAN(j1=args.j1, j2=args.j2, dtype=cfg.global_args.jnp_dtype)
    state = read_ipeps_abelian(
        cfg.main.instate, vertexToSite=lattice_to_site_fn(args.tiling)
    )
    print(state)

    env = init_env(state, cfg.main.chi)
    env, history = run(state, env, cfg.ctm)

    e = float(model.energy_per_site(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e, obs_values, obs_labels


if __name__ == "__main__":
    if len(unknown_args) > 0:
        print("args not recognized: " + str(unknown_args))
        raise Exception("Unknown command line arguments")
    main()


class TestCtmrgU1(unittest.TestCase):
    """Golden regression vs reference CI (ctmrg_j1j2_u1.py:183-225)."""

    tol = 1.0e-6
    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def test_ctmrg_j1j2_u1_bipartite(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(
            self.REF,
            "test-input/abelian/c4v/BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_blocks_2site_state.json",
        )
        if not os.path.exists(f):
            self.skipTest("reference test-input not available")
        args.instate = f
        args.tiling = "BIPARTITE"
        args.chi = 32
        args.j1, args.j2 = 1.0, 0.0
        e, obs, labels = main()
        self.assertAlmostEqual(e, -0.6645979511667757, delta=self.tol)
        od = dict(zip(labels, obs))
        for c in ((0, 0), (1, 0)):
            self.assertAlmostEqual(od[f"m{c}"], 0.3713621967866411, delta=self.tol)
            self.assertAlmostEqual(
                od[f"SS2x1{c}"], -0.33229727696449596, delta=self.tol
            )
            self.assertAlmostEqual(
                od[f"SS1x2{c}"], -0.3322972769393827, delta=self.tol
            )
