"""Observables of a stored J1-J2 iPEPS via generic CTMRG.

Counterpart of reference examples/j1j2/ctmrg_j1j2.py: load a state,
converge the environment, print energy + observables, correlation
functions and transfer-operator spectra.  The embedded TestCases
reproduce the reference CI's golden values (tolerance 1e-6).

    python examples/j1j2/ctmrg_j1j2.py --instate <state.json> \\
        --tiling 2SITE --chi 32 --j2 0.55 --GLOBALARGS_device cpu
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import tpeps  # noqa: F401
import jax.numpy as jnp

from tpeps.config import get_args_parser, configure
from tpeps.ctm.generic import transferops
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import read_ipeps
from tpeps.models import j1j2


def lattice_to_site_fn(tiling):
    """Tiling maps of reference examples/j1j2/ctmrg_j1j2.py:43-68."""
    if tiling == "BIPARTITE":
        def f(coord):
            vx = (coord[0] + abs(coord[0]) * 2) % 2
            vy = abs(coord[1])
            return ((vx + vy) % 2, 0)
    elif tiling == "1SITE":
        def f(coord):
            return (0, 0)
    elif tiling == "2SITE":
        def f(coord):
            return ((coord[0] + abs(coord[0]) * 2) % 2, 0)
    elif tiling == "4SITE":
        def f(coord):
            return ((coord[0] + abs(coord[0]) * 2) % 2, (coord[1] + abs(coord[1]) * 2) % 2)
    elif tiling == "8SITE":
        def f(coord):
            shift_x = coord[0] + 2 * (coord[1] // 2)
            return (shift_x % 4, coord[1] % 2)
    else:
        raise ValueError(f"Invalid tiling: {tiling}")
    return f


parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--j3", type=float, default=0.0)
parser.add_argument("--hz_stag", type=float, default=0.0)
parser.add_argument("--h_uni", nargs=3, type=float, default=[0, 0, 0])
parser.add_argument("--delta_zz", type=float, default=1.0)
parser.add_argument("--tiling", default="BIPARTITE")
parser.add_argument("--corrf_r", type=int, default=1, help="correlation function distance")
parser.add_argument("--top_n", type=int, default=2)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = j1j2.J1J2(
        j1=args.j1, j2=args.j2, j3=args.j3, hz_stag=args.hz_stag,
        h_uni=tuple(args.h_uni), delta_zz=args.delta_zz,
        dtype=cfg.global_args.jnp_dtype,
    )
    state = read_ipeps(cfg.main.instate, vertexToSite=lattice_to_site_fn(args.tiling))

    env = init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, history = run(state, env, cfg.ctm)

    if args.tiling in ("BIPARTITE", "2SITE", "4SITE", "8SITE"):
        energy_f = model.energy_2x2_2site
    else:
        energy_f = model.energy_2x2_1site_BP
    e = float(energy_f(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))

    if args.corrf_r > 1:
        sz = model.obs_ops["sz"]
        cf = jnp.asarray(
            __import__("tpeps.ctm.generic.corrf", fromlist=["corrf_1sO1sO"]).corrf_1sO1sO(
                (0, 0), (1, 0), state.sites, state.vertexToSite, env.C, env.T,
                sz, lambda r: sz, args.corrf_r,
            )
        )
        for i, v in enumerate(np.asarray(cf)):
            print(f"SZSZ r={i+1} {v}")
    if args.top_n > 0:
        l = transferops.get_Top_spec(args.top_n, (0, 0), (1, 0), state, env)
        for i in range(l.shape[0]):
            print(f"{i} {float(l[i,0])} {float(l[i,1])}")
    return e, obs_values, obs_labels


if __name__ == "__main__":
    if len(unknown_args) > 0:
        print("args not recognized: " + str(unknown_args))
        raise Exception("Unknown command line arguments")
    main()


class TestCtmrg_States(unittest.TestCase):
    """Golden regression vs reference CI values
    (reference examples/j1j2/ctmrg_j1j2.py:244-308)."""

    tol = 1.0e-6
    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def _run(self, tiling, params, statefile):
        import jax

        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(self.REF, "test-input", statefile)
        if not os.path.exists(f):
            self.skipTest("reference test-input not available")
        for k, v in params.items():
            setattr(args, k, v)
        args.tiling = tiling
        args.instate = f
        args.chi = 32
        args.top_n = 0
        args.corrf_r = 1
        return main()

    def test_bipartite_j3_huni(self):
        e, *_ = self._run(
            "BIPARTITE", {"j2": 0.0, "j3": 0.125, "h_uni": [3.9, 0, 0]},
            "BIPARTITE_j2_0_j3_1250_h_39000_D_3_chi_32_seed_100_state.json",
        )
        self.assertAlmostEqual(e, -1.3896897615463615, delta=self.tol)

    def test_2site_j2(self):
        e, *_ = self._run(
            "2SITE", {"j2": 0.55, "j3": 0.0, "h_uni": [0, 0, 0]},
            "gesdd-D2-chi50-j20.55-run0-iRND2x1_state.json",
        )
        self.assertAlmostEqual(e, -0.4434603770143078, delta=self.tol)
