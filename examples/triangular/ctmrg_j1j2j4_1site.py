"""Observables of stored 1-site triangular-lattice states — plain
1SITE, spiral 1SITEQ (pitch vector q) and the split-trivalent 1STRIV
ansatz (counterpart of reference
examples/triangular/ctmrg_j1j2j4_1site.py):

    python examples/triangular/ctmrg_j1j2j4_1site.py --instate <state.json> \\
        --tiling 1SITEQ --q 3.0 --diag 0.9 --chi 49 \\
        [--sequence_chi 16 32 49] [--corrf_r 10] [--top_n 4]

``--sequence_chi`` re-converges the environment through an increasing
chi schedule (cheap warm starts for the expensive final chi).
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401
import numpy as np

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic import corrf as corrf_g
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ctm.generic.transferops import get_Top_spec
from tpeps.groups import su2
from tpeps.ipeps.ipeps import read_ipeps
from tpeps.ipeps.ipeps_1s_q import IPEPS_1S_Q, read_ipeps_1s_q
from tpeps.ipeps.ipeps_trgl_pg import read_ipeps_trgl_1s_pg
from tpeps.models import spin_triangular

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--j4", type=float, default=0.0, help="ring exchange")
parser.add_argument("--jchi", type=float, default=0.0, help="scalar chirality")
parser.add_argument("--diag", type=float, default=1.0, help="diagonal-bond strength")
parser.add_argument("--q", type=float, default=1.0, help="pitch vector (1SITEQ)")
parser.add_argument("--tiling", default="1SITE",
                    choices=["1SITE", "1SITEQ", "1STRIV"])
parser.add_argument("--sequence_chi", type=int, nargs="+", default=[],
                    help="increasing chi schedule ending at --chi")
parser.add_argument("--corrf_r", type=int, default=0)
parser.add_argument("--top_n", type=int, default=0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    dt = cfg.global_args.jnp_dtype
    if args.tiling == "1SITE":
        model = spin_triangular.J1J2J4_1SITE(
            j1=args.j1, j2=args.j2, j4=args.j4, jchi=args.jchi, dtype=dt)
        state = read_ipeps(cfg.main.instate)
    elif args.tiling == "1SITEQ":
        model = spin_triangular.J1J2J4_1SITEQ(
            j1=args.j1, j2=args.j2, j4=args.j4, jchi=args.jchi,
            diag=args.diag, dtype=dt)
        state = read_ipeps_1s_q(cfg.main.instate,
                                q=(1.0 / args.q, 1.0 / args.q))
    else:  # 1STRIV
        model = spin_triangular.J1J2J4_1SITE(
            j1=args.j1, j2=args.j2, j4=args.j4, jchi=args.jchi, dtype=dt)
        state = read_ipeps_trgl_1s_pg(cfg.main.instate)
    if state.site((0, 0)).dtype != dt:
        extra = {"diag": args.diag} if args.tiling == "1SITEQ" else {}
        model = type(model)(j1=args.j1, j2=args.j2, j4=args.j4,
                            jchi=args.jchi, dtype=state.site((0, 0)).dtype,
                            **extra)

    chis = list(args.sequence_chi) + [cfg.main.chi]
    env = init_env(state, chis[0], cfg.ctm.ctm_env_init_type)
    for chi in chis:
        if chi != env.chi:
            env = init_env(state, chi, "CTMRG")  # fresh at the larger chi
        env, hist = run(state, env, cfg.ctm)
        e = float(model.energy_per_site(state, env))
        print(f"chi={chi} energy={e}")

    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))

    if args.corrf_r > 0:
        S = su2.SU2(2, dtype=state.site((0, 0)).dtype)
        sz = S.SZ()
        szsz = corrf_g.corrf_1sO1sO(
            (0, 0), (1, 0), dict(state.sites), state.vertexToSite,
            env.C, env.T, sz, lambda r: sz, args.corrf_r)
        print("\nSS r szsz")
        for i in range(args.corrf_r):
            print(f"{i} {float(szsz[i].real)}")

    if args.top_n > 0:
        l = np.asarray(get_Top_spec(args.top_n, (0, 0), (1, 0), state, env))
        print("\nspectrum(T)")
        for i in range(l.shape[0]):
            print(f"{i} {l[i, 0]} {l[i, 1]}")
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrg_TRGL_1SITE(unittest.TestCase):
    """1-site spiral goldens (reference examples/triangular/
    ctmrg_j1j2j4_1site.py:337-365): tolerances follow the reference's
    own test (1e-4 for 1SITE, 1e-6 for 1SITEQ)."""

    REF_PATH = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def setUp(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isdir(os.path.join(self.REF_PATH, "test-input")):
            self.skipTest("reference test-input not available")
        args.sequence_chi = []
        args.corrf_r = 0
        args.top_n = 0

    def test_1site_j2(self):
        args.tiling = "1SITE"
        args.instate = os.path.join(
            self.REF_PATH, "test-input",
            "trglC_j20.1_j40_D3ch27_r0_LS_1SITE_iD3n_C4X4cS_ptol8_state.json")
        args.j1, args.j2, args.j4, args.diag = 1.0, 0.1, 0.0, 1.0
        args.chi = 27
        args.CTMARGS_ctm_max_iter = 300
        args.CTMARGS_ctm_conv_tol = 1e-10
        e = main()
        self.assertAlmostEqual(e, -0.5076644938218757, delta=1e-4)

    def test_1siteq_diag(self):
        args.tiling = "1SITEQ"
        args.instate = os.path.join(
            self.REF_PATH, "test-input",
            "trgl_diag0.9_q3.0_D3ch49_r2_LS_1SITEQ_c1RND_C4X4cS_ptol12_state.json")
        args.j1, args.j2, args.j4, args.diag = 1.0, 0.0, 0.0, 0.9
        args.q = 3.0
        args.chi = 49
        args.sequence_chi = [16]
        args.corrf_r = 2
        args.top_n = 2
        args.CTMARGS_ctm_max_iter = 300
        args.CTMARGS_ctm_conv_tol = 1e-10
        e = main()
        self.assertAlmostEqual(e, -0.5333282148759652, delta=1e-6)
