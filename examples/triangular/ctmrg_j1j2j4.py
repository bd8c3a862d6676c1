"""Observables of a stored triangular-lattice iPEPS (counterpart of
reference examples/triangular/ctmrg_j1j2j4.py)."""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import read_ipeps
from tpeps.models import spin_triangular

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--j4", type=float, default=0.0, help="ring exchange")
parser.add_argument("--jchi", type=float, default=0.0, help="scalar chirality")
parser.add_argument("--diag", type=float, default=1.0, help="diagonal-bond strength")
parser.add_argument("--tiling", default="1SITE")
args, unknown_args = parser.parse_known_args()


def lattice_to_site_fn(tiling):
    """Triangular tilings (reference examples/triangular/ctmrg_j1j2j4.py:51-82)."""
    if tiling in ("1SITE", "1SITE_NOROT"):
        return None
    if tiling == "2SITE":
        return lambda c: (c[0] % 2, 0)
    if tiling == "3SITE":
        return lambda c: ((c[0] % 3 - c[1]) % 3, 0)
    if tiling == "4SITE":
        return lambda c: (c[0] % 2, (c[1] + ((c[0] % 4) // 2)) % 2)
    if tiling == "4SITE_T":
        return lambda c: (c[0] % 2, c[1] % 2)
    raise ValueError(f"Invalid tiling: {tiling}")


def main():
    cfg = configure(args)
    if args.tiling in ("1SITE",):
        model = spin_triangular.J1J2J4_1SITE(
            j1=args.j1, j2=args.j2, j4=args.j4, jchi=args.jchi,
            dtype=cfg.global_args.jnp_dtype,
        )
    else:
        model = spin_triangular.J1J2J4(
            j1=args.j1, j2=args.j2, j4=args.j4, jchi=args.jchi, diag=args.diag,
            dtype=cfg.global_args.jnp_dtype,
        )
    state = read_ipeps(cfg.main.instate, vertexToSite=lattice_to_site_fn(args.tiling))
    env = init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, _ = run(state, env, cfg.ctm)
    e = float(model.energy_per_site(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrg_TRGL(unittest.TestCase):
    """Golden from reference CI (examples/triangular/ctmrg_j1j2j4.py:232-246)."""

    tol = 1.0e-6
    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def test_4site_j4(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(self.REF, "test-input",
                         "trgl_j20_j40.2_D2ch18_r0_4SITE_iD1j408n_state.json")
        if not os.path.exists(f):
            self.skipTest("reference test-input not available")
        args.instate = f
        args.tiling = "4SITE"
        args.chi = 18
        args.j2, args.j4 = 0.0, 0.2
        args.CTMARGS_ctm_max_iter = 200
        e = main()
        self.assertAlmostEqual(e, -0.4285699726740929, delta=self.tol)


class TestCtmrg_TRGL_1SITE(unittest.TestCase):
    """1-site spiral goldens (reference examples/triangular/
    ctmrg_j1j2j4_1site.py:337-365): tolerances follow the reference's own
    test (1e-4 for 1SITE, 1e-6 for 1SITEQ)."""

    REF_PATH = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def setUp(self):
        import jax
        jax.config.update("jax_platforms", "cpu")
        if not os.path.isdir(os.path.join(self.REF_PATH, "test-input")):
            self.skipTest("reference test-input not available")

    def test_1site_j2(self):
        from tpeps.models.spin_triangular import J1J2J4_1SITE
        from tpeps.config import CtmArgs
        state = read_ipeps(os.path.join(
            self.REF_PATH, "test-input",
            "trglC_j20.1_j40_D3ch27_r0_LS_1SITE_iD3n_C4X4cS_ptol8_state.json"))
        env = init_env(state, 27, "CTMRG")
        env, _ = run(state, env, CtmArgs(ctm_max_iter=300, ctm_conv_tol=1e-10))
        m = J1J2J4_1SITE(j1=1.0, j2=0.1, dtype=state.site((0, 0)).dtype)
        e = float(m.energy_per_site(state, env))
        self.assertAlmostEqual(e, -0.5076644938218757, delta=1e-4)

    def test_1siteq_diag(self):
        from tpeps.ipeps.ipeps_1s_q import read_ipeps_1s_q
        from tpeps.models.spin_triangular import J1J2J4_1SITEQ
        from tpeps.config import CtmArgs
        state = read_ipeps_1s_q(os.path.join(
            self.REF_PATH, "test-input",
            "trgl_diag0.9_q3.0_D3ch49_r2_LS_1SITEQ_c1RND_C4X4cS_ptol12_state.json"))
        env = init_env(state, 49, "CTMRG")
        env, _ = run(state, env, CtmArgs(ctm_max_iter=300, ctm_conv_tol=1e-10))
        m = J1J2J4_1SITEQ(j1=1.0, j2=0.0, j4=0.0, diag=0.9,
                          dtype=state.site((0, 0)).dtype)
        e = float(m.energy_per_site(state, env))
        self.assertAlmostEqual(e, -0.5333282148759652, delta=1e-6)
