"""Observables of a stored kagome iPESS (counterpart of reference
examples/kagome/ctmrg_spin_half_kagome.py)."""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipess_kagome import read_ipess_kagome_generic
from tpeps.models.spin_half_kagome import S_HALF_KAGOME

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--JD", type=float, default=0.0, help="Dzyaloshinskii-Moriya")
parser.add_argument("--jtrip", type=float, default=0.0, help="scalar chirality")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = S_HALF_KAGOME(j1=args.j1, JD=args.JD, jtrip=args.jtrip,
                          dtype=cfg.global_args.jnp_dtype)
    state = read_ipess_kagome_generic(cfg.main.instate)
    env = init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, _ = run(state, env, cfg.ctm)
    e_dn, _ = model.energy_triangle_dn(state, env)
    e_up, _ = model.energy_triangle_up(state, env)
    e = float(model.energy_per_site(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy", "e_dn", "e_up"] + obs_labels))
    print(", ".join(
        ["FINAL", f"{e}", str(sum(e_dn.values())), str(sum(e_up.values()))]
        + [str(v) for v in obs_values]
    ))
    return e, e_dn, e_up


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrg_IPESS_D3_RVB(unittest.TestCase):
    """Golden values from reference CI
    (examples/kagome/ctmrg_spin_half_kagome.py:362-420, chi=18)."""

    tol = 1.0e-6
    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def test_rvb_energy(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(self.REF, "test-input", "IPESS_KAGOME_D3_RVB.in")
        if not os.path.exists(f):
            self.skipTest("reference test-input not available")
        args.instate = f
        args.chi = 18
        args.CTMARGS_ctm_max_iter = 200
        e, e_dn, e_up = main()
        self.assertAlmostEqual(e, -0.3931221584692804, delta=self.tol)
        self.assertAlmostEqual(
            complex(e_dn[(0, 0)]).real, -0.5896832690555696, delta=self.tol
        )
        self.assertAlmostEqual(
            complex(e_up[(0, 0)]).real, -0.5896832063522717, delta=self.tol
        )
