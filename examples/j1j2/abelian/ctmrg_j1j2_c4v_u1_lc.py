"""Observables of a U(1)-structured C4v linear-combination state for
J1-J2 through the block-sparse abelian C4v engine (counterpart of
reference examples/j1j2/abelian/ctmrg_j1j2_c4v_u1_lc.py):

    python examples/j1j2/abelian/ctmrg_j1j2_c4v_u1_lc.py \\
        --instate <c4v_u1_lc_state.json> --chi 32
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401

from tpeps.config import configure, get_args_parser
from tpeps.ctm.c4v_abelian import ctmrg as ctmrg_c4v
from tpeps.ctm.c4v_abelian import env as env_c4v
from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN
from tpeps.ipeps.ipeps_abelian_c4v_lc import read_ipeps_c4v_lc
from tpeps.models.abelian.j1j2 import J1J2_ABELIAN

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = J1J2_ABELIAN(j1=args.j1, j2=args.j2,
                         dtype=cfg.global_args.jnp_dtype)
    lc = read_ipeps_c4v_lc(cfg.main.instate)
    a = lc.site((0, 0)).to_backend("np")
    a = a * (1.0 / float(a.norm()))
    state = IPEPS_ABELIAN(lc.sym, {(0, 0): a})

    env, _ = ctmrg_c4v.run(state, env_c4v.init_env(state, cfg.main.chi),
                           cfg.ctm)
    st_bp, eg = env_c4v.as_generic(state, env)
    e = float(model.energy_per_site(st_bp, eg).real)
    obs_values, obs_labels = model.eval_obs(st_bp, eg)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgC4vU1LC(unittest.TestCase):
    """The committed D=3 U(1) LC state reproduces the reference energy
    -0.6645979511667757 (reference ctmrg_j1j2_u1.py:218 measures the
    same wavefunction through its 2-site blocks export)."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "c4v",
        "BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_state.json")

    def test_ctmrg_c4v_u1_lc_d3(self):
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
