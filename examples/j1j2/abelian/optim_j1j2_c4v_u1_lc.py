"""Gradient optimization of the U(1)-structured C4v LC ansatz for
J1-J2 (counterpart of reference
examples/j1j2/abelian/optim_j1j2_c4v_u1_lc.py): the variational
parameters are the LC COEFFICIENTS; the coefficient -> block-sparse
site map is traceable (tpeps/ipeps/ipeps_abelian_c4v_lc.py), so the
implicit adjoint of the frozen C4v abelian engine differentiates
straight into them:

    python examples/j1j2/abelian/optim_j1j2_c4v_u1_lc.py \\
        --instate <c4v_u1_lc_state.json> --chi 24 --instate_noise 0.05
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp

from tpeps.config import configure, get_args_parser
from tpeps.ctm.c4v_abelian import ctmrg as ctmrg_c4v
from tpeps.ctm.c4v_abelian import env as env_c4v
from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN
from tpeps.ipeps.ipeps_abelian_c4v_lc import read_ipeps_c4v_lc
from tpeps.models.abelian.j1j2 import J1J2_ABELIAN
from tpeps.optim.abelian import optimize_c4v_abelian

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = J1J2_ABELIAN(j1=args.j1, j2=args.j2,
                         dtype=cfg.global_args.jnp_dtype)
    if cfg.main.instate is None:
        raise ValueError("--instate is required (as in the reference example)")
    lc = read_ipeps_c4v_lc(cfg.main.instate)
    c0 = jnp.asarray(lc.coeffs)
    if cfg.main.instate_noise:
        key = jax.random.PRNGKey(cfg.main.seed)
        c0 = c0 + cfg.main.instate_noise * jax.random.uniform(
            key, c0.shape, minval=-0.5, maxval=0.5)
    a0 = lc.build_onsite(c0).to_backend("np")
    state = IPEPS_ABELIAN(lc.sym, {(0, 0): a0 * (1.0 / float(a0.norm()))})

    def site_of_params(c):
        return lc.build_onsite(c)

    def obs_fn(params, ctx):
        print(f"epoch {ctx['epoch']}: e = {ctx['loss']:.12f}")

    def best_state_writer(params, loss):
        lc.set_coeffs(params).write_to_file(cfg.main.out_prefix + "_state.json")

    best_state, history = optimize_c4v_abelian(
        state, model.energy_per_site, cfg, obs_fn=obs_fn,
        best_state_writer=best_state_writer,
        params0=c0, site_of_params=site_of_params,
        # the LC basis is C4v-A1 by construction
        symmetrize=False,
    )

    env, _ = ctmrg_c4v.run(best_state,
                           env_c4v.init_env(best_state, cfg.main.chi), cfg.ctm)
    st_bp, eg = env_c4v.as_generic(best_state, env)
    e = float(model.energy_per_site(st_bp, eg).real)
    obs_values, obs_labels = model.eval_obs(st_bp, eg)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptimC4vU1LC(unittest.TestCase):
    """From the committed optimized D=3 LC state perturbed by noise on
    the coefficients, a short run must recover the optimum
    -0.66459795 to ~1e-3 (reference README Ex. 3 family)."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "c4v",
        "BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_state.json")

    def test_opt_c4v_u1_lc_d3(self):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.chi = 24
        args.j1, args.j2 = 1.0, 0.0
        args.instate_noise = 0.05
        args.seed = 17
        args.opt_max_iter = 8
        args.out_prefix = "RESULT_test_opt_c4v_u1_lc"
        e = main()
        assert e < -0.6635, e
        for suf in ("_state.json", "_checkpoint.p"):
            p = args.out_prefix + suf
            if os.path.exists(p):
                os.remove(p)
