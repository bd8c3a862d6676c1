"""Gradient optimization of a U(1) coupled-ladders state (counterpart
of reference examples/ladders/abelian/optim_ladders_u1.py, which
differentiates through YASTN's torch backend; here gradients come from
implicit differentiation of the frozen-structure generic abelian
engine, tpeps/ctm/generic_abelian/frozen.py):

    python examples/ladders/abelian/optim_ladders_u1.py \\
        --instate <abelian_state.json> --alpha 0.1 --chi 24 \\
        --instate_noise 0.05 --opt_max_iter 20
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401
import jax

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_a
from tpeps.ctm.generic_abelian import env as env_a
from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN, add_noise_abelian
from tpeps.models.abelian.coupledLadders import COUPLEDLADDERS_ABELIAN
from tpeps.optim.abelian import optimize_generic_abelian
from tpeps.sym.io import read_ipeps_abelian, write_ipeps_abelian

parser = get_args_parser()
parser.add_argument("--alpha", type=float, default=0.0)
parser.add_argument("--bz_stag", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    model = COUPLEDLADDERS_ABELIAN(alpha=args.alpha, bz_val=args.bz_stag)

    if cfg.main.instate is None:
        raise ValueError("--instate is required (as in the reference example)")
    state = read_ipeps_abelian(cfg.main.instate)
    if cfg.main.instate_noise:
        key = jax.random.PRNGKey(cfg.main.seed)
        sites = {}
        for c in sorted(state.sites):
            key, sub = jax.random.split(key)
            a = add_noise_abelian(state.sites[c], sub, cfg.main.instate_noise)
            sites[c] = a * (1.0 / float(a.norm()))
        state = IPEPS_ABELIAN(state.sym, sites, vertexToSite=state.vertexToSite,
                              lX=state.lX, lY=state.lY)

    def obs_fn(params, ctx):
        print(f"epoch {ctx['epoch']}: e = {ctx['loss']:.12f}")

    def best_state_writer(params, loss):
        st = IPEPS_ABELIAN(state.sym,
                           {c: a.to_backend("np") for c, a in params.items()},
                           vertexToSite=state.vertexToSite,
                           lX=state.lX, lY=state.lY)
        write_ipeps_abelian(st, cfg.main.out_prefix + "_state.json")

    best_state, history = optimize_generic_abelian(
        state, model.energy_2x1_1x2, cfg, obs_fn=obs_fn,
        best_state_writer=best_state_writer,
    )

    env, _ = ctmrg_a.run(best_state, env_a.init_env(best_state, cfg.main.chi),
                         cfg.ctm)
    e = float(model.energy_2x1_1x2(best_state, env))
    obs_values, obs_labels = model.eval_obs(best_state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptimLaddersU1(unittest.TestCase):
    """From the committed D=2 alpha=0.1 U(1) state perturbed by noise, a
    short run must recover at least the unperturbed energy (the
    reference's TestCheckpoint_VBSstate exercises the same state)."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "ABU1_BFGS100LS_D2-chi24-a0.1-run0-svd8_i2SUVBSn0_state.json")

    @unittest.skipUnless(
        os.environ.get("TPEPS_HEAVY") == "1",
        "compile-heavy (generic frozen sweeps trace for tens of minutes on a "
        "1-core box; the engine is validated by tests/test_abelian_ad.py)",
    )
    def test_opt_ladders_u1_d2(self):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.alpha = 0.1
        args.chi = 16
        args.instate_noise = 0.05
        args.seed = 300
        args.opt_max_iter = 8
        args.out_prefix = "RESULT_test_opt_ladders_u1"
        e = main()
        assert e < -0.42, e
        for suf in ("_state.json", "_checkpoint.p"):
            p = args.out_prefix + suf
            if os.path.exists(p):
                os.remove(p)
