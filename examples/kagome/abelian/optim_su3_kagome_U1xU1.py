"""Gradient optimization of a U(1)xU(1) SU(3) kagome iPESS
(counterpart of reference
examples/kagome/abelian/optim_su3_kagome_U1xU1.py; gradients by
implicit differentiation of the frozen-structure abelian engine over
the five elementary tensors):

    python examples/kagome/abelian/optim_su3_kagome_U1xU1.py \\
        --instate <abelian_U1xU1_state.json> --phi 0.5 --chi 27
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401
import numpy as np

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_a
from tpeps.ctm.generic_abelian import env as env_a
from tpeps.ipeps.ipess_kagome_abelian import (
    IPESS_KAGOME_ABELIAN,
    build_onsite_7,
    read_ipess_kagome_abelian,
    write_ipess_kagome_abelian,
)
from tpeps.models.abelian.su3_kagome import KAGOME_SU3_U1xU1
from tpeps.optim.abelian import optimize_generic_abelian

parser = get_args_parser()
parser.add_argument("--phi", type=float, default=0.5)
parser.add_argument("--theta", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


class _IPESSView:
    def __init__(self, sym, td):
        self.sym = sym
        self.sites7 = {(0, 0): build_onsite_7(td, normalize=False)}
        self.lX = self.lY = 1
        self.vertexToSite = lambda c: (0, 0)

    def site7(self, coord=(0, 0)):
        return self.sites7[(0, 0)]


def main():
    cfg = configure(args)
    j = float(np.round(np.cos(np.pi * args.phi), 12))
    k = float(np.round(np.sin(np.pi * args.phi) * np.cos(np.pi * args.theta), 12))
    h = float(np.round(np.sin(np.pi * args.phi) * np.sin(np.pi * args.theta), 12))
    model = KAGOME_SU3_U1xU1(phys_dim=3, j=j, k=k, h=h)
    if cfg.main.instate is None:
        raise ValueError("--instate is required (as in the reference example)")
    state = read_ipess_kagome_abelian(cfg.main.instate)
    td0 = {key: t.to_backend("jnp")
           for key, t in state.ipess_tensors[(0, 0)].items()}
    sym = state.sym

    def site_map(params):
        a7 = build_onsite_7(params, normalize=False)
        return {(0, 0): a7.fuse_pair(0).fuse_pair(0)}

    def energy_f(st, env, params):
        return model.energy_per_site_2x2subsystem(_IPESSView(sym, params), env)

    def obs_fn(params, ctx):
        print(f"epoch {ctx['epoch']}: e = {ctx['loss']:.12f}")

    def best_state_writer(params, loss):
        st = IPESS_KAGOME_ABELIAN(
            sym, {key: t.to_backend("np") for key, t in params.items()})
        write_ipess_kagome_abelian(st, cfg.main.out_prefix + "_state.json")

    best_state, history = optimize_generic_abelian(
        state.fused(), energy_f, cfg, obs_fn=obs_fn,
        best_state_writer=best_state_writer,
        params0=td0, site_map=site_map, energy_takes_params=True,
    )

    td_best = history["best_params"]
    st = IPESS_KAGOME_ABELIAN(
        sym, {key: t.to_backend("np") for key, t in td_best.items()})
    fused = st.fused()
    env, _ = ctmrg_a.run(fused, env_a.init_env(fused, cfg.main.chi), cfg.ctm)
    e = float(model.energy_per_site_2x2subsystem(st, env))
    obs_values, obs_labels = model.eval_obs(st, env)
    print(", ".join(["epoch", "energy"] + list(obs_labels)))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptimSU3U1xU1(unittest.TestCase):
    """From the committed U(1)xU(1) AKLT state (an exact local optimum
    at phi=0.5, E=-2/3) a short run must stay at the optimum."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "IPESS_AKLT_3b_D3_1x1_abelian-U1xU1_T3T8_state.json")

    @unittest.skipUnless(
        os.environ.get("TPEPS_HEAVY") == "1",
        "compile-heavy (generic frozen sweeps; the engine is validated "
        "by tests/test_abelian_ad.py)",
    )
    def test_opt_su3_aklt_u1xu1(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.phi = 0.5
        args.chi = 18
        args.opt_max_iter = 3
        args.out_prefix = "RESULT_test_opt_su3_u1xu1"
        e = main()
        assert e < -0.666, e
        for suf in ("_state.json", "_checkpoint.p"):
            p = args.out_prefix + suf
            if os.path.exists(p):
                os.remove(p)
