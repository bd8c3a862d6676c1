"""Gradient optimization of a U(1) kagome iPESS (counterpart of
reference examples/kagome/abelian/optim_kagome_spin_half_u1.py, which
uses serial finite differences through yastn's CTM —
optim/fd_optim_lbfgs_mod_kagome_u1.py; here gradients come from
implicit differentiation of the frozen-structure abelian engine, with
the five elementary tensors as the variational parameters and the
fused on-site tensor rebuilt inside the traced loss):

    python examples/kagome/abelian/optim_kagome_spin_half_u1.py \\
        --instate <abelian_ipess_state.json> --chi 27 --opt_max_iter 50
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_a
from tpeps.ctm.generic_abelian import env as env_a
from tpeps.ipeps.ipess_kagome_abelian import (
    IPESS_KAGOME_ABELIAN,
    build_onsite_7,
    read_ipess_kagome_abelian,
    write_ipess_kagome_abelian,
)
from tpeps.models.abelian.kagome_u1 import KAGOME_U1
from tpeps.optim.abelian import optimize_generic_abelian

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
args, unknown_args = parser.parse_known_args()


class _IPESSView:
    """Traceable stand-in for IPESS_KAGOME_ABELIAN inside the loss:
    sites7 built from the parameter tensors without host round-trips."""

    def __init__(self, sym, td):
        self.sym = sym
        self.sites7 = {(0, 0): build_onsite_7(td, normalize=False)}
        self.lX = self.lY = 1
        self.vertexToSite = lambda c: (0, 0)

    def site7(self, coord=(0, 0)):
        return self.sites7[(0, 0)]


def main():
    cfg = configure(args)
    model = KAGOME_U1(j1=args.j1)
    if cfg.main.instate is None:
        raise ValueError("--instate is required (as in the reference example)")
    state = read_ipess_kagome_abelian(cfg.main.instate)
    td0 = {k: t.to_backend("jnp")
           for k, t in state.ipess_tensors[(0, 0)].items()}
    sym = state.sym

    def site_map(params):
        a7 = build_onsite_7(params, normalize=False)
        return {(0, 0): a7.fuse_pair(0).fuse_pair(0)}

    def energy_f(st, env, params):
        return model.energy_per_site(_IPESSView(sym, params), env)

    def obs_fn(params, ctx):
        print(f"epoch {ctx['epoch']}: e = {ctx['loss']:.12f}")

    def best_state_writer(params, loss):
        st = IPESS_KAGOME_ABELIAN(
            sym, {k: t.to_backend("np") for k, t in params.items()})
        write_ipess_kagome_abelian(st, cfg.main.out_prefix + "_state.json")

    best_state, history = optimize_generic_abelian(
        state.fused(), energy_f, cfg, obs_fn=obs_fn,
        best_state_writer=best_state_writer,
        params0=td0, site_map=site_map, energy_takes_params=True,
    )

    td_best = history["best_params"]
    st = IPESS_KAGOME_ABELIAN(
        sym, {k: t.to_backend("np") for k, t in td_best.items()})
    fused = st.fused()
    env, _ = ctmrg_a.run(fused, env_a.init_env(fused, cfg.main.chi), cfg.ctm)
    e = float(model.energy_per_site(st, env))
    obs_values, obs_labels = model.eval_obs(st, env)
    print(", ".join(["epoch", "energy"] + list(obs_labels)))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptimKagomeU1(unittest.TestCase):
    """Short optimization of the committed U(1) RVB D=3 state: the
    optimizer must strictly improve on the bare-RVB energy -0.393122
    while preserving the block structure (the reference's FD kagome-U1
    driver exercises the same state)."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "IPESS_KAGOME_RVB_D3_abelian-U1_state.json")

    @unittest.skipUnless(
        os.environ.get("TPEPS_HEAVY") == "1",
        "compile-heavy (generic frozen sweeps; the engine is validated "
        "by tests/test_abelian_ad.py)",
    )
    def test_opt_kagome_u1_rvb(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.j1 = 1.0
        args.chi = 18
        args.opt_max_iter = 6
        args.out_prefix = "RESULT_test_opt_kagome_u1"
        e = main()
        assert e < -0.3935, e
        for suf in ("_state.json", "_checkpoint.p"):
            p = args.out_prefix + suf
            if os.path.exists(p):
                os.remove(p)
