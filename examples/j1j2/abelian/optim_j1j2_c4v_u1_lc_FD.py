"""U(1)-structured C4v LC ansatz for J1-J2, FINITE-DIFFERENCE gradients
over the coefficients (counterpart of reference
examples/j1j2/abelian/optim_j1j2_c4v_u1_lc_FD.py, which evaluates the
displacements serially through yastn under torch.no_grad; here the
displacement wave is vmap-batched through ONE jitted frozen-structure
abelian CTM program):

    python examples/j1j2/abelian/optim_j1j2_c4v_u1_lc_FD.py \\
        --instate <c4v_u1_lc_state.json> --chi 24

The per-sector chi profile is frozen once from the initial state's
host-converged environment (stable near the optimum, where FD
optimization operates); the FD loss is then a pure
``coefficients -> energy`` jitted function.
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
from tpeps.ctm.c4v_abelian.frozen import (
    _make_converge_frozen,
    close_structure,
    freeze_from_env,
)
from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN
from tpeps.ipeps.ipeps_abelian_c4v_lc import read_ipeps_c4v_lc
from tpeps.models.abelian.j1j2 import J1J2_ABELIAN
from tpeps.optim.fd import optimize_state_fd

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def make_frozen_loss(lc, c0, model, cfg):
    """Freeze the chi profile from the c0 state, return the jittable
    ``{"c": coeffs} -> energy`` loss."""
    chi, ctm_cfg = cfg.main.chi, cfg.ctm
    a0 = lc.build_onsite(c0).to_backend("np")
    a0 = a0 * (1.0 / float(a0.norm()))
    st0 = IPEPS_ABELIAN(lc.sym, {(0, 0): a0})
    env, _ = ctmrg_c4v.run(st0, env_c4v.init_env(st0, chi), ctm_cfg)
    keep = freeze_from_env(env)
    C0, T0 = close_structure(
        a0.to_backend("jnp"), env.C.to_backend("jnp"),
        env.T.to_backend("jnp"), dict(keep))
    converge = _make_converge_frozen(
        keep, ctm_cfg.ctm_max_iter, ctm_cfg.ctm_conv_tol,
        ctm_cfg.ad_decomp_reg, 100, 1.0e-8)

    def loss_fn(params):
        A = lc.build_onsite(params["c"])
        A = A * (1.0 / A.norm())
        Cf, Tf = converge(A, C0, T0)
        st = IPEPS_ABELIAN(lc.sym, {(0, 0): A})
        st_bp, eg = env_c4v.as_generic(
            st, env_c4v.ENV_C4V_ABELIAN(chi, Cf, Tf))
        e = model.energy_per_site(st_bp, eg)
        return e.real if hasattr(e, "real") else e

    return loss_fn


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

    loss_fn = make_frozen_loss(lc, c0, model, cfg)
    params, history = optimize_state_fd({"c": c0}, loss_fn, cfg=cfg)

    lc.set_coeffs(params["c"]).write_to_file(cfg.main.out_prefix + "_state.json")
    a = lc.build_onsite(params["c"]).to_backend("np")
    best_state = IPEPS_ABELIAN(lc.sym, {(0, 0): a * (1.0 / float(a.norm()))})
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


class TestOptimC4vU1LCFD(unittest.TestCase):
    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "c4v",
        "BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_state.json")

    def test_opt_c4v_u1_lc_d3_fd(self):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.chi = 24
        args.j1, args.j2 = 1.0, 0.0
        args.instate_noise = 0.03
        args.seed = 17
        args.opt_max_iter = 6
        args.out_prefix = "RESULT_test_opt_c4v_u1_lc_fd"
        e = main()
        assert e < -0.6635, e
        for suf in ("_state.json", "_checkpoint.p"):
            p = args.out_prefix + suf
            if os.path.exists(p):
                os.remove(p)
