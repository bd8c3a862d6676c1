"""Gradient optimization of the triangular J1-J2-J4 model over the
constrained 1-site U(1) ansatz (counterpart of reference
examples/triangular/abelian/optim_j1j2j4_1s_u1.py): the single
variational tensor is a 1-site C4v U(1) tensor; its Neel sublattice
partner is GENERATED inside the loss by charge conjugation + phase
(tpeps/sym/io.py c4v_to_bipartite = the reference's generate_BP,
optim_j1j2j4_1s_u1.py:114-137), so the gradient flows through the
partner construction:

    python examples/triangular/abelian/optim_j1j2j4_1s_u1.py \\
        --instate <abelian_c4v_state.json> --chi 24 --j2 0.1
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
from tpeps.models.abelian.spin_triangular import J1J2J4_ABELIAN
from tpeps.optim.abelian import optimize_generic_abelian
from tpeps.sym.io import (
    c4v_to_bipartite,
    read_ipeps_abelian_c4v,
    write_ipeps_abelian,
)

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--j4", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def bp_site_map(params):
    """params {"A": tensor} -> the [[A,B],[B,A]] cell, B = the Neel
    charge-conjugate partner (traceable)."""
    A = params["A"]
    st = c4v_to_bipartite(
        IPEPS_ABELIAN(A.sym, {(0, 0): A}, lX=1, lY=1))
    return dict(st.sites)


def main():
    cfg = configure(args)
    model = J1J2J4_ABELIAN(j1=args.j1, j2=args.j2, j4=args.j4,
                           dtype=cfg.global_args.jnp_dtype)
    if cfg.main.instate is None:
        raise ValueError("--instate is required (as in the reference example)")
    c4v_state = read_ipeps_abelian_c4v(cfg.main.instate)
    A = c4v_state.site((0, 0))
    if cfg.main.instate_noise:
        key = jax.random.PRNGKey(cfg.main.seed)
        A = add_noise_abelian(A, key, cfg.main.instate_noise)
        A = A * (1.0 / float(A.norm()))
    state = IPEPS_ABELIAN(A.sym, bp_site_map({"A": A}),
                          vertexToSite=lambda c: ((c[0] + c[1]) % 2, 0),
                          lX=2, lY=2)

    def obs_fn(params, ctx):
        print(f"epoch {ctx['epoch']}: e = {ctx['loss']:.12f}")

    def best_state_writer(params, loss):
        st = IPEPS_ABELIAN(A.sym, {(0, 0): params["A"].to_backend("np")},
                           lX=1, lY=1)
        write_ipeps_abelian(st, cfg.main.out_prefix + "_state.json")

    best_state, history = optimize_generic_abelian(
        state, model.energy_per_site, cfg, obs_fn=obs_fn,
        best_state_writer=best_state_writer,
        params0={"A": A.to_backend("jnp")}, site_map=bp_site_map,
    )

    env, _ = ctmrg_a.run(best_state, env_a.init_env(best_state, cfg.main.chi),
                         cfg.ctm)
    e = float(model.energy_per_site(best_state, env))
    obs_values, obs_labels = model.eval_obs(best_state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptimTrgl1SU1(unittest.TestCase):
    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "c4v",
        "BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_blocks_1site_state.json")

    @unittest.skipUnless(
        os.environ.get("TPEPS_HEAVY") == "1",
        "compile-heavy (generic frozen sweeps; engine validated by "
        "tests/test_abelian_ad.py)",
    )
    def test_opt_trgl_1s_u1_d3(self):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.chi = 16
        args.j1, args.j2 = 1.0, 0.0
        args.opt_max_iter = 6
        args.out_prefix = "RESULT_test_opt_trgl_1s_u1"
        e = main()
        assert e < -0.3, e
        for suf in ("_state.json", "_checkpoint.p"):
            p = args.out_prefix + suf
            if os.path.exists(p):
                os.remove(p)
