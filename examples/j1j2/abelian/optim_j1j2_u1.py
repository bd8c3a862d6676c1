"""Gradient optimization of a U(1) bipartite 2-site iPEPS for J1-J2 —
the generic-cell abelian optimization capability (counterpart of
reference examples/j1j2/abelian/optim_j1j2_u1.py, which differentiates
through YASTN's torch backend; here gradients come from implicit
differentiation of the frozen-structure generic abelian engine,
tpeps/ctm/generic_abelian/frozen.py).

    python examples/j1j2/abelian/optim_j1j2_u1.py \\
        --instate <abelian_2site_state.json> --chi 24 --j2 0.0 \\
        --instate_noise 0.1 --opt_max_iter 30
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "..")))

import tpeps  # noqa: F401
import jax

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_g
from tpeps.ctm.generic_abelian import env as env_g
from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN, add_noise_abelian
from tpeps.models.abelian.j1j2 import J1J2_ABELIAN
from tpeps.optim.abelian import optimize_generic_abelian
from tpeps.sym.io import read_ipeps_abelian, write_ipeps_abelian

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def bipartite(coord):
    vx = (coord[0] + abs(coord[0]) * 2) % 2
    vy = abs(coord[1])
    return ((vx + vy) % 2, 0)


def main():
    cfg = configure(args)
    model = J1J2_ABELIAN(j1=args.j1, j2=args.j2, dtype=cfg.global_args.jnp_dtype)

    if cfg.main.instate is None:
        raise ValueError("--instate is required (as in the reference example)")
    state = read_ipeps_abelian(cfg.main.instate, vertexToSite=bipartite)
    if cfg.main.instate_noise:
        key = jax.random.PRNGKey(cfg.main.seed)
        sites = {}
        for c in sorted(state.sites):
            key, sub = jax.random.split(key)
            a = add_noise_abelian(state.sites[c], sub, cfg.main.instate_noise)
            sites[c] = a * (1.0 / float(a.norm()))
        state = IPEPS_ABELIAN(state.sym, sites, vertexToSite=bipartite,
                              lX=state.lX, lY=state.lY)

    def obs_fn(params, ctx):
        print(f"epoch {ctx['epoch']}: e = {ctx['loss']:.12f}")

    def best_state_writer(params, loss):
        st = IPEPS_ABELIAN(state.sym,
                           {c: a.to_backend("np") for c, a in params.items()},
                           vertexToSite=bipartite, lX=state.lX, lY=state.lY)
        write_ipeps_abelian(st, cfg.main.out_prefix + "_state.json")

    best_state, history = optimize_generic_abelian(
        state, model.energy_per_site, cfg, obs_fn=obs_fn,
        best_state_writer=best_state_writer,
    )

    # final measurement through the dynamic (host) engine
    env, _ = ctmrg_g.run(best_state, env_g.init_env(best_state, cfg.main.chi),
                         cfg.ctm)
    e = float(model.energy_per_site(best_state, env).real)
    obs_values, obs_labels = model.eval_obs(best_state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if len(unknown_args) > 0:
        print("args not recognized: " + str(unknown_args))
        raise Exception("Unknown command line arguments")
    main()


class TestOptimU1Bipartite(unittest.TestCase):
    """Optimization smoke + golden: from the committed reference U(1)
    2-site D=3 state (unperturbed energy -0.6645979511667757 at chi=32,
    reference ctmrg_j1j2_u1.py:218) perturbed by noise, a short L-BFGS
    run must recover close to the optimum."""

    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    @unittest.skipUnless(
        os.environ.get("TPEPS_HEAVY") == "1",
        "compile-heavy (8-move generic frozen sweep traces for ~0.5-1 h on a "
        "1-core box; set TPEPS_HEAVY=1 — the engine itself is validated by "
        "tests/test_abelian_ad.py::test_frozen_generic_matches_host)",
    )
    def test_opt_j1j2_u1_d3_bipartite(self):
        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(
            self.REF,
            "test-input/abelian/c4v/BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_blocks_2site_state.json",
        )
        if not os.path.exists(f):
            self.skipTest("reference test-input not available")
        args.instate = f
        args.chi = 16
        args.j1, args.j2 = 1.0, 0.0
        args.instate_noise = 0.05
        args.seed = 11
        args.opt_max_iter = 8
        args.out_prefix = "RESULT_test_opt_u1_bip"
        e = main()
        assert e < -0.6590, e
        for suf in ("_state.json", "_checkpoint.p", "_best.json"):
            p = args.out_prefix + suf
            if os.path.exists(p):
                os.remove(p)
