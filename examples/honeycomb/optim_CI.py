"""Gradient optimization of the fermionic chiral-insulator t-V state
(counterpart of reference examples/honeycomb/CI.py main()).

The variational parameters are the BLOCKS of the graded on-site tensor
(U(1) charge structure fixed by the instate); the loss is the t-V
energy through the fermionic double-layer CTM, differentiated by
truncated backprop through ``grad_tail_iter`` dl sweeps
(ctm/generic/dl.py run_dl_differentiable) from a host-converged
environment — the same scheme as the dense generic optimizer.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import jax
import jax.numpy as jnp
import numpy as np

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.dl import init_env_dl, run_dl, run_dl_differentiable
from tpeps.ctm.generic.dl_fermi import double_tensor
from tpeps.models.fermion.tv_model import TVModel
from tpeps.optim.driver import optimize_state
from tpeps.sym.io import read_peps_ad

parser = get_args_parser()
parser.add_argument("--V1", type=float, default=0.0)
parser.add_argument("--V2", type=float, default=0.0)
parser.add_argument("--V3", type=float, default=0.0)
parser.add_argument("--t1", type=float, default=1.0)
parser.add_argument("--t2", type=float, default=0.0)
parser.add_argument("--t3", type=float, default=0.0)
parser.add_argument("--phi", type=float, default=0.0)
parser.add_argument("--mu", type=float, default=0.0)
parser.add_argument("--m", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def optimize_ci(cfg, model, a, noise=0.0, seed=0):
    """Optimize the graded tensor's blocks; returns (best_E, blocks)."""
    chi = cfg.main.chi
    key = jax.random.PRNGKey(seed)
    blocks0 = {}
    for k, v in a.blocks.items():
        v = jnp.asarray(v)
        if noise:
            key, k1, k2 = jax.random.split(key, 3)
            v = v + noise * (jax.random.uniform(k1, v.shape, dtype=jnp.float64)
                             - 0.5 + 1j * (jax.random.uniform(
                                 k2, v.shape, dtype=jnp.float64) - 0.5))
        blocks0[k] = v

    def normalize(blocks):
        nrm = jnp.sqrt(sum(jnp.sum(jnp.abs(b) ** 2) for b in blocks.values()))
        return {k: b / nrm for k, b in blocks.items()}

    def converge(blocks):
        E = double_tensor(a, blocks=normalize(blocks))
        return run_dl(E, init_env_dl(E, chi), cfg.ctm)

    def loss_ctx_fn(blocks):
        env, _ = converge(blocks)
        return (dict(env.C), dict(env.T))

    def loss_fn(blocks, ctx):
        from tpeps.ctm.generic.env import ENV

        blocks = normalize(blocks)
        C, T = ctx
        env0 = ENV(chi)
        env0.C, env0.T = C, T
        E = double_tensor(a, blocks=blocks)
        env = run_dl_differentiable(E, env0, cfg.ctm)
        return model.energy_per_site(a, env, blocks=blocks)

    def loss_fn_ng(blocks):
        env, _ = converge(blocks)
        return model.energy_per_site(a, env, blocks=normalize(blocks))

    best, history = optimize_state(
        blocks0, loss_fn, cfg=cfg, loss_fn_linesearch=loss_fn_ng,
        loss_ctx_fn=loss_ctx_fn,
    )
    env, _ = converge(best)
    e = float(model.energy_per_site(a, env, blocks=normalize(best)))
    obs = model.eval_obs(a, env, blocks=normalize(best))
    print("epoch, energy, " + ", ".join(obs.keys()))
    print(f"FINAL, {e}, " + ", ".join(str(float(v)) for v in obs.values()))
    return e, best


def main():
    cfg = configure(args)
    model = TVModel(V1=args.V1, V2=args.V2, V3=args.V3, t1=args.t1,
                    t2=args.t2, t3=args.t3, phi=args.phi, mu=args.mu,
                    m=args.m)
    state = read_peps_ad(cfg.main.instate)
    a = state.site((0, 0))
    return optimize_ci(cfg, model, a, noise=cfg.main.instate_noise,
                       seed=cfg.main.seed)


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptim_CI(unittest.TestCase):
    """A few LBFGS epochs on the committed CI seed state must lower the
    t-V energy (fermionic AD through the dl CTM end to end)."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"),
        "test-input", "abelian", "CI_D3_1x1_U1_state.json")

    def test_opt_lowers_energy(self):
        if not os.path.isfile(self.STATE):
            raise unittest.SkipTest("reference test-input not available")
        jax.config.update("jax_platforms", "cpu")
        args.instate = self.STATE
        args.t1, args.t2, args.t3 = 1.0, 0.7, -0.9
        args.phi = 0.35 * np.pi
        args.chi = 18
        args.opt_max_iter = 3
        args.CTMARGS_ctm_max_iter = 60
        args.CTMARGS_ctm_conv_tol = 1e-8
        args.CTMARGS_grad_tail_iter = 2
        args.CTMARGS_ad_decomp_reg = 1e-8
        args.OPTARGS_line_search = "backtracking"
        cfg = configure(args)
        model = TVModel(t1=args.t1, t2=args.t2, t3=args.t3, phi=args.phi)
        state = read_peps_ad(self.STATE)
        a = state.site((0, 0))
        # seed-state energy at this chi
        E0d = double_tensor(a)
        env0, _ = run_dl(E0d, init_env_dl(E0d, args.chi), cfg.ctm)
        e0 = float(model.energy_per_site(a, env0))
        e, _ = optimize_ci(cfg, model, a)
        assert e < e0 - 1e-4, (e, e0)
