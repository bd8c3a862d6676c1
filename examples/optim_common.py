"""Shared wiring for generic-cell ground-state optimization examples.

Every reference ``optim_<model>.py`` repeats the same skeleton
(SURVEY.md §2.13): state init -> loss closure (symmetrize -> init_env ->
ctmrg.run -> energy) -> optimize_state -> final observables.  This
module factors that skeleton for the tpeps examples; each script
supplies only the model, the unit cell and the energy function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpeps.ctm.generic.ctmrg import run, run_differentiable
from tpeps.ctm.generic.env import ENV, init_env
from tpeps.ipeps.ipeps import IPEPS, read_ipeps, write_ipeps
from tpeps.optim.driver import optimize_state


def random_sites(key, coords, phys_dim, D, dtype):
    sites = {}
    for c in coords:
        key, sub = jax.random.split(key)
        A = jax.random.uniform(sub, (phys_dim, D, D, D, D), dtype=dtype, minval=-0.5, maxval=0.5)
        sites[c] = A / jnp.linalg.norm(A)
    return sites


def optimize_generic(
    cfg,
    energy_f,
    sites0,
    *,
    vertexToSite=None,
    lX=None,
    lY=None,
    obs_f=None,
):
    """Run the canonical generic-cell optimization loop.

    :param energy_f: ``(state, env) -> scalar`` (differentiable)
    :param sites0: initial dict ``coord -> jnp array``
    :param obs_f: optional ``(state, env) -> (values, labels)``
    :return: ``(final_energy, final_state, final_env, history)``
    """
    chi = cfg.main.chi

    def make_state(sites):
        norm = {c: a / jnp.linalg.norm(a) for c, a in sites.items()}
        return IPEPS(norm, vertexToSite=vertexToSite, lX=lX, lY=lY)

    def converge(sites):
        st = make_state(sites)
        env = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env, _ = run(st, env, cfg.ctm)
        return st, env

    def loss_fn_ng(sites):
        st, env = converge(sites)
        return energy_f(st, env)

    def loss_ctx_fn(sites):
        _, env = converge(sites)
        return (dict(env.C), dict(env.T))

    def loss_fn(sites, ctx):
        C, T = ctx
        st = make_state(sites)
        env = run_differentiable(dict(st.sites), ENV(chi, C, T), st, cfg.ctm)
        return energy_f(st, env)

    outfile = cfg.main.out_prefix + "_state.json"

    def best_writer(sites, loss):
        write_ipeps(make_state(sites), outfile)

    def obs_cb(sites, ctx):
        if obs_f is None:
            return
        st, env = converge(sites)
        values, labels = obs_f(st, env)
        if ctx["epoch"] == 0:
            print(", ".join(["epoch", "energy"] + labels))
        print(", ".join([str(ctx["epoch"]), f"{ctx['loss']}"] + [str(v) for v in values]))

    params, history = optimize_state(
        sites0, loss_fn, cfg=cfg, loss_fn_linesearch=loss_fn_ng,
        loss_ctx_fn=loss_ctx_fn, obs_fn=obs_cb,
        best_state_writer=best_writer,
        checkpoint_file=cfg.main.out_prefix + "_checkpoint.p",
        opt_resume=cfg.main.opt_resume,
    )
    st, env = converge(params)
    e = float(energy_f(st, env))
    print(f"FINAL {e}")
    return e, st, env, history


def state_from_args(cfg, coords, phys_dim, vertexToSite=None):
    """Initial site dict from --instate or random (--bond_dim, --seed)."""
    if cfg.main.instate is not None:
        st = read_ipeps(cfg.main.instate, vertexToSite=vertexToSite)
        return dict(st.sites)
    key = jax.random.PRNGKey(cfg.main.seed)
    return random_sites(key, coords, phys_dim, cfg.main.bond_dim,
                        cfg.global_args.jnp_dtype)
