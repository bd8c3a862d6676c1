"""Shared wiring for one-site C4v ground-state optimization examples.

Every reference ``optim_*_c4v.py`` repeats the same skeleton
(SURVEY.md §2.13): read-or-random C4v site -> loss closure
(symmetrize -> init_env -> converge -> energy) -> optimize_state ->
final observables from the best stored state.  Each script supplies
only the model and its energy function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpeps.ctm.c4v.ctmrg import converge_env, run_fixed_point
from tpeps.ctm.c4v.env import init_env
from tpeps.ipeps.ipeps_c4v import (
    IPEPS_C4V,
    extend_bond_dim_c4v,
    read_ipeps_c4v,
    symmetrize_c4v,
)
from tpeps.optim.driver import optimize_state


def initial_site_c4v(cfg, phys_dim):
    """Initial C4v site tensor from --instate or random."""
    if cfg.main.instate is not None:
        state = read_ipeps_c4v(cfg.main.instate)
        if cfg.main.bond_dim > max(state.get_aux_bond_dims()):
            state = extend_bond_dim_c4v(state, cfg.main.bond_dim)
        state.add_noise(cfg.main.instate_noise,
                        key=jax.random.PRNGKey(cfg.main.seed))
        return state.site() / jnp.linalg.norm(state.site())
    if cfg.main.ipeps_init_type == "RANDOM":
        key = jax.random.PRNGKey(cfg.main.seed)
        D = cfg.main.bond_dim
        A0 = jax.random.uniform(key, (phys_dim, D, D, D, D),
                                dtype=cfg.global_args.real_dtype)
        if cfg.global_args.is_complex:
            A0 = A0.astype(cfg.global_args.jnp_dtype)
        return A0 / jnp.linalg.norm(A0)
    raise ValueError("Missing trial state: provide --instate or "
                     "--ipeps_init_type RANDOM")


def converge_c4v(cfg, a, projector_method=None):
    """Non-differentiable converged C4v environment."""
    env0 = init_env(a, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    kwargs = {}
    if projector_method is not None:
        kwargs["projector_method"] = projector_method
    env, *_ = run_fixed_point(
        a=a, env=env0, max_iter=cfg.ctm.ctm_max_iter,
        conv_tol=cfg.ctm.ctm_conv_tol, **kwargs,
    )
    return env


def optimize_c4v(cfg, model, energy_f, A0, obs_extra=None):
    """Run the canonical C4v optimization loop.

    :param energy_f: ``(a, env) -> scalar`` (differentiable)
    :param obs_extra: optional callback ``(a, env, epoch)`` run after the
        per-epoch observable line (transfer spectra etc.)
    :return: ``(final_energy, final_a, final_env)``
    """
    chi = cfg.main.chi
    ctm_cfg = cfg.ctm

    def loss_fn(p):
        a = symmetrize_c4v(p, normalize=True)
        env0 = init_env(jax.lax.stop_gradient(a), chi, ctm_cfg.ctm_env_init_type)
        env = converge_env(a, env0, ctm_cfg)
        return energy_f(a, env)

    ls_proj = (cfg.opt.line_search_svd_method
               if cfg.opt.line_search_svd_method != "DEFAULT" else None)

    def loss_fn_ng(p):
        a = symmetrize_c4v(p, normalize=True)
        env = converge_c4v(cfg, a, projector_method=ls_proj)
        return energy_f(a, env)

    outfile = cfg.main.out_prefix + "_state.json"

    def best_writer(p, loss):
        IPEPS_C4V(symmetrize_c4v(p, normalize=True)).write_to_file(outfile)

    def obs_fn(p, ctx):
        a = symmetrize_c4v(p, normalize=True)
        env = converge_c4v(cfg, a)
        obs_values, obs_labels = model.eval_obs(a, env)
        if ctx["epoch"] == 0:
            print(", ".join(["epoch", "energy"] + obs_labels))
        print(", ".join([str(ctx["epoch"]), f"{ctx['loss']}"]
                        + [str(v) for v in obs_values]))
        if obs_extra is not None:
            obs_extra(a, env, ctx["epoch"])

    optimize_state(
        A0, loss_fn, cfg=cfg, loss_fn_linesearch=loss_fn_ng, obs_fn=obs_fn,
        best_state_writer=best_writer,
        checkpoint_file=cfg.main.out_prefix + "_checkpoint.p",
        opt_resume=cfg.main.opt_resume,
    )

    state = read_ipeps_c4v(outfile)
    a = state.site()
    env = converge_c4v(cfg, a)
    e_fin = float(energy_f(a, env))
    obs_values, obs_labels = model.eval_obs(a, env)
    print(", ".join([f"{cfg.main.opt_max_iter}", f"{e_fin}"]
                    + [str(v) for v in obs_values]))
    print(f"FINAL {e_fin}")
    return e_fin, a, env


def ctmrg_c4v(cfg, model, energy_f, A0=None):
    """Plain CTMRG + observables of a (stored or random) C4v state."""
    a = initial_site_c4v(cfg, model.phys_dim) if A0 is None else A0
    a = symmetrize_c4v(a, normalize=True)
    env = converge_c4v(cfg, a)
    e = float(energy_f(a, env))
    obs_values, obs_labels = model.eval_obs(a, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e, a, env, obs_values, obs_labels
