"""Shared wiring for the kagome optimization example family
(reference examples/kagome/optim_{spin1,su3,spin_half*}_kagome*.py).

Factors the ansatz zoo (--ansatz IPESS / IPESS_PG / A_1,B / A_2,B /
IPEPS — reference optim_spin1_kagome.py:52-130) and the canonical
generic-engine optimization loop (no-grad fixed point for line
searches, implicit or checkpointed-scan gradients per
--CTMARGS_grad_mode for the step direction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpeps.ctm.generic.ctmrg import converge_env_generic, run
from tpeps.ctm.generic.env import ENV, init_env
from tpeps.ipeps.ipeps_kagome import IPEPS_KAGOME, read_ipeps_kagome
from tpeps.ipeps.ipess_kagome import (
    IPESS_KAGOME_GENERIC,
    IPESS_KAGOME_PG,
    read_ipess_kagome_generic,
    read_ipess_kagome_pg,
    to_PG_symmetric,
    write_ipess_kagome_generic,
    write_ipess_kagome_pg,
)
from tpeps.optim.driver import optimize_state

ANSATZE = ["IPESS", "IPESS_PG", "A_1,B", "A_2,B", "IPEPS"]


def init_state(cfg, ansatz, phys_dim, sym_up_dn=True, sym_bond_S=True):
    """State per --ansatz (reference optim_spin1_kagome.py:52-130)."""
    D = cfg.main.bond_dim
    pgs = {"A_1,B": IPESS_KAGOME_PG.PG_A1_B,
           "A_2,B": IPESS_KAGOME_PG.PG_A2_B}.get(ansatz)
    rd = cfg.global_args.real_dtype

    if cfg.main.instate is not None:
        if ansatz == "IPESS":
            state = read_ipess_kagome_generic(cfg.main.instate)
        elif ansatz == "IPEPS":
            state = read_ipeps_kagome(cfg.main.instate)
        else:
            state = read_ipess_kagome_pg(cfg.main.instate)
            if pgs is not None and not state.pgs:
                state = to_PG_symmetric(state, SYM_UP_DOWN=sym_up_dn,
                                        SYM_BOND_S=sym_bond_S, pgs=pgs)
        if cfg.main.instate_noise:
            # perturb at the PARAMETER level (the elementary tensors for
            # iPESS ansaetze), not the fused on-site tensors
            key = [jax.random.PRNGKey(cfg.main.seed)]

            def perturb(t):
                key[0], sub = jax.random.split(key[0])
                if jnp.iscomplexobj(t):
                    k1, k2 = jax.random.split(sub)
                    dr = jax.random.uniform(k1, t.shape, minval=-0.5, maxval=0.5)
                    di = jax.random.uniform(k2, t.shape, minval=-0.5, maxval=0.5)
                    return t + cfg.main.instate_noise * (dr + 1j * di)
                return t + cfg.main.instate_noise * jax.random.uniform(
                    sub, t.shape, dtype=t.dtype, minval=-0.5, maxval=0.5)

            state = state.set_parameters(
                jax.tree_util.tree_map(perturb, state.get_parameters()))
        return state

    key = jax.random.PRNGKey(cfg.main.seed)
    ks = jax.random.split(key, 5)

    def r(k, shape):
        return jax.random.uniform(k, shape, dtype=rd, minval=-0.5, maxval=0.5)

    if ansatz == "IPEPS":
        t = r(ks[0], (phys_dim**3, D, D, D, D))
        return IPEPS_KAGOME({(0, 0): t / jnp.abs(t).max()})
    td = {"T_u": r(ks[0], (D, D, D)), "T_d": r(ks[1], (D, D, D)),
          "B_a": r(ks[2], (phys_dim, D, D)), "B_b": r(ks[3], (phys_dim, D, D)),
          "B_c": r(ks[4], (phys_dim, D, D))}
    if ansatz == "IPESS":
        return IPESS_KAGOME_GENERIC({(0, 0): td})
    return IPESS_KAGOME_PG(td["T_u"], td["B_c"], T_d=td["T_d"],
                           B_a=td["B_a"], B_b=td["B_b"],
                           SYM_UP_DOWN=sym_up_dn, SYM_BOND_S=sym_bond_S,
                           pgs=pgs or {}, pg_symmetrize=True)


def write_state(state, outputfile):
    if isinstance(state, IPESS_KAGOME_PG):
        write_ipess_kagome_pg(state, outputfile)
    elif isinstance(state, IPESS_KAGOME_GENERIC):
        write_ipess_kagome_generic(state, outputfile)
    else:
        state.write_to_file(outputfile)


def optimize_kagome(cfg, state0, energy_f, obs_f=None):
    """Canonical optimization loop over any kagome ansatz.

    :param energy_f: ``(state, env) -> scalar`` (differentiable)
    :return: ``(final_energy, final_state, final_env, history)``
    """
    chi = cfg.main.chi
    params0 = state0.get_parameters()

    def make_state(params):
        return state0.set_parameters(params)

    def converge(params):
        st = make_state(params)
        env = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env, _ = run(st, env, cfg.ctm)
        return st, env

    def loss_ng(params):
        st, env = converge(params)
        return energy_f(st, env)

    def loss_fn(params):
        st = make_state(params)
        env0 = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env = converge_env_generic(dict(st.sites), env0, st, cfg.ctm)
        return energy_f(st, env)

    outfile = cfg.main.out_prefix + "_state.json"

    def best_writer(params, loss):
        write_state(make_state(params), outfile)

    def obs_cb(params, ctx):
        line = [f"{ctx['epoch']}", f"{ctx['loss']:.12f}"]
        if obs_f is not None:
            st, env = converge(params)
            values, labels = obs_f(st, env)
            line += [str(v) for v in values]
        print(", ".join(line))

    params, history = optimize_state(
        params0, loss_fn, cfg=cfg, loss_fn_linesearch=loss_ng,
        obs_fn=obs_cb, best_state_writer=best_writer,
        checkpoint_file=cfg.main.out_prefix + "_checkpoint.p",
        opt_resume=cfg.main.opt_resume,
    )
    st, env = converge(params)
    e = float(energy_f(st, env))
    if obs_f is not None:
        values, labels = obs_f(st, env)
        print(", ".join(["epoch", "energy"] + labels))
        print(", ".join(["FINAL", f"{e}"] + [str(v) for v in values]))
    else:
        print(f"FINAL {e}")
    return e, st, env, history
