"""Shared wiring for the SU(2)-invariant C4v linear-combination (LC)
example family (reference examples/su2_c4v/*, 10 scripts).

Each script optimizes or measures an :class:`IPEPS_LC_1SITE_PG` whose
elementary tensors are the SU(2)-singlet C4v-A1 basis generated
programmatically by :mod:`tpeps.su2sym.gen` (the reference parses the
committed classification tables su2sym/D{3,5,7,9}.txt); the variational
parameters are the basis coefficients.  This module factors the shared
basis/state construction and the loss closures; the scripts differ only
in the gradient engine (AD / finite differences / mesh-parallel FD) and
in the energy entry point (lowmem vs tiled RDMs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpeps.ctm.c4v.ctmrg import converge_env, run_fixed_point
from tpeps.ctm.c4v.env import init_env
from tpeps.ipeps.ipeps_lc import IPEPS_LC_1SITE_PG, read_ipeps_lc_1site_pg
from tpeps.su2sym.gen import import_sym_tensors

PG_LC = {"A1": "A_1", "A2": "A_2", "B1": "B_1", "B2": "B_2"}


def build_basis(cfg, pg: str = "A1"):
    """SU(2)-singlet elementary-tensor basis for the configured D."""
    D = cfg.main.bond_dim
    elem = [({"meta": {"pg": PG_LC[pg]}}, t.astype(cfg.global_args.jnp_dtype))
            for meta, t in import_sym_tensors(2, D, pg=pg)]
    print(f"SU(2) {pg} basis size: {len(elem)} (D={D})")
    return elem


def init_coeffs(cfg, elem):
    """Initial coefficient vector from --instate or random."""
    if cfg.main.instate is not None:
        state = read_ipeps_lc_1site_pg(cfg.main.instate)
        c0 = state.coeffs[(0, 0)]
        if cfg.main.instate_noise:
            rng = np.random.RandomState(cfg.main.seed)
            c0 = c0 + cfg.main.instate_noise * jnp.asarray(
                rng.rand(c0.shape[0]) - 0.5)
        return c0
    rng = np.random.RandomState(cfg.main.seed)
    return jnp.asarray(rng.rand(len(elem)) - 0.5)


def site_of_coeffs(elem, c):
    st = IPEPS_LC_1SITE_PG(elem, {(0, 0): c})
    a = st.site((0, 0))
    return a / jnp.linalg.norm(a)


def make_loss(cfg, energy_f, elem, differentiable: bool = False):
    """``params -> energy`` closure over the C4v engine.

    ``differentiable=True`` converges through
    :func:`tpeps.ctm.c4v.ctmrg.converge_env` (implicit fixed-point or
    checkpointed-scan gradients per ``ctm_cfg.grad_mode``);
    ``False`` uses the no-grad on-device while_loop (for FD and line
    searches)."""
    chi, ctm_cfg = cfg.main.chi, cfg.ctm

    def loss_fn(params):
        a = site_of_coeffs(elem, params["c"])
        env0 = init_env(jax.lax.stop_gradient(a), chi,
                        ctm_cfg.ctm_env_init_type)
        if differentiable:
            env = converge_env(a, env0, ctm_cfg)
        else:
            env, *_ = run_fixed_point(
                a=a, env=env0, max_iter=ctm_cfg.ctm_max_iter,
                conv_tol=ctm_cfg.ctm_conv_tol)
        return energy_f(a, env)

    return loss_fn


def finalize(cfg, model, energy_f, elem, params):
    """Write the final state and print the FINAL observable line."""
    st = IPEPS_LC_1SITE_PG(elem, {(0, 0): params["c"]})
    st.write_to_file(cfg.main.out_prefix + "_state.json")
    a = site_of_coeffs(elem, params["c"])
    env0 = init_env(a, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, *_ = run_fixed_point(a=a, env=env0, max_iter=cfg.ctm.ctm_max_iter,
                              conv_tol=cfg.ctm.ctm_conv_tol)
    e_fin = float(energy_f(a, env))
    obs_values, obs_labels = model.eval_obs(a, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e_fin}"] + [str(v) for v in obs_values]))
    return e_fin
