"""Ground-state optimization of the J1-J2 model with a 1-site C4v iPEPS.

Counterpart of reference examples/j1j2/optim_j1j2_c4v.py (README Ex. 1):

    python examples/j1j2/optim_j1j2_c4v.py --bond_dim 2 --chi 32 --j2 0.3 \\
        --seed 123 --opt_max_iter 100

Gradients cross the CTMRG loop by implicit differentiation of the fixed
point (default) or a checkpointed scan (--CTMARGS_grad_mode scan).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import json
import logging

import numpy as np

import tpeps  # noqa: F401  (x64)
import jax
import jax.numpy as jnp

from tpeps.config import get_args_parser, configure
from tpeps.ctm.c4v.ctmrg import converge_env, run_fixed_point
from tpeps.ctm.c4v.env import init_env
from tpeps.ctm.c4v import transferops as transferops_c4v
from tpeps.ipeps.ipeps_c4v import (
    IPEPS_C4V,
    extend_bond_dim_c4v,
    read_ipeps_c4v,
    symmetrize_c4v,
)
from tpeps.models import j1j2
from tpeps.optim.driver import optimize_state

log = logging.getLogger(__name__)

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0, help="nearest-neighbour coupling")
parser.add_argument("--j2", type=float, default=0.0, help="next nearest-neighbour coupling")
parser.add_argument("--j3", type=float, default=0.0, help="next-to-next nearest-neighbour coupling")
parser.add_argument("--hz_stag", type=float, default=0.0, help="staggered mag. field")
parser.add_argument("--delta_zz", type=float, default=1.0, help="easy-axis NN anisotropy")
parser.add_argument("--top_freq", type=int, default=-1, help="transfer-operator spectrum frequency")
parser.add_argument("--top_n", type=int, default=2, help="number of transfer-operator eigenvalues")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    logging.basicConfig(level=logging.INFO, filename=cfg.main.out_prefix + ".log" if cfg.main.out_prefix != "output" else None)
    chi = cfg.main.chi

    model = j1j2.J1J2_C4V_BIPARTITE(
        j1=args.j1, j2=args.j2, j3=args.j3, hz_stag=args.hz_stag,
        delta_zz=args.delta_zz, dtype=cfg.global_args.jnp_dtype,
    )
    energy_f = model.energy_1x1_lowmem

    # initialize the ipeps
    if cfg.main.instate is not None:
        state = read_ipeps_c4v(cfg.main.instate)
        if cfg.main.bond_dim > max(state.get_aux_bond_dims()):
            state = extend_bond_dim_c4v(state, cfg.main.bond_dim)
        state.add_noise(cfg.main.instate_noise, key=jax.random.PRNGKey(cfg.main.seed))
        A0 = state.site() / jnp.linalg.norm(state.site())
    elif cfg.main.ipeps_init_type == "RANDOM":
        key = jax.random.PRNGKey(cfg.main.seed)
        D = cfg.main.bond_dim
        A0 = jax.random.uniform(key, (model.phys_dim, D, D, D, D), dtype=cfg.global_args.real_dtype)
        if cfg.global_args.is_complex:
            A0 = A0.astype(cfg.global_args.jnp_dtype)
        A0 = A0 / jnp.linalg.norm(A0)
    else:
        raise ValueError("Missing trial state: provide --instate or --ipeps_init_type RANDOM")

    ctm_cfg = cfg.ctm

    def loss_fn(p):
        a = symmetrize_c4v(p, normalize=True)
        env0 = init_env(jax.lax.stop_gradient(a), chi, ctm_cfg.ctm_env_init_type)
        env = converge_env(a, env0, ctm_cfg)
        return energy_f(a, env)

    # line-search evaluations may use a cheaper projector decomposition
    # (reference OPTARGS_line_search_svd_method, ad_optim_lbfgs_mod.py:261-262
    # swaps ctm_args.projector_svd_method during line search); e.g.
    # --line_search_svd_method POWER uses the warm-startable subspace
    # iteration instead of full SYMEIG
    ls_proj = (cfg.opt.line_search_svd_method
               if cfg.opt.line_search_svd_method != "DEFAULT"
               else ctm_cfg.projector_svd_method)
    if ls_proj == "DEFAULT":
        ls_proj = "SYMEIG"

    def loss_fn_ng(p):
        a = symmetrize_c4v(p, normalize=True)
        env0 = init_env(a, chi, ctm_cfg.ctm_env_init_type)
        env, *_ = run_fixed_point(
            a=a, env=env0, max_iter=ctm_cfg.ctm_max_iter,
            conv_tol=ctm_cfg.ctm_conv_tol, projector_method=ls_proj,
        )
        return energy_f(a, env)

    def converge(a):
        env0 = init_env(a, chi, ctm_cfg.ctm_env_init_type)
        env, *_ = run_fixed_point(
            a=a, env=env0, max_iter=ctm_cfg.ctm_max_iter, conv_tol=ctm_cfg.ctm_conv_tol
        )
        return env

    outputstatefile = cfg.main.out_prefix + "_state.json"

    def best_writer(p, loss):
        IPEPS_C4V(symmetrize_c4v(p, normalize=True)).write_to_file(outputstatefile)

    def obs_fn(p, ctx):
        a = symmetrize_c4v(p, normalize=True)
        env = converge(a)
        obs_values, obs_labels = model.eval_obs(a, env)
        if ctx["epoch"] == 0:
            print(", ".join(["epoch", "energy"] + obs_labels))
        print(", ".join([str(ctx["epoch"]), f"{ctx['loss']}"] + [str(v) for v in obs_values]))
        if args.top_freq > 0 and ctx["epoch"] % args.top_freq == 0:
            l = transferops_c4v.get_Top_spec_c4v(args.top_n, a, env)
            print("TOP " + json.dumps({"re": [float(x) for x in l[:, 0]],
                                       "im": [float(x) for x in l[:, 1]]}))

    params, history = optimize_state(
        A0, loss_fn, cfg=cfg, loss_fn_linesearch=loss_fn_ng, obs_fn=obs_fn,
        best_state_writer=best_writer,
        checkpoint_file=cfg.main.out_prefix + "_checkpoint.p",
        opt_resume=cfg.main.opt_resume,
    )

    # final observables from the best stored state
    state = read_ipeps_c4v(outputstatefile)
    a = state.site()
    env = converge(a)
    e_fin = float(energy_f(a, env))
    obs_values, obs_labels = model.eval_obs(a, env)
    print(", ".join([f"{cfg.main.opt_max_iter}", f"{e_fin}"] + [str(v) for v in obs_values]))


if __name__ == "__main__":
    if len(unknown_args) > 0:
        print("args not recognized: " + str(unknown_args))
        raise Exception("Unknown command line arguments")
    main()
