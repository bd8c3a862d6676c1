"""J1-J2 ground-state optimization of the SU(2)-invariant bipartite
site+bond linear-combination ansatz IPEPS_LC_BP (counterpart of
reference examples/su2_c4v/optim_j1j2_su2_bp.py):

    python examples/su2_c4v/optim_j1j2_su2_bp.py --bond_dim 3 --chi 27

The variational parameters are the coefficients of the SU(2)-singlet
C4v-A1 site tensors plus the coefficients of the SU(2)-invariant bond
bilinear forms; sublattice B is A dressed by the variational bond
operator on all four legs (tpeps/ipeps/ipeps_lc_bp.py).  The reference
optimizes with serial finite differences (optim/fd_optim_lbfgs_mod.py);
here the FD displacement wave over both coefficient vectors is
vmap-batched on the device.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.ctmrg import converge_env_generic, run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps_lc_bp import IPEPS_LC_BP, read_ipeps_lc_bp
from tpeps.models import j1j2
from tpeps.optim.fd import optimize_state_fd
from tpeps.su2sym.gen import import_sym_bonds, import_sym_tensors

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def build_bases(cfg):
    D = cfg.main.bond_dim
    dt = cfg.global_args.jnp_dtype
    elem = {
        "site": [({"meta": {"pg": "A_1"}}, t.astype(dt))
                 for meta, t in import_sym_tensors(2, D, pg="A1")],
        "bond": [(meta, g.astype(dt))
                 for meta, g in import_sym_bonds(D)],
    }
    print(f"SU(2) A1 site basis: {len(elem['site'])}, "
          f"bond basis: {len(elem['bond'])} (D={D})")
    return elem


def main():
    cfg = configure(args)
    chi = cfg.main.chi
    model = j1j2.J1J2(j1=args.j1, j2=args.j2, dtype=cfg.global_args.jnp_dtype)
    elem = build_bases(cfg)

    if cfg.main.instate is not None:
        state = read_ipeps_lc_bp(cfg.main.instate)
        elem, params = state.elem_tensors, dict(state.coeffs)
    else:
        rng = np.random.RandomState(cfg.main.seed)
        c_A = jnp.asarray(rng.rand(len(elem["site"])))
        c_b = jnp.asarray(rng.rand(len(elem["bond"])))
        params = {"site": c_A / jnp.abs(c_A).max(),
                  "bond": c_b / jnp.abs(c_b).max()}

    def loss_fn(params):
        # the FD displacement wave jits this closure, so the environment
        # must converge in-graph: the implicit while_loop fixed point
        st = IPEPS_LC_BP(elem, params)
        env0 = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env = converge_env_generic(dict(st.sites), env0, st, cfg.ctm)
        return model.energy_2x2_2site(st, env)

    params, history = optimize_state_fd(params, loss_fn, cfg=cfg)

    st = IPEPS_LC_BP(elem, params)
    st.write_to_file(cfg.main.out_prefix + "_state.json")
    env0 = init_env(st, chi, cfg.ctm.ctm_env_init_type)
    env, _ = run(st, env0, cfg.ctm)
    e = float(model.energy_2x2_2site(st, env))
    obs_values, obs_labels = model.eval_obs(st, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptimSU2BP(unittest.TestCase):
    """Short D=3 FD optimization of the site+bond family: starting from
    the uniform-positive init, a few L-BFGS steps must reach at least
    the single-tensor A1-family landscape (e < -0.55; the bond dressing
    can only improve on the pure-A case once optimized further)."""

    def test_opt_su2_bp_d3(self):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        args.bond_dim = 3
        args.chi = 16
        args.j2 = 0.0
        args.seed = 4
        args.opt_max_iter = 6
        args.out_prefix = "RESULT_test_su2bp"
        e = main()
        assert e < -0.55, e
        f = args.out_prefix + "_state.json"
        if os.path.exists(f):
            os.remove(f)
