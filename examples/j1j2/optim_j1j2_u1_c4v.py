"""Ground-state optimization of J1-J2 with a U(1)-classified
linear-combination C4v ansatz (counterpart of reference
examples/j1j2/optim_j1j2_u1_c4v.py, README Ex. 3):

    python examples/j1j2/optim_j1j2_u1_c4v.py --bond_dim 3 --chi 27 --j2 0.0

The variational parameters are the real coefficients of C4v-A_1
U(1)-filtered elementary tensors generated programmatically
(tpeps/u1sym/basis.py); gradients are vmap-batched finite differences
over the coefficient vector (the reference distributes per-coefficient
loss evaluations over gloo workers; here one batched device program).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import logging
import unittest

import numpy as np

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp

from tpeps.config import get_args_parser, configure
from tpeps.ctm.c4v.ctmrg import run_fixed_point
from tpeps.ctm.c4v.env import init_env
from tpeps.ipeps.ipeps_lc import IPEPS_LC_1SITE_PG, read_ipeps_lc_1site_pg
from tpeps.models import j1j2
from tpeps.optim.fd import optimize_state_fd
from tpeps.u1sym.basis import generate_a_basis

log = logging.getLogger(__name__)

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--u1_charges", type=str, default=None,
                    help="comma-separated d+D charges, e.g. '1,-1,0,2,0'")
parser.add_argument("--u1_total_charge", type=int, default=1)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    chi, D = cfg.main.chi, cfg.main.bond_dim

    model = j1j2.J1J2_C4V_BIPARTITE(j1=args.j1, j2=args.j2,
                                    dtype=cfg.global_args.jnp_dtype)

    if args.u1_charges is not None:
        charges = tuple(int(x) for x in args.u1_charges.split(","))
    elif D == 3:
        charges = (1, -1, 0, 2, 0)  # the reference's D3_U1_B class
    else:
        charges = None
    basis = generate_a_basis(2, D, u1_charges=charges,
                             u1_total_charge=args.u1_total_charge if charges else 0)
    elem = [({"meta": {"pg": "A_1"}}, t.astype(cfg.global_args.jnp_dtype))
            for t in basis]
    print(f"U(1) basis size: {len(elem)} (D={D}, charges={charges})")

    if cfg.main.instate is not None:
        state = read_ipeps_lc_1site_pg(cfg.main.instate)
        c0 = state.coeffs[(0, 0)]
    else:
        rng = np.random.RandomState(cfg.main.seed)
        c0 = jnp.asarray(rng.rand(len(elem)) - 0.5)

    ctm_cfg = cfg.ctm

    def loss_fn(params):
        st = IPEPS_LC_1SITE_PG(elem, {(0, 0): params["c"]})
        a = st.site((0, 0))
        a = a / jnp.linalg.norm(a)
        env0 = init_env(a, chi, ctm_cfg.ctm_env_init_type)
        env, *_ = run_fixed_point(
            a=a, env=env0, max_iter=ctm_cfg.ctm_max_iter,
            conv_tol=ctm_cfg.ctm_conv_tol)
        return model.energy_1x1_lowmem(a, env)

    params, history = optimize_state_fd(
        {"c": c0}, loss_fn, cfg=cfg)

    st = IPEPS_LC_1SITE_PG(elem, {(0, 0): params["c"]})
    outputstatefile = cfg.main.out_prefix + "_state.json"
    st.write_to_file(outputstatefile)
    e_fin = float(loss_fn(params))
    print(f"FINAL {e_fin}")
    return e_fin


if __name__ == "__main__":
    if len(unknown_args) > 0:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptimU1LC(unittest.TestCase):
    """Smoke: a few FD-LBFGS epochs on the D=2 A_1 basis lower the
    energy below the product-state value."""

    def test_opt_u1_lc_d2(self):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        args.bond_dim = 2
        args.chi = 16
        args.j2 = 0.0
        args.u1_charges = None
        args.opt_max_iter = 6
        args.seed = 3
        args.out_prefix = "RESULT_test_u1lc"
        e = main()
        assert e < -0.55, e
        for suffix in ("_state.json",):
            f = args.out_prefix + suffix
            if os.path.exists(f):
                os.remove(f)
