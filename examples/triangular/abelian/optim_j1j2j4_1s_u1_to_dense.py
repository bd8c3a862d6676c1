"""Optimize the constrained 1-site triangular ansatz with the DENSE
engine: the U(1) C4v instate fixes the starting point, the Neel
partner is generated densely inside the loss (counterpart of reference
examples/triangular/abelian/optim_j1j2j4_1s_u1_to_dense.py):

    python examples/triangular/abelian/optim_j1j2j4_1s_u1_to_dense.py \\
        --instate <abelian_c4v_state.json> --chi 24
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.ctmrg import converge_env_generic, run
from tpeps.ctm.generic.env import init_env
from tpeps.groups import su2
from tpeps.ipeps.ipeps import IPEPS, write_ipeps
from tpeps.models.spin_triangular import J1J2J4
from tpeps.optim.driver import optimize_state
from tpeps.sym.io import read_ipeps_abelian_c4v

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--j4", type=float, default=0.0)
args, unknown_args = parser.parse_known_args()


def bipartite(coord):
    return ((coord[0] + coord[1]) % 2, 0)


def main():
    cfg = configure(args)
    chi = cfg.main.chi
    if cfg.main.instate is None:
        raise ValueError("--instate is required (as in the reference example)")
    A0 = read_ipeps_abelian_c4v(cfg.main.instate).site((0, 0)).to_dense()
    model = J1J2J4(j1=args.j1, j2=args.j2, j4=args.j4, dtype=A0.dtype)
    rot = su2.get_rot_op(A0.shape[0], dtype=A0.dtype)

    def make_state(params):
        a = params["A"]
        a = a / jnp.linalg.norm(a)
        b = jnp.einsum("ij,juldr->iuldr", rot, a)
        return IPEPS({(0, 0): a, (1, 0): b}, vertexToSite=bipartite,
                     lX=2, lY=2)

    def converge(params):
        st = make_state(params)
        env = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env, _ = run(st, env, cfg.ctm)
        return st, env

    def loss_ng(params):
        st, env = converge(params)
        return model.energy_per_site(st, env)

    def loss_fn(params):
        st = make_state(params)
        env0 = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env = converge_env_generic(dict(st.sites), env0, st, cfg.ctm)
        return model.energy_per_site(st, env)

    outfile = cfg.main.out_prefix + "_state.json"

    def best_writer(params, loss):
        write_ipeps(make_state(params), outfile)

    params, history = optimize_state(
        {"A": A0}, loss_fn, cfg=cfg, loss_fn_linesearch=loss_ng,
        best_state_writer=best_writer,
        checkpoint_file=cfg.main.out_prefix + "_checkpoint.p",
        opt_resume=cfg.main.opt_resume,
    )
    st, env = converge(params)
    e = float(model.energy_per_site(st, env))
    obs_values, obs_labels = model.eval_obs(st, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptimTrgl1SU1ToDense(unittest.TestCase):
    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "c4v",
        "BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_blocks_1site_state.json")

    def test_opt_trgl_1s_u1_d3_to_dense(self):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.chi = 16
        args.j1, args.j2 = 1.0, 0.0
        args.opt_max_iter = 4
        args.out_prefix = "/tmp/RESULT_opt_trgl_1s_u1_dense"
        args.CTMARGS_ctm_max_iter = 50
        e = main()
        assert e < -0.3, e
