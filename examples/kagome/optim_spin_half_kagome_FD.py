"""Spin-1/2 kagome Heisenberg optimization with FINITE-DIFFERENCE
gradients over the iPESS ansatz zoo (counterpart of reference
examples/kagome/optim_spin_half_kagome_FD.py, which evaluates the
displacements serially under torch.no_grad; here the displacement wave
over all elementary-tensor entries is vmap-batched on the device):

    python examples/kagome/optim_spin_half_kagome_FD.py --ansatz IPESS \\
        --bond_dim 2 --chi 16
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401

from kagome_common import ANSATZE, init_state, write_state  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic.ctmrg import converge_env_generic, run
from tpeps.ctm.generic.env import init_env
from tpeps.models.spin_half_kagome import S_HALF_KAGOME
from tpeps.optim.fd import optimize_state_fd

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--JD", type=float, default=0.0)
parser.add_argument("--jtrip", type=float, default=0.0)
parser.add_argument("--ansatz", default="IPESS", choices=ANSATZE)
parser.add_argument("--no_sym_up_dn", action="store_false", dest="sym_up_dn")
parser.add_argument("--no_sym_bonds", action="store_false", dest="sym_bond_S")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    chi = cfg.main.chi
    model = S_HALF_KAGOME(j1=args.j1, JD=args.JD, jtrip=args.jtrip,
                          dtype=cfg.global_args.jnp_dtype)
    state0 = init_state(cfg, args.ansatz, 2, sym_up_dn=args.sym_up_dn,
                        sym_bond_S=args.sym_bond_S)
    params0 = state0.get_parameters()

    def loss_fn(params):
        # jitted by the FD wave: the environment converges in-graph
        st = state0.set_parameters(params)
        env0 = init_env(st, chi, cfg.ctm.ctm_env_init_type)
        env = converge_env_generic(dict(st.sites), env0, st, cfg.ctm)
        return model.energy_per_site(st, env)

    params, history = optimize_state_fd(params0, loss_fn, cfg=cfg)

    st = state0.set_parameters(params)
    write_state(st, cfg.main.out_prefix + "_state.json")
    env0 = init_env(st, chi, cfg.ctm.ctm_env_init_type)
    env, _ = run(st, env0, cfg.ctm)
    e = float(model.energy_per_site(st, env))
    obs_values, obs_labels = model.eval_obs(st, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptKagomeFD(unittest.TestCase):
    def test_small_opt_fd(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.ansatz = "IPESS"
        args.instate = None
        args.j1 = 1.0
        args.bond_dim = 2
        args.chi = 8
        args.opt_max_iter = 3
        args.seed = 7
        args.out_prefix = "/tmp/RESULT_kagome_fd_test"
        args.CTMARGS_ctm_max_iter = 30
        e = main()
        assert e < -0.1, e
