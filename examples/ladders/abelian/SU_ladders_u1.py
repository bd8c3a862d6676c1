"""Imaginary-time (simple-update) evolution of a U(1) coupled-ladders
state (counterpart of reference
examples/ladders/abelian/SU_ladders_u1.py):

    python examples/ladders/abelian/SU_ladders_u1.py \\
        --instate <abelian_state.json> --alpha 0.1 --bond_dim 3 --chi 24 \\
        --SU_policy ADAPTIVE --SU_init_step 0.1 --opt_max_iter 100

ADAPTIVE policy: measure the CTM energy every ``--SU_ctm_obs_freq``
sweeps and multiply the time step by ``--SU_adaptive_slowdown_factor``
whenever the energy increases; stop when the step falls below
``--SU_stop_cond`` or the energy improvement drops below
``--SU_min_energy_diff``.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401
import jax.numpy as jnp

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_a
from tpeps.ctm.generic_abelian import env as env_a
from tpeps.groups import su2
from tpeps.itevol.su_abelian import IPEPS_ABELIAN_WEIGHTED, gate_from_hamiltonian, run_seq_2s
from tpeps.models.abelian.coupledLadders import COUPLEDLADDERS_ABELIAN
from tpeps.sym.io import read_ipeps_abelian, write_ipeps_abelian

parser = get_args_parser()
parser.add_argument("--alpha", type=float, default=0.0)
parser.add_argument("--SU_policy", type=str, default="ADAPTIVE",
                    choices=["ADAPTIVE", "REGULAR"])
parser.add_argument("--SU_init_step", type=float, default=0.1)
parser.add_argument("--SU_ctm_obs_freq", type=int, default=1,
                    help="CTM energy measurement frequency (sweeps)")
parser.add_argument("--SU_adaptive_slowdown_factor", type=float, default=0.5)
parser.add_argument("--SU_stop_cond", type=float, default=1.0e-6)
parser.add_argument("--SU_min_energy_diff", type=float, default=1.0e-8)
args, unknown_args = parser.parse_known_args()


def ladder_bonds(state, alpha):
    """(bond, coupling) for the 2x2 ABCD ladders cell: all horizontal
    bonds at J=1 (legs), vertical bonds at 1 on even rows (rungs) and
    alpha on odd rows (inter-ladder)."""
    out = []
    for coord in state.sites:
        out.append(((coord, (1, 0), (coord[0] + 1, coord[1])), 1.0))
        j_v = 1.0 if coord[1] % 2 == 0 else alpha
        out.append(((coord, (0, 1), (coord[0], coord[1] + 1)), j_v))
    return out


def main():
    cfg = configure(args)
    model = COUPLEDLADDERS_ABELIAN(alpha=args.alpha)

    if cfg.main.instate is None:
        raise ValueError("--instate is required (as in the reference example)")
    base = read_ipeps_abelian(cfg.main.instate)
    if next(iter(base.sites.values())).signature == (-1, -1, -1, 1, 1):
        # normalize the stored convention to the SU module's
        # (1, 1, 1, -1, -1) by the global flip isomorphism (both ends
        # of every bond flip together; the gate is built on the
        # flipped physical leg)
        from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN as _IA

        base = _IA(base.sym,
                   {c: a.flip_charges((0, 1, 2, 3, 4))
                    for c, a in base.sites.items()},
                   vertexToSite=base.vertexToSite, lX=base.lX, lY=base.lY)
    state = IPEPS_ABELIAN_WEIGHTED(state=base)
    phys = next(iter(state.sites.values())).legs[0]
    SS = su2.SU2(2).SS()

    def measure(st):
        flat = st.absorb_weights()
        env = env_a.init_env(flat, cfg.main.chi)
        env, _ = ctmrg_a.run(flat, env, cfg.ctm)
        return float(model.energy_2x1_1x2(flat, env)), flat

    tau = args.SU_init_step
    e_prev, _ = measure(state)
    beta = 0.0
    print("epoch, beta, time_step, energy")
    print(f"-1, 0, 0, {e_prev}")
    for sweep in range(cfg.main.opt_max_iter):
        gates = []
        for bond, j in ladder_bonds(state, args.alpha):
            if j == 0.0:
                continue
            gates.append((bond, gate_from_hamiltonian(j * SS, tau, phys,
                                                      state.sym)))
        state = run_seq_2s(state, gates, max_D=cfg.main.bond_dim)
        beta += tau
        if args.SU_policy == "REGULAR" or \
                (sweep + 1) % max(args.SU_ctm_obs_freq, 1) != 0:
            continue
        e_curr, flat = measure(state)
        print(f"{sweep}, {beta}, {tau}, {e_curr}")
        if e_curr > e_prev and args.SU_policy == "ADAPTIVE":
            tau *= args.SU_adaptive_slowdown_factor
            if tau < args.SU_stop_cond:
                break
        elif abs(e_curr - e_prev) < args.SU_min_energy_diff:
            break
        e_prev = min(e_prev, e_curr)

    e_fin, flat = measure(state)
    write_ipeps_abelian(flat, cfg.main.out_prefix + "_state.json")
    obs_values, obs_labels = model.eval_obs(
        flat, ctmrg_a.run(flat, env_a.init_env(flat, cfg.main.chi), cfg.ctm)[0])
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e_fin}"] + [str(v) for v in obs_values]))
    return e_fin


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestSULaddersU1(unittest.TestCase):
    """A few adaptive SU sweeps on the committed D=2 alpha=0.1 state
    must keep the state in its energy basin (SU from a converged state
    cannot improve much, but must not blow up) and preserve the U(1)
    block structure."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "ABU1_BFGS100LS_D2-chi24-a0.1-run0-svd8_i2SUVBSn0_state.json")

    def test_su_ladders_u1_d2(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.alpha = 0.1
        args.bond_dim = 2
        args.chi = 16
        args.SU_init_step = 0.05
        args.SU_ctm_obs_freq = 2
        args.opt_max_iter = 4
        args.out_prefix = "/tmp/RESULT_su_ladders_u1"
        args.CTMARGS_ctm_max_iter = 60
        args.CTMARGS_ctm_conv_tol = 1e-8
        e = main()
        assert e < -0.40, e
