"""Imaginary-time (3-site iTEBD / simple-update) evolution of a U(1)
kagome iPESS (counterpart of reference
examples/kagome/abelian/SU_kagome_spin_half_u1.py):

    python examples/kagome/abelian/SU_kagome_spin_half_u1.py \\
        --instate <abelian_ipess_state.json> --bond_dim 3 --chi 27 \\
        --SU_schedule "[[0.5,10],[0.1,20],[0.05,10]]"

Every stage of ``--SU_schedule`` is a ``[dt, n_steps]`` pair; the
triangle gates are applied with the block-sparse HOSVD re-splitting of
tpeps/itevol/itebd_kagome_abelian.py, so the U(1) structure survives
the whole evolution.  CTM observables are measured every
``--SU_ctm_obs_freq`` stages (0 = never, -1 = only at the end).
"""

import ast
import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..", "..")))

import tpeps  # noqa: F401
import jax.numpy as jnp
import numpy as np

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_a
from tpeps.ctm.generic_abelian import env as env_a
from tpeps.groups import su2
from tpeps.ipeps.ipess_kagome_abelian import (
    IPESS_KAGOME_ABELIAN,
    read_ipess_kagome_abelian,
    write_ipess_kagome_abelian,
)
from tpeps.itevol.itebd_kagome_abelian import init_lambdas_abelian, itebd
from tpeps.models.abelian.kagome_u1 import KAGOME_U1

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--SU_schedule", type=str,
                    default="[[0.5,10],[0.1,20],[0.05,10],[0.01,1]]")
parser.add_argument("--SU_ctm_obs_freq", type=int, default=0)
args, unknown_args = parser.parse_known_args()


def heisenberg_h3(j1):
    s2 = su2.SU2(2)
    SS = (jnp.kron(s2.SZ(), s2.SZ())
          + 0.5 * (jnp.kron(s2.SP(), s2.SM()) + jnp.kron(s2.SM(), s2.SP())))
    I2 = jnp.eye(2)
    SS13 = (jnp.kron(jnp.kron(s2.SZ(), I2), s2.SZ())
            + 0.5 * (jnp.kron(jnp.kron(s2.SP(), I2), s2.SM())
                     + jnp.kron(jnp.kron(s2.SM(), I2), s2.SP())))
    return j1 * (jnp.kron(SS, I2) + jnp.kron(I2, SS) + SS13)


def main():
    cfg = configure(args)
    model = KAGOME_U1(j1=args.j1)
    if cfg.main.instate is None:
        raise ValueError("--instate is required (as in the reference example)")
    state = read_ipess_kagome_abelian(cfg.main.instate)
    td = dict(state.ipess_tensors[(0, 0)])
    if cfg.main.instate_noise:
        rng = np.random.RandomState(cfg.main.seed)
        for k, t in td.items():
            blocks = {q: np.asarray(b) + cfg.main.instate_noise
                      * (rng.rand(*np.asarray(b).shape) - 0.5)
                      for q, b in t.blocks.items()}
            td[k] = t.copy_with(blocks)
    lam = init_lambdas_abelian(td)
    h3 = heisenberg_h3(args.j1)

    def measure(td):
        st = IPESS_KAGOME_ABELIAN(state.sym, dict(td))
        fused = st.fused()
        env = env_a.init_env(fused, cfg.main.chi)
        env, _ = ctmrg_a.run(fused, env, cfg.ctm)
        return float(model.energy_per_site(st, env)), st, env

    schedule = ast.literal_eval(args.SU_schedule)
    print("stage, dt, n_steps, energy")
    for i, (dt, n) in enumerate(schedule):
        td, lam = itebd(td, lam, h3, n * dt, dt, cfg.main.bond_dim,
                        sym=state.sym)
        if args.SU_ctm_obs_freq > 0 and (i + 1) % args.SU_ctm_obs_freq == 0:
            e, _, _ = measure(td)
            print(f"{i}, {dt}, {n}, {e}")

    e, st, env = measure(td)
    write_ipess_kagome_abelian(st, cfg.main.out_prefix + "_state.json")
    obs_values, obs_labels = model.eval_obs(st, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestSUKagomeU1(unittest.TestCase):
    """SU evolution of the NOISE-perturbed committed U(1) RVB D=3
    state: the NN-RVB is a numerical fixed point of the D=3 3-site
    simple update (verified against the dense engine), so the
    meaningful assertion is noise HEALING — the evolution must recover
    most of the noise-induced energy loss while preserving the U(1)
    block structure end to end."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"), "test-input",
        "abelian", "IPESS_KAGOME_RVB_D3_abelian-U1_state.json")

    def test_su_kagome_rvb_u1(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isfile(self.STATE):
            self.skipTest("reference test-input not available")
        args.instate = self.STATE
        args.instate_noise = 0.3
        args.seed = 7
        args.j1 = 1.0
        args.bond_dim = 3
        args.chi = 18
        args.SU_schedule = "[[0.5,6],[0.2,6],[0.1,6]]"
        args.SU_ctm_obs_freq = 0
        args.out_prefix = "/tmp/RESULT_su_kagome_u1"
        args.CTMARGS_ctm_max_iter = 60
        args.CTMARGS_ctm_conv_tol = 1e-8
        e = main()
        # noisy start is ~-0.3915; healing brings it back to ~-0.3924
        assert e < -0.392, e
        # round-trip of the evolved abelian state
        st2 = read_ipess_kagome_abelian("/tmp/RESULT_su_kagome_u1_state.json")
        a = st2.site7((0, 0))
        assert a.blocks, "evolved state lost its block structure"
