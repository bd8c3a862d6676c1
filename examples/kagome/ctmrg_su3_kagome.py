"""Observables of the SU(3) kagome model from a stored iPESS state
(counterpart of reference examples/kagome/ctmrg_su3_kagome.py):

    python examples/kagome/ctmrg_su3_kagome.py \\
        --instate <state.json> --ansatz IPESS --chi 18 --phi 0.5
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import unittest

import numpy as np

import tpeps  # noqa: F401
import jax.numpy as jnp

from tpeps.config import get_args_parser, configure
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipess_kagome import read_ipess_kagome_generic, read_ipess_kagome_pg
from tpeps.models.su3_kagome import KAGOME_SU3

parser = get_args_parser()
parser.add_argument("--phi", type=float, default=0.5,
                    help="angle in units of pi: J=cos(phi pi), K=sin(phi pi)cos(theta pi)")
parser.add_argument("--theta", type=float, default=0.0)
parser.add_argument("--ansatz", default="IPESS",
                    choices=["IPESS", "IPESS_PG", "A_1,B", "A_2,B"])
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    j = float(np.round(np.cos(np.pi * args.phi), 12))
    k = float(np.round(np.sin(np.pi * args.phi) * np.cos(np.pi * args.theta), 12))
    h = float(np.round(np.sin(np.pi * args.phi) * np.sin(np.pi * args.theta), 12))
    model = KAGOME_SU3(phys_dim=3, j=j, k=k, h=h)

    if args.ansatz == "IPESS":
        state = read_ipess_kagome_generic(cfg.main.instate)
    else:
        state = read_ipess_kagome_pg(cfg.main.instate)

    env = init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, _ = run(state, env, cfg.ctm)

    e_dn, e_up = model.energy_triangles_2x2subsystem(state, env)
    e = float((e_dn + e_up) / 3.0)
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print("FINAL " + ", ".join([f"{e}"] + [str(complex(v).real) for v in obs_values]))
    return e, obs_values, obs_labels


if __name__ == "__main__":
    if len(unknown_args) > 0:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgSU3AKLT(unittest.TestCase):
    """Golden (reference examples/kagome/ctmrg_su3_kagome.py:252-305):
    all three stored AKLT ansatze give E/site = -2/3 with vanishing
    observables at the AKLT point phi=0.5."""

    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")
    ANSATZE = [("IPESS", "AKLT_SU3_KAGOME_D3_IPESS_state.json"),
               ("IPESS_PG", "AKLT_SU3_KAGOME_D3_IPESS_PG_state.json"),
               ("A_2,B", "AKLT_SU3_KAGOME_D3_A2B_state.json")]

    def test_ctmrg_su3_aklt_ansatze(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if not os.path.isdir(os.path.join(self.REF, "test-input")):
            self.skipTest("reference test-input not available")
        for ansatz, f in self.ANSATZE:
            with self.subTest(ansatz=ansatz):
                args.ansatz = ansatz
                args.instate = os.path.join(self.REF, "test-input", f)
                args.chi = 18
                args.phi = 0.5
                args.bond_dim = 3
                args.CTMARGS_ctm_max_iter = 100
                e, obs, labels = main()
                self.assertAlmostEqual(e, -2.0 / 3, delta=1e-6)
                for l, v in zip(labels, obs):
                    self.assertLess(abs(complex(v).real), 1e-6, l)
