"""Entanglement (edge) spectra of width-L cylinders from CTM boundary
MPOs (counterpart of reference examples/honeycomb/edge_spec_compress.py).

The reference variationally compresses the product of environment-T
MPO chains to reach large L on yastn block-sparse tensors; here the
same physics is reached TPU-natively by applying the sigma_L.sigma_R
chain LAZILY as a matvec on a D^L vector inside an Arnoldi iteration
(tpeps/ctm/generic/transferops.py:get_EH_spec_Ttensor) — the D^L x D^L
operator is never materialized, which plays the same memory-compression
role as the reference's MPO truncation.  --EH_T_ED_L switches to the
fully dense diagonalization (get_full_EH_spec_Ttensor) for small L as
an exactness check.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic import transferops
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import read_ipeps

parser = get_args_parser()
parser.add_argument("--EH_n", type=int, default=8,
                    help="number of leading exp(-H_ent) eigenvalues")
parser.add_argument("--EH_L", type=int, default=3, help="cylinder width")
parser.add_argument("--EH_T_ED_L", type=int, default=0,
                    help="max width for FULL dense diagonalization")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    state = read_ipeps(cfg.main.instate)
    env = init_env(state, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, _ = run(state, env, cfg.ctm)

    out = {}
    L = args.EH_L
    if L <= args.EH_T_ED_L:
        spec = transferops.get_full_EH_spec_Ttensor(
            L, (0, 0), (1, 0), state, env)
        spec = np.asarray(spec)[: args.EH_n]
        out["dense"] = spec
        print(f"EH dense L={L}: {spec}")
    spec_it = np.asarray(transferops.get_EH_spec_Ttensor(
        args.EH_n, L, (0, 0), (1, 0), state, env))
    out["lazy"] = spec_it
    print(f"EH lazy  L={L}:")
    for i in range(spec_it.shape[0]):
        print(f"{i} {spec_it[i, 0]} {spec_it[i, 1]}")
    return out


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestEdgeSpec(unittest.TestCase):
    """Lazy matvec spectrum must agree with the dense diagonalization
    at small L (the compressed-vs-exact consistency the reference
    script checks by construction)."""

    REF = os.environ.get("TPEPS_REFERENCE", "/root/reference")

    def test_edge_spec_rvb(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        f = os.path.join(self.REF, "test-input", "RVB_1x1.in")
        if not os.path.exists(f):
            self.skipTest("reference test-input not available")
        args.instate = f
        args.chi = 16
        args.EH_n = 4
        args.EH_L = 2
        args.EH_T_ED_L = 2
        args.CTMARGS_ctm_max_iter = 120
        out = main()
        lazy = out["lazy"]
        dense = out["dense"]
        lead_lazy = lazy[:, 0] + 1j * lazy[:, 1]
        self.assertTrue(np.isfinite(lead_lazy).all())
        for k in range(min(len(dense), len(lead_lazy))):
            self.assertLess(abs(abs(dense[k]) - abs(lead_lazy[k])), 1e-6)
