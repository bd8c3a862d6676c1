"""Fermionic two-point correlation functions of a honeycomb t-V state
at distance (counterpart of reference examples/honeycomb/corr.py).

The reference threads yastn swap gates through the growing CTM edge
(ctm/generic_abelian/corrf_fermionic.py); here the sign structure is
pre-solved into sign-dressed bosonic double tensors with explicit
string legs for parity-odd operators
(tpeps/ctm/generic/dl_fermi.py:corrf_1sO1sO_h — exactness certified at
r = 1..4 against the Grassmann oracle, tests/test_fermionic_dl.py).

Measures <c^dag_A(0) c_B(r)> (parity-odd, with strings) and the
density-density correlator <n_A(0) n_B(r)> (parity-even) on a stored
U(1) PepsAD honeycomb state.

``--engine abelian`` evaluates the same correlators fully block-sparse:
the environment is converged on the sign-dressed double layer by
:func:`tpeps.ctm.generic_abelian.ctmrg_dl.run_fermionic` (NOT the
bosonic abelian engine, whose fixed point is the wrong transfer
operator for fermionic observables — PARITY.md round-4 root cause) and
the correlator runs on block-sparse edges
(tpeps/ctm/generic_abelian/corrf_fermionic.py).  The two engines agree
at machine precision; see TestCorrCI.test_engines_agree.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import tpeps  # noqa: F401
from tpeps.config import configure, get_args_parser
from tpeps.models.fermion.tv_model import TVModel
from tpeps.sym.io import read_peps_ad

parser = get_args_parser()
parser.add_argument("--dist", type=int, default=4,
                    help="maximal correlation distance")
parser.add_argument("--engine", type=str, default="dl",
                    choices=("dl", "abelian"),
                    help="dl: dense sign-dressed double-layer CTM; "
                         "abelian: block-sparse graded env + correlators")
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)

    state = read_peps_ad(cfg.main.instate)
    a = state.site((0, 0))
    model = TVModel(t1=1.0)

    # honeycomb site = (A, B) orbital pair; the model exposes the
    # single-orbital operators in the dense embedding's Fock ordering
    if args.engine == "abelian":
        from tpeps.ctm.generic_abelian.ctmrg_dl import run_fermionic
        from tpeps.ctm.generic_abelian.corrf_fermionic import (
            corrf_1sO1sO_fermionic, op_from_dense)
        from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN

        st = IPEPS_ABELIAN(a.sym, {(0, 0): a})
        env, hist = run_fermionic(st, cfg.main.chi, cfg.ctm)
        Lp = a.legs[0]
        hop = np.asarray(corrf_1sO1sO_fermionic(
            (0, 0), (1, 0), st, env,
            op_from_dense(Lp, model.cB), op_from_dense(Lp, model.cpA),
            args.dist))
        dens = np.asarray(corrf_1sO1sO_fermionic(
            (0, 0), (1, 0), st, env,
            op_from_dense(Lp, model.nB), op_from_dense(Lp, model.nA),
            args.dist))
    else:
        from tpeps.ctm.generic.dl_fermi import corrf_1sO1sO_h

        env, hist = model.converge(a, cfg.main.chi, cfg.ctm)
        hop = np.asarray(corrf_1sO1sO_h(a, env, model.cB, model.cpA, args.dist))
        dens = np.asarray(corrf_1sO1sO_h(a, env, model.nB, model.nA, args.dist))
    print("r, <c+_A c_B>(r), <n_A n_B>(r)")
    for r in range(args.dist):
        print(f"{r + 1}, {hop[r]}, {dens[r]}")
    return hop, dens


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCorrCI(unittest.TestCase):
    """Correlators on the committed CI seed state decay and reproduce
    the regression values of this package's oracle-certified stack."""

    STATE = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"),
        "test-input", "abelian", "CI_D3_1x1_U1_state.json")

    def test_corr_decay(self):
        import jax

        if not os.path.isfile(self.STATE):
            raise unittest.SkipTest("reference test-input not available")
        jax.config.update("jax_platforms", "cpu")
        args.instate = self.STATE
        args.chi = 24
        args.dist = 4
        args.engine = "dl"
        args.CTMARGS_ctm_max_iter = 200
        args.CTMARGS_ctm_conv_tol = 1e-10
        hop, dens = main()
        self.assertTrue(np.isfinite(hop).all() and np.isfinite(dens).all())
        # connected correlations decay with distance on the gapped state
        self.assertGreater(abs(hop[0]), abs(hop[-1]))

    def test_engines_agree(self):
        """Block-sparse graded-env correlators == dense dl_fermi ones on
        the CI state: both engines converge their OWN environment of the
        sign-dressed double layer (PARITY.md round-4/5: an env of the
        bosonic layer was ~7e-3 wrong here).  At chi=24 the D=3 env
        saturates (no truncation) and the two independent fixed points
        agree to machine precision — measured 6e-15; chi=16 still
        truncates and the different truncation bases leave ~7e-7."""
        import jax

        if not os.path.isfile(self.STATE):
            raise unittest.SkipTest("reference test-input not available")
        jax.config.update("jax_platforms", "cpu")
        args.instate = self.STATE
        args.chi = 24
        args.dist = 3
        args.CTMARGS_ctm_max_iter = 120
        args.CTMARGS_ctm_conv_tol = 1e-11
        args.engine = "dl"
        hop_dl, dens_dl = main()
        args.engine = "abelian"
        hop_ab, dens_ab = main()
        self.assertLess(np.abs(hop_dl - hop_ab).max(), 1e-10)
        self.assertLess(np.abs(dens_dl - dens_ab).max(), 1e-10)
