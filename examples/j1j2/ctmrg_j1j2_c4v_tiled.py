"""J1-J2 C4v CTMRG observables through the ``*_tiled`` RDM entry points.

Counterpart of reference examples/j1j2/ctmrg_j1j2_c4v_tiled.py: the
reference hand-tiles the double-layer contractions element-by-element to
cap peak memory; in tpeps the tiled entry points delegate to the fused
single-layer contractions (XLA's fusion already performs the tiling on
TPU), so this script is the API-parity twin of ctmrg_j1j2_c4v.py and
must reproduce identical numbers.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from ctmrg_j1j2_c4v import TestRVB as _TestRVB
from ctmrg_j1j2_c4v import args, main, unknown_args

if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main(energy_attr="energy_1x1_tiled")


class TestCtmrgTiled(unittest.TestCase):
    """Smoke (reference examples/j1j2/ctmrg_j1j2_c4v_tiled.py:196-213)."""

    def setUp(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.instate = None
        args.j2 = 0.0
        args.bond_dim = 2
        args.chi = 16
        args.seed = 9
        args.top_n = 0
        args.corrf_r = 1
        args.CTMARGS_ctm_max_iter = 60

    def test_ctmrg_SYMEIG(self):
        e, *_ = main(energy_attr="energy_1x1_tiled")
        self.assertTrue(abs(e) < 10.0)


class TestRVBTiled(_TestRVB):
    """Same RVB golden through the tiled energy path
    (reference examples/j1j2/ctmrg_j1j2_c4v_tiled.py:215-260)."""

    energy_attr = "energy_1x1_tiled"
