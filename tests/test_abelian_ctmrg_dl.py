"""Graded abelian double-layer CTMRG engine (ctmrg_dl) — structural and
fixed-point checks.

1. Even-parity equivalence: on a state whose charges are all even the
   sign dressing is trivially +1, so the dl engine must track the
   bosonic engine (ctmrg_ab) EXACTLY — same init values, same absorb
   networks, machine-identical envs every iteration.  A 2x2 cell
   exercises every neighbor-coordinate path of the halves/absorb
   wiring.
2. The graded fixed point itself is anchored by
   tests/test_abelian_fermionic_corrf.py::test_independent_graded_env_matches_dl
   (independent-env agreement with the dense dl_fermi engine).
"""

import numpy as np
import jax
import pytest

from tpeps.config import CtmArgs
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_ab
from tpeps.ctm.generic_abelian import ctmrg_dl
from tpeps.ctm.generic_abelian import env as env_ab
from tpeps.ctm.generic_abelian.rdm import rdm1x1, rdm2x1
from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN
from tpeps.sym.tensor import AbelianTensor, leg


@pytest.mark.parametrize("cell", [(2, 1), (2, 2)])
def test_even_parity_dl_equals_bosonic(cell):
    lX, lY = cell
    Lp = leg({0: 2})
    La = leg({0: 1, 2: 1})
    sts = {}
    for x in range(lX):
        for y in range(lY):
            a = AbelianTensor.random(
                jax.random.PRNGKey(7 + x + 10 * y), "U1", (1, 1, 1, -1, -1),
                (Lp, La, La, La, La), n=0, backend="np")
            sts[(x, y)] = a * (1.0 / float(a.norm()))
    st = IPEPS_ABELIAN("U1", sts, lX=lX, lY=lY)
    cfg = CtmArgs(ctm_max_iter=20, ctm_conv_tol=1e-12)

    env_b, _ = ctmrg_ab.run(st, env_ab.init_env(st, 10), cfg)
    E_sites = ctmrg_dl.build_dl_sites(st)
    env_d, _ = ctmrg_dl.run_dl(
        st, E_sites, ctmrg_dl.init_env_dl(st, E_sites, 10), cfg)

    for c in sts:
        r_b = np.asarray(rdm1x1(c, st, env_b))
        r_d = np.asarray(rdm1x1(c, st, env_d))
        assert np.abs(r_b - r_d).max() < 1e-13, (c, np.abs(r_b - r_d).max())
    r_b = np.asarray(rdm2x1((0, 0), st, env_b))
    r_d = np.asarray(rdm2x1((0, 0), st, env_d))
    assert np.abs(r_b - r_d).max() < 1e-13
