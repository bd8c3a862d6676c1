"""Native block-sparse abelian observables (corrf, transferops) vs the
dense zoo on the densified environment — same state, same env, no
densify in the abelian path itself."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpeps.config import CtmArgs
from tpeps.ctm.generic_abelian import corrf as ab_corrf
from tpeps.ctm.generic_abelian import ctmrg as ctmrg_ab
from tpeps.ctm.generic_abelian import env as env_ab
from tpeps.ctm.generic_abelian import transferops as ab_top
from tpeps.ctm.generic_abelian.to_dense import densify
from tpeps.sym.io import read_ipeps_abelian
from tpeps.sym.tensor import AbelianTensor, leg

from refutil import REF_PATH, reference_available

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

U1_D3_STATE = os.path.join(
    REF_PATH,
    "test-input/abelian/c4v/BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_blocks_2site_state.json",
)


def bipartite(coord):
    vx = (coord[0] + abs(coord[0]) * 2) % 2
    vy = abs(coord[1])
    return ((vx + vy) % 2, 0)


@pytest.fixture(scope="module")
def converged():
    if not os.path.exists(U1_D3_STATE):
        pytest.skip("reference test-input not available")
    st = read_ipeps_abelian(U1_D3_STATE, vertexToSite=bipartite)
    cfg = CtmArgs(ctm_max_iter=40, ctm_conv_tol=1e-9)
    env, _ = ctmrg_ab.run(st, env_ab.init_env(st, 16), cfg)
    return st, env


def _sz_abelian(st):
    """Sz as an AbelianTensor on the state's physical leg."""
    a = st.site((0, 0))
    pleg = a.legs[0]
    sp = a.signature[0]
    op = AbelianTensor("U1", (sp, -sp), (pleg, pleg), 0, dtype=a.dtype)
    for q, d in pleg.charges:
        op.blocks[(q, q)] = 0.5 * q * jnp.eye(d, dtype=a.dtype)
    return op


@needs_ref
def test_abelian_corrf_matches_dense(converged):
    from tpeps.ctm.generic import corrf as d_corrf

    st, env = converged
    dist = 3
    sz = _sz_abelian(st)
    vals_ab = np.asarray(ab_corrf.corrf_1sO1sO(
        (0, 0), (1, 0), st, env, sz, lambda r: sz, dist))

    dstate, denv = densify(st, env)
    szd = np.asarray(sz.to_dense())
    vals_d = np.asarray(d_corrf.corrf_1sO1sO(
        (0, 0), (1, 0), dstate.sites, dstate.vertexToSite, denv.C, denv.T,
        jnp.asarray(szd), lambda r: jnp.asarray(szd), dist))
    assert np.abs(vals_ab - vals_d).max() < 1e-9, (vals_ab, vals_d)


@needs_ref
def test_abelian_top_spec_matches_dense(converged):
    from tpeps.ctm.generic import transferops as d_top

    st, env = converged
    spec_ab = np.asarray(ab_top.get_Top_spec(
        4, (0, 0), (1, 0), st, env, sectors=(0, 1, -1, 2, -2)))

    dstate, denv = densify(st, env)
    # the abelian engine keeps per-edge chi totals below the target when
    # the reltol cut binds; zero-pad to the uniform chi the dense
    # transferops expects (exact for spectra)
    chi = env.chi

    def pad(t, chi_axes):
        padw = [(0, (chi - t.shape[i]) if i in chi_axes else 0)
                for i in range(t.ndim)]
        return jnp.pad(t, padw)

    Cp = {k: pad(t, (0, 1)) for k, t in denv.C.items()}
    Tp = {}
    for (c, d), t in denv.T.items():
        chi_axes = {(0, -1): (0, 2), (-1, 0): (0, 1), (0, 1): (1, 2),
                    (1, 0): (0, 2)}[d]
        Tp[(c, d)] = pad(t, chi_axes)
    spec_d = np.asarray(d_top.get_Top_spec(4, (0, 0), (1, 0), dstate,
                                           type("E", (), {"chi": chi,
                                                          "C": Cp,
                                                          "T": Tp})()))
    mag_ab = np.hypot(spec_ab[:, 0], spec_ab[:, 1])
    mag_d = np.hypot(spec_d[:, 0], spec_d[:, 1])
    assert np.abs(mag_ab - mag_d).max() < 1e-7, (mag_ab, mag_d)
