"""Kagome RDM family cross-validation (reference
ctm/pess_kagome/rdm_kagome.py:464-1620): full-keep windows against the
generic square-lattice RDMs, partial keeps against partial traces, and
the NNN bond evaluators against explicit rdm2x2_kagome contractions."""

import numpy as np
import pytest

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp

from tpeps.config import CtmArgs
from tpeps.ctm.generic import rdm as grdm
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ctm.kagome import rdm_kagome as krdm
from tpeps.ipeps.ipeps import IPEPS


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(7)
    a = jax.random.uniform(key, (8, 2, 2, 2, 2), dtype=jnp.float64) - 0.5
    st = IPEPS({(0, 0): a})
    cfg = CtmArgs(ctm_max_iter=100, ctm_conv_tol=1e-11)
    env, _ = run(st, init_env(st, 16), cfg)
    return st, env


def _nrm(r, n):
    r = np.array(r).reshape(2 ** n, 2 ** n)
    return r / np.trace(r)


def test_windows_match_generic(setup):
    st, env = setup
    args = ((0, 0), st.sites, st.vertexToSite, env.C, env.T, 2)
    m21 = krdm.rdm2x1_kagome(*args)
    g21 = grdm.rdm2x1((0, 0), st.sites, st.vertexToSite, env.C, env.T)
    assert np.abs(_nrm(m21, 6) - _nrm(g21, 6)).max() < 1e-12
    m12 = krdm.rdm1x2_kagome(*args)
    g12 = grdm.rdm1x2((0, 0), st.sites, st.vertexToSite, env.C, env.T)
    assert np.abs(_nrm(m12, 6) - _nrm(g12, 6)).max() < 1e-12


def test_partial_keeps_are_partial_traces(setup):
    st, env = setup
    args = ((0, 0), st.sites, st.vertexToSite, env.C, env.T, 2)
    full = _nrm(krdm.rdm2x1_kagome(*args), 6).reshape([2] * 12)
    part = _nrm(krdm.rdm2x1_kagome(*args, sites_to_keep_00=(0,),
                                   sites_to_keep_10=(1,)), 2)
    tr = np.einsum("axywbzAxywBz->abAB", full).reshape(4, 4)
    assert np.abs(part - tr / np.trace(tr)).max() < 1e-12
    full1 = _nrm(krdm.rdm1x1_kagome(*args), 3).reshape([2] * 6)
    p1 = _nrm(krdm.rdm1x1_kagome(*args, sites_to_keep=(1,)), 1)
    tr1 = np.einsum("xayxAy->aA", full1)
    assert np.abs(p1 - tr1 / np.trace(tr1)).max() < 1e-12


def test_rdm2x2_matches_up_triangle(setup):
    st, env = setup
    args = ((0, 0), st.sites, st.vertexToSite, env.C, env.T, 2)
    r22 = krdm.rdm2x2_kagome(*args, sites_to_keep_00=(), sites_to_keep_10=(1,),
                             sites_to_keep_01=(2,), sites_to_keep_11=(0,))
    upt = krdm.rdm2x2_up_triangle_open(*args)
    assert np.abs(_nrm(r22, 3) - _nrm(upt, 3)).max() < 1e-12


def test_nnn_bonds_match_rdm2x2(setup):
    st, env = setup
    args = ((0, 0), st.sites, st.vertexToSite, env.C, env.T, 2)
    op = jnp.asarray(np.random.default_rng(1).standard_normal((2, 2, 2, 2)))
    cases = [
        (krdm.rdm2x2_nnn_1, [((), (1,), (0,), ()), ((), (0,), (2,), ())]),
        (krdm.rdm2x2_nnn_2, [((2,), (1,), (), ()), ((1,), (0,), (), ())]),
        (krdm.rdm2x2_nnn_3, [((2,), (), (0,), ()), ((1,), (), (2,), ())]),
    ]
    for fn, keeps_pairs in cases:
        b1, b2, norm = fn((0, 0), st.sites, st.vertexToSite, env.C, env.T,
                          op, 2)
        for b, ks in zip((b1, b2), keeps_pairs):
            r = np.array(krdm.rdm2x2_kagome(
                *args, sites_to_keep_00=ks[0], sites_to_keep_10=ks[1],
                sites_to_keep_01=ks[2], sites_to_keep_11=ks[3])
            ).reshape(2, 2, 2, 2)
            v = np.einsum("abef,abef->", r, np.array(op)) / \
                np.trace(r.reshape(4, 4))
            assert abs(float(b) / float(norm) - v) < 1e-12, fn.__name__
