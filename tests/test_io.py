"""JSON state interchange tests (reference-format compatibility)."""

import os

import numpy as np
import pytest

import tpeps  # noqa: F401
import jax.numpy as jnp

from tpeps.ipeps.ipeps import IPEPS, read_ipeps, write_ipeps
from tpeps.ipeps.ipeps_c4v import IPEPS_C4V, read_ipeps_c4v

from refutil import REF_PATH, reference_available


def test_roundtrip_legacy(tmp_path):
    rng = np.random.RandomState(0)
    sites = {
        (0, 0): jnp.asarray(rng.rand(2, 3, 3, 3, 3) - 0.5),
        (1, 0): jnp.asarray(rng.rand(2, 3, 3, 3, 3) - 0.5),
    }
    state = IPEPS(sites, lX=2, lY=1)
    f = tmp_path / "state.json"
    write_ipeps(state, str(f), fmt="legacy")
    state2 = read_ipeps(str(f))
    assert state2.lX == 2 and state2.lY == 1
    for c in sites:
        assert np.allclose(np.asarray(state2.sites[c]), np.asarray(sites[c]), atol=1e-14)


def test_roundtrip_1d_complex(tmp_path):
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.rand(2, 2, 2, 2, 2) + 1j * rng.rand(2, 2, 2, 2, 2))
    state = IPEPS_C4V(A)
    f = tmp_path / "state.json"
    write_ipeps(state, str(f), fmt="1D")
    state2 = read_ipeps_c4v(str(f))
    assert np.allclose(np.asarray(state2.site()), np.asarray(A), atol=1e-14)


def test_vertex_to_site_pbc():
    rng = np.random.RandomState(2)
    sites = {(x, y): jnp.asarray(rng.rand(2, 2, 2, 2, 2)) for x in range(3) for y in range(2)}
    state = IPEPS(sites, lX=3, lY=2)
    assert state.vertexToSite((3, 2)) == (0, 0)
    assert state.vertexToSite((-1, -1)) == (2, 1)
    assert state.site((4, 3)) is state.sites[(1, 1)]


@pytest.mark.skipif(not reference_available(), reason="reference checkout not present")
def test_read_reference_committed_state():
    """The reference's committed optimized states must load directly
    (interchange guarantee, reference ipeps/tensor_io.py formats)."""
    f = os.path.join(REF_PATH, "test-input", "gesdd-D2-chi50-j20.55-run0-iRND2x1_state.json")
    state = read_ipeps(f)
    assert state.lX == 2 and state.lY == 1
    assert state.sites[(0, 0)].shape == (2, 2, 2, 2, 2)
    # bipartite pattern: (1,0) maps to the other tensor
    assert state.vertexToSite((1, 0)) in state.sites
