"""Overlap CTMRG / fidelity tests (reference ctmrg.py:112 run_overlap,
rdm_overlap.py)."""

import numpy as np
import pytest

import tpeps  # noqa: F401
import jax.numpy as jnp

from tpeps.config import CtmArgs
from tpeps.ctm.generic.overlap import fidelity_per_site
from tpeps.ipeps.ipeps import IPEPS


def _product(v):
    v = np.asarray(v, dtype=float)
    return IPEPS({(0, 0): jnp.asarray(v.reshape(len(v), 1, 1, 1, 1))})


def test_fidelity_product_states_exact():
    """D=1 product states: per-site fidelity = |<v1|v2>| / (|v1||v2|)."""
    cfg = CtmArgs(ctm_max_iter=10, ctm_conv_tol=1e-12)
    v1 = [1.0, 0.3]
    v2 = [0.8, -0.4]
    f = fidelity_per_site(_product(v1), _product(v2), chi=4, ctm_cfg=cfg)
    want = abs(np.dot(v1, v2)) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    assert f == pytest.approx(want, rel=1e-9)


def test_fidelity_self_is_one():
    import jax

    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (2, 2, 2, 2, 2), dtype=jnp.float64) - 0.5
    st = IPEPS({(0, 0): a})
    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-11)
    f = fidelity_per_site(st, st, chi=8, ctm_cfg=cfg)
    assert f == pytest.approx(1.0, abs=1e-7)


def test_fidelity_perturbed_state_below_one_and_monotone():
    import jax

    key = jax.random.PRNGKey(1)
    a = jax.random.uniform(key, (2, 2, 2, 2, 2), dtype=jnp.float64) - 0.5
    noise = jax.random.uniform(jax.random.PRNGKey(2), a.shape,
                               dtype=jnp.float64) - 0.5
    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-11)
    st1 = IPEPS({(0, 0): a})
    fs = []
    for eps in (0.002, 0.05):
        st2 = IPEPS({(0, 0): a + eps * noise})
        fs.append(fidelity_per_site(st1, st2, chi=8, ctm_cfg=cfg))
    assert 0.0 < fs[1] < fs[0] < 1.0 - 1e-9
    assert fs[0] > 0.99  # tiny perturbation stays near 1


def test_overlap_different_bond_dims():
    """<psi1|psi2> with D1=2, D2=3 layers runs through the sl engine."""
    import jax

    from tpeps.ctm.generic.overlap import init_env_overlap, run_overlap, transfer_value
    from tpeps.ipeps.ipeps import extend_bond_dim

    # product states have exact rank-1 environments, so the fidelity of
    # a state against its zero-padded copy is exactly 1 at any chi
    # (random states instead carry ~1e-3 chi-systematics in the transfer
    # value, which would mask the mixed-D plumbing being tested here)
    v1, v2 = [1.0, 0.4], [0.7, -0.2]
    st1 = IPEPS({(0, 0): jnp.asarray(np.reshape(v1, (2, 1, 1, 1, 1)))})
    st2 = extend_bond_dim(
        IPEPS({(0, 0): jnp.asarray(np.reshape(v2, (2, 1, 1, 1, 1)))}), 2
    )  # D1=1 vs D2=2 layers through the same sl engine
    cfg = CtmArgs(ctm_max_iter=20, ctm_conv_tol=1e-12)
    f = fidelity_per_site(st1, st2, chi=4, ctm_cfg=cfg)
    want = abs(np.dot(v1, v2)) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    assert f == pytest.approx(want, rel=1e-8)
