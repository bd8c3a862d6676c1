"""Linear-combination ansatz + U(1)-classified basis tests.

Anchors: the programmatically generated C4v-A_1 U(1) basis must span
exactly the reference's shipped classification files; LC states must be
C4v-symmetric by construction and run the full energy pipeline.
"""

import os

import numpy as np
import pytest

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp

from tpeps.u1sym.basis import generate_a_basis, get_u1_filter, rebase_params
from tpeps.u1sym.sym_ten_parser import import_sym_tensors

from refutil import REF_PATH, reference_available

needs_ref = pytest.mark.skipif(not reference_available(), reason="reference not present")


def test_basis_orbits_are_c4v_symmetric():
    from tpeps.groups.pg import make_c4v_symm

    basis = generate_a_basis(2, 3)
    # every generated element is invariant under A_1 symmetrization
    for t in basis:
        ts = make_c4v_symm(t, ["A1"])
        assert float(jnp.abs(ts - t).max()) < 1e-14
    # elements are mutually orthogonal indicators
    G = np.einsum("xpuldr,ypuldr->xy", np.asarray(basis), np.asarray(basis))
    assert np.abs(G - np.diag(np.diag(G))).max() == 0.0


@needs_ref
def test_u1_basis_spans_reference_classification():
    """The generated U(1)-filtered basis spans the same space as the
    reference's D3_U1_B.txt A_1 classification (charges (1,-1,0,2,0),
    total charge +1)."""
    ref_file = os.path.join(REF_PATH, "u1sym", "D3_U1_B.txt")
    ref_ts = import_sym_tensors(2, 3, "A_1", ref_file)
    assert len(ref_ts) > 0
    gen = np.asarray(generate_a_basis(2, 3, u1_charges=(1, -1, 0, 2, 0),
                                      u1_total_charge=1))
    # counts match and every reference tensor lies in the generated span
    assert gen.shape[0] == len(ref_ts)
    Gm = gen.reshape(gen.shape[0], -1)
    P = Gm.T @ np.linalg.solve(Gm @ Gm.T, Gm)  # projector onto span
    for meta, t in ref_ts:
        v = np.asarray(t).reshape(-1)
        assert np.abs(P @ v - v).max() < 1e-12, meta


def test_ipeps_lc_pipeline():
    """LC state: C4v-symmetric on-site tensor, CTMRG energy, functional
    parameter update, JSON round-trip."""
    from tpeps.config import CtmArgs
    from tpeps.ctm.c4v.ctmrg import converge_env
    from tpeps.ctm.c4v.env import init_env
    from tpeps.groups.pg import make_c4v_symm
    from tpeps.ipeps.ipeps_lc import IPEPS_LC_1SITE_PG, read_ipeps_lc_1site_pg
    from tpeps.models.j1j2 import J1J2_C4V_BIPARTITE

    basis = generate_a_basis(2, 2)
    elem = [({"meta": {"pg": "A_1"}}, t) for t in basis]
    rng = np.random.RandomState(3)
    coeffs = {(0, 0): jnp.asarray(rng.rand(len(elem)) - 0.5)}
    state = IPEPS_LC_1SITE_PG(elem, coeffs)
    a = state.site((0, 0))
    assert float(jnp.abs(make_c4v_symm(a, ["A1"]) - a).max()) < 1e-14

    a = a / jnp.abs(a).max()
    env = converge_env(a, init_env(a, 8), CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-9))
    e = float(J1J2_C4V_BIPARTITE(j1=1.0).energy_1x1(a, env))
    assert np.isfinite(e)

    # functional parameter update rebuilds sites
    p = state.get_parameters()
    p2 = {c: 2.0 * v for c, v in p.items()}
    st2 = state.set_parameters(p2)
    assert float(jnp.abs(st2.site((0, 0)) - 2 * state.site((0, 0))).max()) < 1e-14

    # JSON round trip
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".json", mode="w", delete=False) as f:
        path = f.name
    state.write_to_file(path)
    st3 = read_ipeps_lc_1site_pg(path)
    assert float(jnp.abs(st3.site((0, 0)) - state.site((0, 0))).max()) < 1e-12
    os.unlink(path)


def test_rebase_params():
    """Coefficients transported from a smaller-D basis into a larger one
    reproduce the same on-site tensor on the common block."""
    b2 = np.asarray(generate_a_basis(2, 2))
    b3 = np.asarray(generate_a_basis(2, 3))
    rng = np.random.RandomState(5)
    p2 = rng.rand(b2.shape[0])
    p3 = rebase_params(p2, b2, b3)
    a2 = np.einsum("i,ipuldr->puldr", p2, b2)
    a3 = np.einsum("i,ipuldr->puldr", p3, b3)
    assert np.abs(a3[:, :2, :2, :2, :2] - a2).max() < 1e-12
