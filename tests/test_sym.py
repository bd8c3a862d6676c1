"""Abelian block-sparse tensor core tests.

Strategy: every symmetric operation must agree with the same operation
performed on the dense embedding (to_dense is the homomorphism).
"""

import numpy as np
import pytest

import tpeps  # noqa: F401
import jax
import jax.numpy as jnp

from tpeps.sym.tensor import AbelianTensor, leg, svd_blockwise


L1 = leg({-1: 2, 0: 3, 1: 2})
L2 = leg({-1: 1, 0: 2, 1: 1})


def _rand(key, sym, sig, legs, n=0):
    return AbelianTensor.random(key, sym, sig, legs, n)


def test_charge_conservation_structure():
    t = AbelianTensor.zeros("U1", (1, -1), (L1, L1))
    for qs in t.blocks:
        assert qs[0] - qs[1] == 0
    t2 = AbelianTensor.zeros("U1", (1, 1), (L1, L2), n=1)
    for qs in t2.blocks:
        assert qs[0] + qs[1] == 1


def test_dense_roundtrip():
    key = jax.random.PRNGKey(0)
    t = _rand(key, "U1", (1, -1, 1), (L1, L2, L1))
    d = t.to_dense()
    t2 = AbelianTensor.from_dense(d, "U1", (1, -1, 1), (L1, L2, L1))
    assert float((t2.to_dense() - d).max()) == 0.0
    # from_dense of a generic dense array projects onto allowed blocks
    g = jax.random.uniform(jax.random.PRNGKey(1), d.shape)
    proj = AbelianTensor.from_dense(g, "U1", (1, -1, 1), (L1, L2, L1)).to_dense()
    # projection is idempotent
    proj2 = AbelianTensor.from_dense(proj, "U1", (1, -1, 1), (L1, L2, L1)).to_dense()
    assert float(jnp.abs(proj - proj2).max()) < 1e-15


def test_tensordot_matches_dense():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    a = _rand(k1, "U1", (1, -1, 1), (L1, L2, L1))
    b = _rand(k2, "U1", (-1, 1, 1), (L1, L1, L2))
    # contract a's legs (1,2) with b's legs (2,0): signatures must be
    # opposite for the contraction to conserve charge
    c = a.tensordot(b, ((1, 2), (2, 0)))
    cd = jnp.tensordot(a.to_dense(), b.to_dense(), ((1, 2), (2, 0)))
    assert float(jnp.abs(c.to_dense() - cd).max()) < 1e-13
    assert c.signature == (1, 1)
    # same-signature contraction is rejected
    with pytest.raises(ValueError):
        a.tensordot(a, ((1,), (1,)))


def test_tensordot_charged_tensors():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    a = _rand(k1, "U1", (1, -1), (L1, L1), n=1)
    b = _rand(k2, "U1", (1, -1), (L1, L1), n=-1)
    c = a.tensordot(b, ((1,), (0,)))
    assert c.n == 0
    cd = jnp.tensordot(a.to_dense(), b.to_dense(), ((1,), (0,)))
    assert float(jnp.abs(c.to_dense() - cd).max()) < 1e-13


def test_transpose_conj_add_norm():
    key = jax.random.PRNGKey(4)
    a = _rand(key, "U1", (1, -1, 1), (L1, L2, L1))
    at = a.transpose((2, 0, 1))
    assert float(jnp.abs(at.to_dense() - a.to_dense().transpose(2, 0, 1)).max()) == 0.0
    assert at.signature == (1, 1, -1)
    ac = a.conj()
    assert ac.signature == (-1, 1, -1)
    s = a + a
    assert float(jnp.abs(s.to_dense() - 2 * a.to_dense()).max()) < 1e-15
    assert abs(float(a.norm()) - float(jnp.linalg.norm(a.to_dense()))) < 1e-13


def test_z2():
    Lz = leg({0: 2, 1: 3})
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    a = _rand(k1, "Z2", (1, 1), (Lz, Lz))
    for qs in a.blocks:
        assert sum(qs) % 2 == 0
    b = _rand(k2, "Z2", (1, -1), (Lz, Lz), n=1)
    c = a.tensordot(b, ((1,), (0,)))
    cd = jnp.tensordot(a.to_dense(), b.to_dense(), ((1,), (0,)))
    assert float(jnp.abs(c.to_dense() - cd).max()) < 1e-13
    assert c.n == 1


def test_u1xu1():
    Lu = leg({(0, 0): 1, (1, 0): 1, (0, 1): 1, (1, 1): 1})
    a = AbelianTensor.random(jax.random.PRNGKey(6), "U1xU1", (1, -1), (Lu, Lu))
    for qs in a.blocks:
        assert tuple(x - y for x, y in zip(qs[0], qs[1])) == (0, 0)
    b = a.tensordot(a.conj().transpose((1, 0)), ((1,), (0,)))
    bd = a.to_dense() @ a.to_dense().conj().T
    assert float(jnp.abs(b.to_dense() - bd).max()) < 1e-13


def test_svd_blockwise_reconstruction():
    key = jax.random.PRNGKey(7)
    a = _rand(key, "U1", (1, -1, -1), (L1, L2, L1))
    U, S, V = svd_blockwise(a, (0,), (1, 2))
    # untruncated: U S V must reconstruct a
    # contract U @ diag(S) @ V via blocks
    US_blocks = {}
    for q, b in U.blocks.items():
        US_blocks[q] = b * S[q[-1]][None, :]
    US = U.copy_with(US_blocks)
    US = AbelianTensor(U.sym, U.signature, U.legs, U.n, US_blocks, U.dtype)
    rec = US.tensordot(V, ((1,), (0,)))
    assert float(jnp.abs(rec.to_dense() - a.to_dense()).max()) < 1e-12


def test_svd_blockwise_truncation_global():
    """Global cut keeps the chi largest singular values across sectors,
    matching a dense SVD cut on the embedded matrix."""
    key = jax.random.PRNGKey(8)
    a = _rand(key, "U1", (1, -1), (L1, L1))
    chi = 4
    U, S, V = svd_blockwise(a, (0,), (1,), chi=chi)
    kept = np.sort(np.concatenate([np.asarray(s) for s in S.values()]))[::-1]
    dense_s = np.linalg.svd(np.asarray(a.to_dense()), compute_uv=False)
    assert len(kept) == chi
    assert np.abs(kept - dense_s[:chi]).max() < 1e-12
    # truncated reconstruction error equals the dense truncation error
    US_blocks = {q: b * S[q[-1]][None, :] for q, b in U.blocks.items()}
    US = AbelianTensor(U.sym, U.signature, U.legs, U.n, US_blocks, U.dtype)
    rec = US.tensordot(V, ((1,), (0,)))
    err = float(jnp.linalg.norm(rec.to_dense() - a.to_dense()))
    derr = float(np.linalg.norm(dense_s[chi:]))
    assert abs(err - derr) < 1e-10


def test_tensordot_jit():
    """Block structure is static metadata: tensordot over the block dict
    traces and jits."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    a = _rand(k1, "U1", (1, -1), (L1, L1))
    b = _rand(k2, "U1", (1, -1), (L1, L1))

    def f(ablocks, bblocks):
        at = AbelianTensor(a.sym, a.signature, a.legs, a.n, ablocks, a.dtype)
        bt = AbelianTensor(b.sym, b.signature, b.legs, b.n, bblocks, b.dtype)
        return at.tensordot(bt, ((1,), (0,))).blocks

    out = jax.jit(f)(a.blocks, b.blocks)
    ref = a.tensordot(b, ((1,), (0,)))
    for q in ref.blocks:
        assert float(jnp.abs(out[q] - ref.blocks[q]).max()) < 1e-13


def test_ipeps_abelian_to_dense_energy():
    """An abelian iPEPS embedded densely runs through the full dense
    CTMRG + energy pipeline unchanged."""
    from tpeps.ipeps.ipeps_abelian import IPEPS_ABELIAN, make_staggered_signature_site
    from tpeps.ctm.generic.env import init_env
    from tpeps.ctm.generic.ctmrg import run
    from tpeps.config import CtmArgs
    from tpeps.models.j1j2 import J1J2

    phys = leg({-1: 1, 1: 1})
    aux = leg({-1: 1, 0: 1, 1: 1})
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    sites = {
        (0, 0): make_staggered_signature_site(k1, "U1", phys, aux),
        (1, 0): make_staggered_signature_site(k2, "U1", phys, aux, n=0),
    }
    st = IPEPS_ABELIAN("U1", sites, lX=2, lY=1)
    plain = st.to_dense()
    plain.sites = {c: t / jnp.linalg.norm(t) for c, t in plain.sites.items()}
    env = init_env(plain, 9, "CTMRG")
    env, hist = run(plain, env, CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-8))
    e = float(J1J2(j1=1.0).energy_per_site(plain, env))
    assert np.isfinite(e)
