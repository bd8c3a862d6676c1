"""Differentiable frozen-structure abelian CTMRG (sym/frozen.py,
ctm/c4v_abelian/frozen.py, ctm/generic_abelian/frozen.py): pytree
registration, fixed-profile decompositions vs the dynamic ones, frozen
fixed points vs host engines, and implicit gradients vs FD."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpeps.config import CtmArgs
from tpeps.ipeps.ipeps_abelian import (
    IPEPS_ABELIAN,
    add_noise_abelian,
    make_c4v_symm_A1_abelian,
)
from tpeps.sym.frozen import eigh_blockwise_fixed, svd_blockwise_fixed
from tpeps.sym.tensor import AbelianTensor, eigh_blockwise, leg, svd_blockwise

from refutil import REF_PATH, reference_available

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

C4V_D3_STATE = os.path.join(
    REF_PATH,
    "test-input/abelian/c4v/BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_blocks_1site_state.json",
)


def test_pytree_roundtrip_jit_grad():
    """AbelianTensor is a pytree: flatten/unflatten round-trips, jit
    traces over it, grad returns an AbelianTensor of block cotangents."""
    l = leg({-1: 2, 0: 3, 1: 2})
    t = AbelianTensor.random(jax.random.PRNGKey(0), "U1", (1, -1), (l, l))
    leaves, treedef = jax.tree_util.tree_flatten(t)
    t2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert float(jnp.max(jnp.abs(t2.to_dense() - t.to_dense()))) == 0.0

    @jax.jit
    def f(x):
        y = x.tensordot(x.conj(), ((1,), (1,)))
        return jnp.sum(y.to_dense() ** 2)

    g = jax.grad(f)(t)
    assert isinstance(g, AbelianTensor)
    assert set(g.blocks) == set(t.blocks)
    # directional FD check
    v = jax.tree_util.tree_map(jnp.ones_like, t)
    eps = 1e-6
    tp = jax.tree_util.tree_map(lambda a, b: a + eps * b, t, v)
    tm = jax.tree_util.tree_map(lambda a, b: a - eps * b, t, v)
    fd = (f(tp) - f(tm)) / (2 * eps)
    ad = sum(float(jnp.sum(gb)) for gb in g.blocks.values())
    assert abs(fd - ad) / abs(fd) < 1e-6


def _random_hermitian(key, legs_row):
    """Corner-convention hermitian tensor: identical signatures on the
    row and col groups (col sector = -row sector), hermitian in the
    ``conj_blocks`` + transpose sense — the structure
    ``eigh_blockwise``'s +-q pair handling assumes (the C4v enlarged
    corner, cf. tpeps/ctm/c4v_abelian/ctmrg.py nC symmetrization)."""
    t = AbelianTensor.random(key, "U1", (1, 1, 1, 1),
                             (legs_row[0], legs_row[1], legs_row[0], legs_row[1]))
    th = t.conj_blocks().transpose((2, 3, 0, 1))
    return 0.5 * (t + th)


def test_eigh_fixed_matches_dynamic():
    """eigh_blockwise_fixed with the dynamic result's keep profile
    reproduces the dynamic decomposition's projector subspace."""
    l1, l2 = leg({-1: 2, 0: 2, 1: 2}), leg({-1: 1, 0: 2, 1: 1})
    M = _random_hermitian(jax.random.PRNGKey(1), (l1, l2))
    U_dyn, W_dyn = eigh_blockwise(M, (0, 1), (2, 3), chi=8)
    keep = dict(U_dyn.legs[-1].charges)
    U_fix, W_fix = eigh_blockwise_fixed(M, (0, 1), (2, 3), keep)
    assert dict(U_fix.legs[-1].charges) == keep
    for q in W_fix:
        assert np.allclose(np.sort(np.abs(np.asarray(W_fix[q]))),
                           np.sort(np.abs(np.asarray(W_dyn[q]))), atol=1e-12)
    # same kept subspace: the projectors P = U U^dag agree per sector
    for q in keep:
        cols_d = [(k, b) for k, b in U_dyn.blocks.items() if k[-1] == q]
        for k, bd in cols_d:
            bf = U_fix.blocks[k]
            d = bd.reshape(-1, bd.shape[-1])
            f = np.asarray(bf).reshape(-1, bf.shape[-1])
            assert np.allclose(d @ d.conj().T, f @ f.conj().T, atol=1e-10)


def test_svd_fixed_matches_dynamic():
    l1, l2 = leg({-1: 2, 0: 2, 1: 2}), leg({-1: 1, 0: 2, 1: 1})
    t = AbelianTensor.random(jax.random.PRNGKey(2), "U1", (1, 1, -1, -1),
                             (l1, l2, l2, l1))
    U_dyn, S_dyn, V_dyn = svd_blockwise(t, (0, 1), (2, 3), chi=7)
    keep = dict(U_dyn.legs[-1].charges)
    U_fix, S_fix, V_fix = svd_blockwise_fixed(t, (0, 1), (2, 3), keep)
    for q in S_fix:
        assert np.allclose(np.asarray(S_fix[q]), np.asarray(S_dyn[q]), atol=1e-12)
    # U S V reconstructs the same truncated tensor
    def recon(U, S, V):
        US = U.copy_with({k: b * np.asarray(S[k[-1]]) for k, b in U.blocks.items()})
        return US.tensordot(V, ((2,), (0,))).to_dense()
    assert np.allclose(np.asarray(recon(U_fix, S_fix, V_fix)),
                       np.asarray(recon(U_dyn, S_dyn, V_dyn)), atol=1e-10)


@needs_ref
@pytest.mark.slow
def test_frozen_c4v_matches_host_and_grad_fd():
    """Frozen C4v engine: (a) fixed point reproduces the host engine's
    energy; (b) implicit gradient matches central FD.  Slow: the traced
    move compiles for minutes on CPU (cached persistently after)."""
    from tpeps.ctm.c4v_abelian import ctmrg as ctmrg_c4v
    from tpeps.ctm.c4v_abelian import env as env_c4v
    from tpeps.ctm.c4v_abelian.frozen import (
        _make_converge_frozen,
        close_structure,
        freeze_from_env,
    )
    from tpeps.models.abelian.j1j2 import J1J2_ABELIAN

    st = IPEPS_ABELIAN("U1", {(0, 0): add_noise_abelian(
        make_c4v_symm_A1_abelian(
            __import__("tpeps.sym.io", fromlist=["read_ipeps_abelian"])
            .read_ipeps_abelian(C4V_D3_STATE).site((0, 0))),
        jax.random.PRNGKey(7), 0.1)})
    a = make_c4v_symm_A1_abelian(st.site((0, 0)))
    a = a * (1.0 / float(a.norm()))
    st = IPEPS_ABELIAN("U1", {(0, 0): a})
    chi = 16
    model = J1J2_ABELIAN(j1=1.0, j2=0.0)
    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-9)
    env, _ = ctmrg_c4v.run(st, env_c4v.init_env(st, chi), cfg)
    st_bp, eg = env_c4v.as_generic(st, env)
    e_host = float(model.energy_per_site(st_bp, eg).real)

    keep = freeze_from_env(env)
    A0 = a.to_backend("jnp")
    C0, T0 = close_structure(A0, env.C.to_backend("jnp"),
                             env.T.to_backend("jnp"), dict(keep))
    fn = _make_converge_frozen(keep, 100, 1e-10, 1e-12, 150, 1e-9)

    def loss(A, C0, T0):
        A = make_c4v_symm_A1_abelian(A)
        A = A * (1.0 / A.norm())
        Cf, Tf = fn(A, C0, T0)
        st2 = IPEPS_ABELIAN("U1", {(0, 0): A})
        sb, eg2 = env_c4v.as_generic(st2, env_c4v.ENV_C4V_ABELIAN(chi, Cf, Tf))
        return model.energy_per_site(sb, eg2).real

    vag = jax.jit(jax.value_and_grad(loss))
    e_frozen, g = vag(A0, C0, T0)
    assert abs(float(e_frozen) - e_host) < 1e-6, (float(e_frozen), e_host)

    loss_j = jax.jit(loss)
    eps = 1e-6
    q = sorted(A0.blocks)[0]
    idx = tuple(0 for _ in A0.blocks[q].shape)
    bp = A0.copy_with({**A0.blocks, q: A0.blocks[q].at[idx].add(eps)})
    bm = A0.copy_with({**A0.blocks, q: A0.blocks[q].at[idx].add(-eps)})
    fd = (float(loss_j(bp, C0, T0)) - float(loss_j(bm, C0, T0))) / (2 * eps)
    ad = float(g.blocks[q][idx])
    assert abs(fd - ad) / (abs(fd) + 1e-12) < 2e-2, (fd, ad)


@needs_ref
@pytest.mark.slow
def test_frozen_generic_matches_host():
    """Frozen generic engine reproduces the host dynamic engine's
    2-site U(1) bipartite energy at the same chi."""
    from tpeps.ctm.generic_abelian import ctmrg as ctmrg_g
    from tpeps.ctm.generic_abelian import env as env_g
    from tpeps.ctm.generic_abelian.frozen import converge_frozen_generic
    from tpeps.models.abelian.j1j2 import J1J2_ABELIAN
    from tpeps.sym.io import read_ipeps_abelian

    def bipartite(coord):
        vx = (coord[0] + abs(coord[0]) * 2) % 2
        vy = abs(coord[1])
        return ((vx + vy) % 2, 0)

    f = os.path.join(
        REF_PATH,
        "test-input/abelian/c4v/BFGS100LS_U1B_D3-chi72-j20.0-run0-iRNDseed321_blocks_2site_state.json",
    )
    st = read_ipeps_abelian(f, vertexToSite=bipartite)
    chi = 16
    model = J1J2_ABELIAN(j1=1.0, j2=0.0)
    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-9)
    env, _ = ctmrg_g.run(st, env_g.init_env(st, chi), cfg)
    e_host = float(model.energy_per_site(st, env).real)

    stj = IPEPS_ABELIAN(st.sym,
                        {c: a.to_backend("jnp") for c, a in st.sites.items()},
                        vertexToSite=bipartite, lX=st.lX, lY=st.lY)
    envj = env_g.ENV_ABELIAN(
        chi,
        {k: t.to_backend("jnp") for k, t in env.C.items()},
        {k: t.to_backend("jnp") for k, t in env.T.items()},
    )
    env2 = converge_frozen_generic(stj, envj, conv_tol=1e-10)
    e_frozen = float(model.energy_per_site(stj, env2).real)
    assert abs(e_frozen - e_host) < 1e-6, (e_frozen, e_host)
