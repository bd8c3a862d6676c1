"""Multi-chip SPMD tests on the 8-virtual-device CPU mesh.

Validates the contract of tpeps/parallel/sharded.py (SURVEY.md §5): the
dp axis is pure ensemble parallelism (bitwise-equal energies vs single
device), and the tp axis actually shards the chi contractions — the
lowered HLO must contain cross-device collectives, not a replicated
program with sharding annotations dropped.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpeps.models.j1j2 import J1J2_C4V_BIPARTITE
from tpeps.parallel.sharded import (
    ensemble_train_step,
    make_mesh,
    tp_sharded_energy,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

_COLLECTIVES = (
    "all-reduce", "all-gather", "collective-permute", "reduce-scatter",
    "all-to-all",
)


def _states(dp, d=2, D=2):
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.rand(dp, d, D, D, D, D) - 0.5)


def _single_device_losses(A_batch, model, chi, n_ctm_iter):
    """Reference: the same per-state loss with no mesh in scope."""
    from tpeps.ctm.c4v.ctmrg import ctm_move_sl
    from tpeps.ctm.c4v.env import init_env
    from tpeps.ipeps.ipeps_c4v import symmetrize_c4v

    out = []
    for A in A_batch:
        a = symmetrize_c4v(A, normalize=True)
        env = init_env(a, chi, "CTMRG")
        P = jnp.zeros((chi * a.shape[1] ** 2, chi), dtype=a.dtype)
        for _ in range(n_ctm_iter):
            env, _, P = ctm_move_sl(a, env, P)
        out.append(model.energy_1x1_lowmem(a, env))
    return jnp.stack(out)


def test_ensemble_train_step_matches_single_device():
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}
    model = J1J2_C4V_BIPARTITE(j1=1.0, j2=0.0)
    chi, n_iter = 8, 3
    A = _states(mesh.shape["dp"])
    with mesh:
        step = ensemble_train_step(mesh, model.energy_1x1_lowmem, chi, n_ctm_iter=n_iter)
        A2, loss = step(A)
    ref = float(jnp.mean(_single_device_losses(A, model, chi, n_iter)))
    assert A2.shape == A.shape
    assert abs(float(loss) - ref) < 1e-12


def test_tp_sharded_energy_matches_and_has_collectives():
    mesh = make_mesh(8)
    model = J1J2_C4V_BIPARTITE(j1=1.0, j2=0.0)
    chi, n_iter = 8, 2
    A = _states(1)[0]
    with mesh:
        energy = tp_sharded_energy(mesh, model.energy_1x1_lowmem, chi, n_ctm_iter=n_iter)
        e = float(energy(A))
        hlo = energy.lower(A).compile().as_text()
    ref = float(_single_device_losses(A[None], model, chi, n_iter)[0])
    assert abs(e - ref) < 1e-12
    assert any(c in hlo for c in _COLLECTIVES), (
        "tp-sharded energy lowered to a program without collectives — "
        "the sharding constraints were dropped"
    )


def test_ensemble_train_step_hlo_has_collectives():
    """The train step carries tp constraints inside the vmapped per-state
    loss (sharded.py one_loss); under tp=2 its compiled program must
    communicate across the tp axis."""
    mesh = make_mesh(8)
    model = J1J2_C4V_BIPARTITE(j1=1.0, j2=0.0)
    A = _states(mesh.shape["dp"])
    with mesh:
        step = ensemble_train_step(mesh, model.energy_1x1_lowmem, chi=8, n_ctm_iter=2)
        hlo = step.lower(A).compile().as_text()
    assert any(c in hlo for c in _COLLECTIVES)


def test_generic_tp_sharded_energy_matches_and_has_collectives():
    """The generic engine under tp sharding: value matches the
    unsharded engine and the compiled program carries collectives."""
    import jax.numpy as jnp

    from tpeps.ctm.generic import rdm as g_rdm
    from tpeps.models.j1j2 import J1J2
    from tpeps.parallel.sharded import generic_tp_sharded_energy

    mesh = make_mesh(8)
    model = J1J2(j1=1.0, j2=0.0)

    def bipartite(c):
        return ((c[0] + c[1]) % 2, 0)

    def eg_f(sites, site_of, C, T):
        rho = g_rdm.rdm2x1((0, 0), sites, site_of, C, T)
        return jnp.einsum("ijab,ijab->", rho, model.SS).real

    rng = np.random.RandomState(3)
    sites = {(i, 0): jnp.asarray(rng.rand(2, 3, 3, 3, 3) - 0.5)
             for i in range(2)}
    with mesh:
        en = jax.jit(generic_tp_sharded_energy(mesh, eg_f, bipartite, 12,
                                               n_ctm_iter=1, lX=2, lY=1))
        e = float(en(sites))
        hlo = en.lower(sites).compile().as_text()
        en0 = jax.jit(generic_tp_sharded_energy(mesh, eg_f, bipartite, 12,
                                                n_ctm_iter=1, lX=2, lY=1,
                                                tp_shard=False))
        e0 = float(en0(sites))
    assert abs(e - e0) < 1e-10, (e, e0)
    assert any(c in hlo for c in _COLLECTIVES), (
        "generic tp-sharded energy lowered without collectives"
    )


def test_generic_tp_sharding_reduces_peak_memory():
    """tp=2 chi-axis sharding must cut the per-device temporary memory
    of the generic move program vs the replicated baseline (VERDICT r2
    ask #8: 'a test showing tp=2 reduces per-device env memory')."""
    import jax.numpy as jnp

    from tpeps.ctm.generic import rdm as g_rdm
    from tpeps.models.j1j2 import J1J2
    from tpeps.parallel.sharded import generic_tp_sharded_energy

    mesh = make_mesh(8)
    model = J1J2(j1=1.0, j2=0.0)

    def one_site(c):
        return (0, 0)

    def eg_f(sites, site_of, C, T):
        rho = g_rdm.rdm1x1((0, 0), sites, site_of, C, T)
        return jnp.trace(rho).real

    rng = np.random.RandomState(4)
    sites = {(0, 0): jnp.asarray(rng.rand(2, 4, 4, 4, 4) - 0.5)}
    chi = 48

    def temp_bytes(tp_shard):
        with mesh:
            en = jax.jit(generic_tp_sharded_energy(mesh, eg_f, one_site, chi,
                                                   n_ctm_iter=1,
                                                   tp_shard=tp_shard))
            ma = en.lower(sites).compile().memory_analysis()
        return ma.temp_size_in_bytes

    sharded, repl = temp_bytes(True), temp_bytes(False)
    # the dominant temporaries (enlarged corners / halves, chi*D^2-sized)
    # shard over tp=2: expect a clear reduction, not merely parity
    assert sharded < 0.75 * repl, (sharded, repl)
