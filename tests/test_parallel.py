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
