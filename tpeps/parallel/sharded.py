"""Multi-chip SPMD execution over a ``jax.sharding.Mesh``.

The reference's only distributed machinery is a torch.distributed/gloo
master-worker scheme for parallel finite-difference gradients
(optim/fd_optim_lbfgs_mod_distributed.py:36-221, SURVEY.md §5).  On TPU
this becomes single-program SPMD: no host-side message passing — shard
the work over a device mesh and let XLA insert ICI collectives.

iPEPS has no batch/sequence/expert axes, so the physically meaningful
mesh axes are:

* ``dp`` (data/ensemble): independent states — multi-seed ground-state
  searches, finite-difference displacements, (D, chi) sweeps.  Pure
  ``vmap`` + batch-axis sharding; zero communication per step.
* ``tp`` (tensor): intra-contraction sharding of the chi-sized
  environment axes for large chi*D^2 where one chip's HBM or FLOPs are
  insufficient; GSPMD turns the annotated einsums into collective
  matmuls over ICI.

``ensemble_train_step`` builds a jitted step covering both axes: a
batch of states is optimized concurrently (dp) while each state's CTMRG
contraction carries tp sharding constraints on its chi axes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ctm.c4v.ctmrg import ctm_move_sl
from ..ctm.c4v.env import EnvC4v, init_env
from ..ipeps.ipeps_c4v import symmetrize_c4v


def make_mesh(n_devices: int | None = None, axes=("dp", "tp")) -> Mesh:
    """Build a 2-axis mesh over the first ``n_devices`` devices."""
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devs)
    tp = 2 if n % 2 == 0 and n >= 2 else 1
    return Mesh(np.array(devs).reshape(n // tp, tp), axes)


def _tp_constraint(mesh: Mesh, env: EnvC4v) -> EnvC4v:
    """Shard the environment's first chi axis over the tp mesh axis."""
    cspec = NamedSharding(mesh, P("tp", None))
    tspec = NamedSharding(mesh, P("tp", None, None))
    return EnvC4v(
        jax.lax.with_sharding_constraint(env.C, cspec),
        jax.lax.with_sharding_constraint(env.T, tspec),
    )


def ensemble_train_step(mesh: Mesh, model_energy, chi: int, n_ctm_iter: int = 4, lr: float = 0.05):
    """Jitted SPMD training step for an ensemble of C4v states.

    One gradient-descent step on a batch of on-site tensors: each state
    runs a fixed window of differentiable CTMRG moves and an energy
    evaluation.  Batch axis sharded over ``dp``; each per-state
    environment additionally carries ``tp`` constraints on its chi axis
    so XLA shards the contractions across the tp sub-axis.

    :param model_energy: ``(a, EnvC4v) -> scalar`` energy function
    :return: jitted ``(A_batch) -> (A_batch', mean_energy)``
    """

    def one_loss(A):
        a = symmetrize_c4v(A, normalize=True)
        env = init_env(a, chi, "CTMRG")
        env = _tp_constraint(mesh, env)
        P_ref = jnp.zeros((chi * a.shape[1] ** 2, chi), dtype=a.dtype)
        for _ in range(n_ctm_iter):
            env, _, P_ref = ctm_move_sl(a, env, P_ref)
            env = _tp_constraint(mesh, env)
        return model_energy(a, env)

    def step(A_batch):
        # dp: independent states in parallel
        losses = jax.vmap(one_loss)(A_batch)
        return jnp.mean(losses)

    batch_spec = NamedSharding(mesh, P("dp", None, None, None, None, None))

    @partial(jax.jit, in_shardings=(batch_spec,), out_shardings=(batch_spec, None))
    def train_step(A_batch):
        loss, grads = jax.value_and_grad(step)(A_batch)
        return A_batch - lr * grads, loss

    return train_step


def tp_sharded_energy(mesh: Mesh, model_energy, chi: int, n_ctm_iter: int = 2):
    """Jitted single-state energy with tensor-parallel chi sharding.

    The environment tensors are constrained to ``P('tp', ...)`` between
    moves; GSPMD lowers the chi-contracting einsums of the enlarged
    corner to collective matmuls over the tp axis.
    """

    @jax.jit
    def energy(A):
        a = symmetrize_c4v(A, normalize=True)
        env = init_env(a, chi, "CTMRG")
        env = _tp_constraint(mesh, env)
        P_ref = jnp.zeros((chi * a.shape[1] ** 2, chi), dtype=a.dtype)
        for _ in range(n_ctm_iter):
            env, _, P_ref = ctm_move_sl(a, env, P_ref)
            env = _tp_constraint(mesh, env)
        return model_energy(a, env)

    return energy
