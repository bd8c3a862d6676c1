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


# ---------------------------------------------------------------------------
# Generic-engine sharding
# ---------------------------------------------------------------------------

_T_CHI_AXES = {
    # chi-carrying axes of each generic T tensor (tpeps/ctm/generic/env.py):
    # top (chi_l, D2, chi_r); left (chi_u, chi_d, D2);
    # bottom (D2, chi_l, chi_r); right (chi_u, D2, chi_d)
    (0, -1): 0,
    (-1, 0): 0,
    (0, 1): 1,
    (1, 0): 0,
}


def generic_tp_constraint(mesh: Mesh, C: dict, T: dict):
    """Shard the generic environment's leading chi axes over ``tp``."""
    cspec = NamedSharding(mesh, P("tp", None))
    Cs = {k: jax.lax.with_sharding_constraint(v, cspec) for k, v in C.items()}
    Ts = {}
    for (c, d), v in T.items():
        spec = [None] * v.ndim
        spec[_T_CHI_AXES[d]] = "tp"
        Ts[(c, d)] = jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, P(*spec)))
    return Cs, Ts


def generic_tp_sharded_energy(mesh: Mesh, energy_f, site_of, chi: int,
                              n_ctm_iter: int = 2, lX: int = 1, lY: int = 1,
                              tp_shard: bool = True):
    """Jitted generic-cell energy with tensor-parallel chi sharding —
    the multi-chip path for the *generic* engine.

    The directional moves of :func:`tpeps.ctm.generic.ctmrg.ctm_move`
    run under sharding constraints on every env tensor's chi axis, so
    GSPMD lowers the projector/absorption contractions to collective
    matmuls over ICI.  Set ``tp_shard=False`` for the replicated
    baseline (used by the peak-memory comparison test).

    :param energy_f: ``(sites, site_of, C, T) -> scalar``
    :return: jittable ``sites_dict -> energy``
    """
    from ..ctm.generic.ctmrg import ctm_move
    from ..ctm.generic.env import init_env as g_init
    from ..ipeps.ipeps import IPEPS

    proj_kwargs = dict(svd_reltol=0.0, eps_multiplet=1e-12,
                       multiplet_abstol=1e-14, ad_decomp_reg=1e-12)

    def energy(sites):
        st = IPEPS(sites, vertexToSite=site_of, lX=lX, lY=lY)
        env = g_init(st, chi, "CTMRG")
        C, T = dict(env.C), dict(env.T)
        if tp_shard:
            C, T = generic_tp_constraint(mesh, C, T)
        for _ in range(n_ctm_iter):
            for direction in ((0, -1), (-1, 0), (0, 1), (1, 0)):
                n = lX if direction in ((-1, 0), (1, 0)) else lY
                for _ in range(n):
                    C, T = ctm_move(direction, sites, site_of, C, T, chi,
                                    proj_kwargs)
                    if tp_shard:
                        C, T = generic_tp_constraint(mesh, C, T)
        return energy_f(sites, site_of, C, T)

    return energy


def fd_grad_sharded(mesh: Mesh, loss_fn, params_proto, fd_eps: float = 1.0e-4):
    """Mesh-parallel batched finite-difference gradient — the SPMD
    counterpart of the reference's torch.distributed FD scheme
    (optim/fd_optim_lbfgs_mod_distributed.py:36-221): the displacement
    batch shards over EVERY mesh device (dp x tp flattened), one
    displacement per device per wave, with zero communication until the
    final gather.

    :return: ``fd_grad(x_flat) -> (loss0, grad_flat)`` (plugs into
        :func:`tpeps.optim.fd.optimize_state_fd` via its ``fd_grad_fn``)
    """
    from jax.flatten_util import ravel_pytree

    _, unravel = ravel_pytree(params_proto)
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    flat_mesh = Mesh(np.asarray(mesh.devices).reshape(-1), ("fd",))
    bspec = NamedSharding(flat_mesh, P("fd"))

    def loss_flat(x):
        return loss_fn(unravel(x))

    batched = jax.jit(jax.vmap(loss_flat), in_shardings=(bspec,),
                      out_shardings=bspec)
    loss_jit = jax.jit(loss_flat)

    def fd_grad(x_flat):
        x = jnp.asarray(x_flat)
        n = x.shape[0]
        f0 = float(loss_jit(x))
        grad = np.zeros(n)
        eye = jnp.eye(n, dtype=x.dtype)
        for start in range(0, n, n_dev):
            stop = min(start + n_dev, n)
            pts = x[None, :] + fd_eps * eye[start:stop]
            if stop - start < n_dev:  # pad the last wave to the device count
                pts = jnp.concatenate(
                    [pts, jnp.tile(x[None, :], (n_dev - (stop - start), 1))])
            fs = np.asarray(batched(pts))[: stop - start]
            grad[start:stop] = (fs - f0) / fd_eps
        return f0, jnp.asarray(grad)

    return fd_grad
