"""C4v-symmetric CTM environment (counterpart of reference ctm/one_site_c4v/env_c4v.py).

A single corner ``C`` (chi x chi) and a single half-row/-column tensor
``T`` (chi x chi x D^2) describe the whole infinite environment::

    C--1 0--T--1 0--C
    |       |       |
    0       2       1

Index conventions (reference env_c4v.py:36-52): for the upper-left C and
the left T, index 0 points "up"/(-1,0) direction and continues
anti-clockwise; both are hermitian under exchange of their environment
indices, ``C_ij = C*_ji``, ``T_ija = T*_jia``.  The fused ``D^2`` index
orders (ket, bra) with ket (non-conjugated layer) major
(reference env_c4v.py:300, ``einsum('meifg,maibc->eafbgc')``).

The environment is a plain NamedTuple of jnp arrays — a pytree that
flows through ``jit``/``scan``/``while_loop`` and ``jax.vjp``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...linalg.eigh import eigh_desc


class EnvC4v(NamedTuple):
    """C4v CTM environment: corner ``C[chi,chi]`` + edge ``T[chi,chi,D^2]``."""

    C: jax.Array
    T: jax.Array

    @property
    def chi(self) -> int:
        return self.C.shape[0]


def init_env(a, chi: int, init_type: str = "CTMRG", key=None, dtype=None) -> EnvC4v:
    """Initialize environment from on-site tensor ``a[s,u,l,d,r]``
    (reference env_c4v.py:166-215).

    * "PROD"   — single-element C, leading-transfer-eigenvector T
    * "RANDOM" — random hermitian C, random T
    * "CTMRG"  — built from the on-site tensor with PBC trace
      (reference env_c4v.py:260-311)
    """
    dtype = dtype or a.dtype
    if init_type == "PROD":
        return init_prod(a, chi, dtype)
    if init_type == "RANDOM":
        assert key is not None, "RANDOM init requires a PRNG key"
        return init_random(key, chi, a.shape[1] ** 2, dtype)
    if init_type == "CTMRG":
        return init_from_ipeps_pbc(a, chi, dtype)
    raise ValueError(f"Invalid environment initialization: {init_type}")


def init_prod(a, chi: int, dtype) -> EnvC4v:
    """Product-state environment (reference env_c4v.py:216-243)."""
    D2 = a.shape[1] ** 2
    C = jnp.zeros((chi, chi), dtype=dtype).at[0, 0].set(1.0)
    # left transfer matrix traced over horizontal bonds (env_c4v.py:224-234)
    t = jnp.einsum("meifj,maibj->eafb", a, jnp.conj(a)).reshape(D2, D2)
    t = t / jnp.abs(t).max()
    _, U = eigh_desc(t)
    T = jnp.zeros((chi, chi, D2), dtype=dtype).at[0, 0, :].set(U[:, 0])
    return EnvC4v(C, T)


def init_random(key, chi: int, D2: int, dtype) -> EnvC4v:
    """Random hermitian environment (reference env_c4v.py:246-251)."""
    kC, kT = jax.random.split(key)
    real_dtype = jnp.zeros((), dtype).real.dtype
    if jnp.issubdtype(dtype, jnp.complexfloating):
        tmpC = jax.random.uniform(kC, (chi, chi, 2), dtype=real_dtype)
        tmpC = (tmpC[..., 0] + 1j * tmpC[..., 1]).astype(dtype)
        T = jax.random.uniform(kT, (chi, chi, D2, 2), dtype=real_dtype)
        T = (T[..., 0] + 1j * T[..., 1]).astype(dtype)
    else:
        tmpC = jax.random.uniform(kC, (chi, chi), dtype=dtype)
        T = jax.random.uniform(kT, (chi, chi, D2), dtype=dtype)
    C = 0.5 * (tmpC + tmpC.conj().T)
    return EnvC4v(C, T)


def init_from_ipeps_pbc(a, chi: int, dtype) -> EnvC4v:
    """Environment from on-site tensor with PBC trace
    (reference env_c4v.py:254-311).

    C = eigenvalues of the corner (s,u,l traced) double-layer matrix,
    T = the (u^2, d^2, r^2) transfer tensor rotated into the corner
    eigenbasis, both zero-padded to chi.
    """
    D = a.shape[1]
    D2 = D * D
    # corner: contract phys + up + left of ket with bra -> [d^2, r^2]
    c = jnp.einsum("mijef,mijab->eafb", a, jnp.conj(a)).reshape(D2, D2)
    c = c / jax.lax.stop_gradient(jnp.abs(c).max())
    Dspec, U = eigh_desc(c)

    n = min(chi, D2)
    C = jnp.zeros((chi, chi), dtype=dtype)
    C = C.at[:n, :n].set(jnp.diag(Dspec[:n]).astype(dtype))

    # left transfer tensor: contract phys + left -> [u^2, d^2, r^2]
    t = jnp.einsum("meifg,maibc->eafbgc", a, jnp.conj(a)).reshape(D2, D2, D2)
    t = t / jax.lax.stop_gradient(jnp.abs(t).max())
    # rotate environment indices into the corner eigenbasis (env_c4v.py:304)
    t = jnp.einsum("ai,abs,bj->ijs", U, t, jnp.conj(U))
    T = jnp.zeros((chi, chi, D2), dtype=dtype)
    T = T.at[:n, :n, :].set(t[:n, :n, :].astype(dtype))
    return EnvC4v(C, T)


def compute_multiplets(C, eps_multiplet_gap: float = 1.0e-10):
    """Degeneracy structure of the corner spectrum
    (reference env_c4v.py:401-417).  Host-side diagnostic."""
    D = jnp.abs(jnp.linalg.eigvalsh(C))
    D = jnp.sort(D)[::-1]
    D = jnp.concatenate([D, jnp.zeros(1, dtype=D.dtype)])
    m = []
    l = 0
    for i in range(C.shape[0]):
        l += 1
        if float(D[i] - D[i + 1]) > eps_multiplet_gap:
            m.append(l)
            l = 0
    return D[:-1], m


def env_c4v_to_generic(a, env: EnvC4v):
    """Expand the single (C, T) pair into the per-site/per-direction
    generic environment dictionaries (the inverse of the specialization
    ENV -> ENV_C4V, reference env_c4v.py:7-165): all four corners equal C
    (hermitian), T oriented per the generic index conventions
    (tpeps/ctm/generic/env.py:8-12).

    :return: ``(sites, vertexToSite, C_dict, T_dict)`` for a 1x1 cell
    """
    c = (0, 0)
    C_dict = {(c, v): env.C for v in ((-1, -1), (1, -1), (1, 1), (-1, 1))}
    T_dict = {
        (c, (0, -1)): env.T.transpose(0, 2, 1),
        (c, (-1, 0)): env.T,
        (c, (0, 1)): env.T.transpose(2, 0, 1),
        (c, (1, 0)): env.T.transpose(0, 2, 1),
    }
    return {c: a}, (lambda coord: c), C_dict, T_dict
