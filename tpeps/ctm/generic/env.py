"""Generic CTM environment for arbitrary rectangular unit cells.

Counterpart of reference ctm/generic/env.py:14-875.  Per site (x,y) of
the unit cell there are 4 corners ``C[(coord,(dx,dy))]`` (chi x chi,
(dx,dy) in {(-1,-1),(1,-1),(1,1),(-1,1)}) and 4 half-row/-column
tensors ``T[(coord,dir)]``:

* ``T[(c,(0,-1))]`` top:    (chi_left, D^2_down, chi_right)
* ``T[(c,(-1,0))]`` left:   (chi_up, chi_down, D^2_right)
* ``T[(c,(0,1))]``  bottom: (D^2_up, chi_left, chi_right)
* ``T[(c,(1,0))]``  right:  (chi_up, D^2_left, chi_down)

Index order starts in direction "up" and continues anti-clockwise
(reference env.py:55-75); fused D^2 legs are (ket, bra) with ket major.

The dicts of jnp arrays are pytrees: the whole environment flows
through ``jit`` and ``jax.vjp`` directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CORNER_VECS = ((-1, -1), (1, -1), (1, 1), (-1, 1))
EDGE_VECS = ((0, -1), (-1, 0), (0, 1), (1, 0))


class ENV:
    """Host-side container; compute functions receive the raw dicts."""

    def __init__(self, chi: int, C=None, T=None):
        self.chi = chi
        self.C = dict(C) if C else {}
        self.T = dict(T) if T else {}

    def get_spectra(self):
        """Singular values of every corner (reference env.py:179-209)."""
        return {k: jnp.linalg.svd(c, compute_uv=False) for k, c in self.C.items()}

    def clone(self):
        return ENV(self.chi, dict(self.C), dict(self.T))


def _zero_pad_into(t, shape, dtype):
    out = jnp.zeros(shape, dtype=dtype)
    sl = tuple(slice(0, min(a, b)) for a, b in zip(t.shape, shape))
    return out.at[sl].set(t[sl])


def init_env(state, chi: int, init_type: str = "CTMRG", key=None) -> ENV:
    """Initialize environment (reference env.py:235-716 dispatch)."""
    if init_type == "CTMRG":
        return init_from_ipeps_pbc(state, chi)
    if init_type == "CTMRG_OBC":
        return init_from_ipeps_obc(state, chi)
    if init_type == "PROD":
        return init_prod(state, chi)
    if init_type == "RANDOM":
        assert key is not None, "RANDOM init requires PRNG key"
        return init_random(state, chi, key)
    raise ValueError(f"Invalid environment initialization: {init_type}")


def init_prod(state, chi: int) -> ENV:
    env = ENV(chi)
    dtype = state.dtype
    for coord, site in state.sites.items():
        for vec in CORNER_VECS:
            env.C[(coord, vec)] = jnp.zeros((chi, chi), dtype=dtype).at[0, 0].set(1.0)
        d = site.shape
        env.T[(coord, (0, -1))] = jnp.zeros((chi, d[3] ** 2, chi), dtype=dtype).at[0, :, 0].set(1.0)
        env.T[(coord, (-1, 0))] = jnp.zeros((chi, chi, d[4] ** 2), dtype=dtype).at[0, 0, :].set(1.0)
        env.T[(coord, (0, 1))] = jnp.zeros((d[1] ** 2, chi, chi), dtype=dtype).at[:, 0, 0].set(1.0)
        env.T[(coord, (1, 0))] = jnp.zeros((chi, d[2] ** 2, chi), dtype=dtype).at[0, :, 0].set(1.0)
    return env


def init_random(state, chi: int, key) -> ENV:
    env = ENV(chi)
    dtype = state.dtype
    for coord, site in state.sites.items():
        d = site.shape
        for vec in CORNER_VECS:
            key, sub = jax.random.split(key)
            env.C[(coord, vec)] = jax.random.uniform(sub, (chi, chi), dtype=dtype)
        for vec, shape in (
            ((0, -1), (chi, d[3] ** 2, chi)),
            ((-1, 0), (chi, chi, d[4] ** 2)),
            ((0, 1), (d[1] ** 2, chi, chi)),
            ((1, 0), (chi, d[2] ** 2, chi)),
        ):
            key, sub = jax.random.split(key)
            env.T[(coord, vec)] = jax.random.uniform(sub, shape, dtype=dtype)
    return env


def init_from_ipeps_obc(state, chi: int) -> ENV:
    """Environment from OBC double-layer tensors (reference
    env.py:538-660 ``init_from_ipeps_obc``): like the PBC init but the
    outward legs are closed with the product |+> boundary — summed
    independently in ket and bra instead of traced against each other."""
    env = ENV(chi)
    dtype = state.dtype

    def dl(A, sum_axes, spec):
        As = jnp.sum(A, axis=sum_axes)
        a = jnp.einsum(spec, As, jnp.conj(As))
        sh = a.shape
        fused = [sh[i] * sh[i + 1] for i in range(0, len(sh), 2)]
        a = a.reshape(fused)
        return a / jax.lax.stop_gradient(jnp.abs(a).max())

    # outward legs summed per layer (|+> boundary); kept legs fused
    specs_c = {
        (-1, -1): ((1, 2), "mef,mab->eafb"),
        (1, -1): ((1, 4), "mef,mab->eafb"),
        (1, 1): ((3, 4), "mef,mab->eafb"),
        (-1, 1): ((2, 3), "mef,mab->eafb"),
    }
    specs_t = {
        (0, -1): ((1,), "mefg,mabc->eafbgc", lambda t: (chi, t.shape[1], chi)),
        (-1, 0): ((2,), "mefg,mabc->eafbgc", lambda t: (chi, chi, t.shape[2])),
        (0, 1): ((3,), "mefg,mabc->eafbgc", lambda t: (t.shape[0], chi, chi)),
        (1, 0): ((4,), "mefg,mabc->eafbgc", lambda t: (chi, t.shape[1], chi)),
    }
    for coord in state.sites:
        for (dx, dy), (axes, spec) in specs_c.items():
            A = state.site((coord[0] + dx, coord[1] + dy))
            env.C[(coord, (dx, dy))] = _zero_pad_into(
                dl(A, axes, spec), (chi, chi), dtype)
        for (dx, dy), (axes, spec, shape_of) in specs_t.items():
            A = state.site((coord[0] + dx, coord[1] + dy))
            t = dl(A, axes, spec)
            env.T[(coord, (dx, dy))] = _zero_pad_into(t, shape_of(t), dtype)
    return env


def init_from_ipeps_pbc(state, chi: int) -> ENV:
    """Environment from PBC-traced double-layer tensors
    (reference env.py:367-446): each corner/edge is the neighbouring
    site's double layer with the outward legs traced."""
    env = ENV(chi)
    dtype = state.dtype

    def dl(A, spec):
        a = jnp.einsum(spec, A, jnp.conj(A))
        sh = a.shape
        fused = [sh[i] * sh[i + 1] for i in range(0, len(sh), 2)]
        a = a.reshape(fused)
        return a / jax.lax.stop_gradient(jnp.abs(a).max())

    for coord in state.sites:
        # corners: trace phys + two outward directions (reference env.py:378-414)
        A = state.site((coord[0] - 1, coord[1] - 1))
        c = dl(A, "mijef,mijab->eafb")  # [d^2, r^2]
        env.C[(coord, (-1, -1))] = _zero_pad_into(c, (chi, chi), dtype)

        A = state.site((coord[0] + 1, coord[1] - 1))
        c = dl(A, "miefj,miabj->eafb")  # [l^2, d^2]
        env.C[(coord, (1, -1))] = _zero_pad_into(c, (chi, chi), dtype)

        A = state.site((coord[0] + 1, coord[1] + 1))
        c = dl(A, "mefij,mabij->eafb")  # [u^2, l^2]
        env.C[(coord, (1, 1))] = _zero_pad_into(c, (chi, chi), dtype)

        A = state.site((coord[0] - 1, coord[1] + 1))
        c = dl(A, "meijf,maijb->eafb")  # [u^2, r^2]
        env.C[(coord, (-1, 1))] = _zero_pad_into(c, (chi, chi), dtype)

        # edges: trace phys + one outward direction (reference env.py:416-446)
        A = state.site((coord[0], coord[1] - 1))
        t = dl(A, "miefg,miabc->eafbgc")  # [l^2, d^2, r^2]
        env.T[(coord, (0, -1))] = _zero_pad_into(t, (chi, t.shape[1], chi), dtype)

        A = state.site((coord[0] - 1, coord[1]))
        t = dl(A, "meifg,maibc->eafbgc")  # [u^2, d^2, r^2]
        env.T[(coord, (-1, 0))] = _zero_pad_into(t, (chi, chi, t.shape[2]), dtype)

        A = state.site((coord[0], coord[1] + 1))
        t = dl(A, "mefig,mabic->eafbgc")  # [u^2, l^2, r^2]
        env.T[(coord, (0, 1))] = _zero_pad_into(t, (t.shape[0], chi, chi), dtype)

        A = state.site((coord[0] + 1, coord[1]))
        t = dl(A, "mefgi,mabci->eafbgc")  # [u^2, l^2, d^2]
        env.T[(coord, (1, 0))] = _zero_pad_into(t, (chi, t.shape[1], chi), dtype)
    return env
