"""SU(3) chiral model on the kagome lattice, fused 3-site cell.

Counterpart of reference models/SU3_chiral.py:90-234 (``SU3_CHIRAL``):

H = (Kr + i Ki) P_t + (Kr - i Ki) P_t^{-1} + j1 * (P_12 + P_23 + P_31)
per triangle, on an iPEPS whose physical index fuses the three kagome
DoF of the down triangle (d = 27).
"""

from __future__ import annotations

from math import sqrt

import numpy as np
import jax.numpy as jnp

from ..ctm.generic import rdm as rdm_gen
from ..ctm.kagome import rdm_kagome
from .SU3_AKLT import fmap, fmap_inv


def _build_ops():
    """(reference SU3_chiral.py:34-87)."""
    exchange_bond = np.zeros((3, 3, 3, 3))
    for i in range(3):
        for j in range(3):
            exchange_bond[i, j, j, i] = 1.0

    exchange_bond_triangle = np.zeros((3,) * 6)
    permute_triangle = np.zeros((3,) * 6)
    permute_triangle_inv = np.zeros((3,) * 6)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                exchange_bond_triangle[i, j, k, j, i, k] = 1.0  # 1-2
                exchange_bond_triangle[i, j, k, i, k, j] = 1.0  # 2-3
                exchange_bond_triangle[i, j, k, k, j, i] = 1.0  # 3-1
                permute_triangle[i, j, k, j, k, i] = 1.0  # anticlockwise
                permute_triangle_inv[i, j, k, k, i, j] = 1.0  # clockwise
    return (jnp.asarray(exchange_bond), jnp.asarray(exchange_bond_triangle),
            jnp.asarray(permute_triangle), jnp.asarray(permute_triangle_inv))


EXCHANGE_BOND, EXCHANGE_BOND_TRIANGLE, PERMUTE_TRIANGLE, PERMUTE_TRIANGLE_INV = _build_ops()


class SU3_CHIRAL:
    """(reference SU3_chiral.py:90)."""

    def __init__(self, Kr=0.0, Ki=0.0, j1=0.0, j2=0.0, dtype=jnp.complex128):
        self.Kr, self.Ki, self.j1, self.j2 = Kr, Ki, j1, j2
        self.dtype = dtype
        self.phys_dim = 3
        self.id_downT = jnp.eye(27, dtype=dtype)
        self.h_triangle = (
            (Kr + 1j * Ki) * PERMUTE_TRIANGLE
            + (Kr - 1j * Ki) * PERMUTE_TRIANGLE_INV
            + j1 * EXCHANGE_BOND_TRIANGLE
        ).astype(dtype)
        l3 = np.diag([1.0, -1.0, 0.0])
        l8 = np.diag([1.0, 1.0, -2.0]) / sqrt(3.0)
        self.obs_ops = {"l3": jnp.asarray(l3, dtype=dtype),
                        "l8": jnp.asarray(l8, dtype=dtype)}
        for name, l in (("l3", l3), ("l8", l8)):
            for k in range(3):
                op = np.eye(27, dtype=complex)
                for s in range(27):
                    ns = fmap_inv(s)
                    op[s, s] = l[ns[k], ns[k]]
                self.obs_ops[f"{name}_{k+1}"] = jnp.asarray(op, dtype=dtype)

    # ------------------------------------------------------------ energies
    def energy_triangle_dn(self, state, env):
        """(reference SU3_chiral.py:112-115)."""
        e, _ = rdm_kagome.rdm2x2_dn_triangle_with_operator(
            (0, 0), dict(state.sites), state.vertexToSite, env.C, env.T,
            self.h_triangle, 3)
        return e.real if jnp.iscomplexobj(e) else e

    def energy_triangle_up(self, state, env):
        """(reference SU3_chiral.py:117-121)."""
        rho = rdm_kagome.rdm2x2_up_triangle_open(
            (0, 0), dict(state.sites), state.vertexToSite, env.C, env.T, 3)
        e = jnp.einsum("ijkmno,mnoijk", rho, self.h_triangle)
        return e.real if jnp.iscomplexobj(e) else e

    # ---------------------------------------------------------- observables
    def P_dn(self, state, env):
        v, _ = rdm_kagome.rdm2x2_dn_triangle_with_operator(
            (0, 0), dict(state.sites), state.vertexToSite, env.C, env.T,
            PERMUTE_TRIANGLE.astype(self.dtype), 3)
        return v

    def P_up(self, state, env):
        rho = rdm_kagome.rdm2x2_up_triangle_open(
            (0, 0), dict(state.sites), state.vertexToSite, env.C, env.T, 3)
        return jnp.einsum("ijkmno,mnoijk", rho, PERMUTE_TRIANGLE.astype(self.dtype))

    def P_bonds_nn(self, state, env):
        """Intra-cell bond-exchange expectations via the 1x1 RDM
        (reference SU3_chiral.py:152-177)."""
        rho = rdm_gen.rdm1x1((0, 0), state.sites, state.vertexToSite, env.C, env.T)
        norm = jnp.trace(rho)

        def bond_op(permuter):
            op = np.zeros((27, 27))
            for i in range(3):
                for j in range(3):
                    for k in range(3):
                        op[fmap(i, j, k), fmap(*permuter(i, j, k))] = 1.0
            return jnp.asarray(op, dtype=rho.dtype)

        vP_23 = jnp.trace(rho @ bond_op(lambda i, j, k: (i, k, j))) / norm
        vP_13 = jnp.trace(rho @ bond_op(lambda i, j, k: (k, j, i))) / norm
        vP_12 = jnp.trace(rho @ bond_op(lambda i, j, k: (j, i, k))) / norm
        return vP_23.real, vP_13.real, vP_12.real

    def eval_lambdas(self, state, env):
        """(reference SU3_chiral.py:178-188)."""
        rho = rdm_gen.rdm1x1((0, 0), state.sites, state.vertexToSite, env.C, env.T)
        norm = jnp.trace(rho)
        c3 = tuple(jnp.trace(rho @ self.obs_ops[f"l3_{k}"]) / norm for k in (1, 2, 3))
        c8 = tuple(jnp.trace(rho @ self.obs_ops[f"l8_{k}"]) / norm for k in (1, 2, 3))
        return c3, c8

    def eval_obs(self, state, env):
        """(reference SU3_chiral.py:216-234)."""
        rho = rdm_gen.rdm1x1((0, 0), state.sites, state.vertexToSite, env.C, env.T)
        norm = jnp.trace(rho)
        labels = ["l3_1", "l3_2", "l3_3", "l8_1", "l8_2", "l8_3"]
        vals = [jnp.trace(rho @ self.obs_ops[l]) / norm for l in labels]
        return vals, labels
