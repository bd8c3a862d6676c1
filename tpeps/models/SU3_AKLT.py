"""SU(3) AKLT model on the square lattice with a 3-site unit cell fused
into one physical index (counterpart of reference models/SU3_AKLT.py:57-144).

Site layout within the fused cell (reference SU3_AKLT.py:10-13)::

    1---3
     \\ /
      2

H = sum_triangles (P_123 + P_123^{-1}), where P cyclically permutes the
three SU(3) colors of a triangle.
"""

from __future__ import annotations

from math import sqrt

import numpy as np
import jax.numpy as jnp

from ..ctm.generic import corrf as corrf_gen
from ..ctm.generic import rdm as rdm_gen
from ..ctm.kagome import rdm_kagome


def fmap(n1, n2, n3):
    """(n1,n2,n3) -> fused physical index (reference SU3_AKLT.py:14)."""
    return n3 + 3 * n2 + 9 * n1


def fmap_inv(s):
    n1 = s // 9
    n2 = (s - 9 * n1) // 3
    return n1, n2, s - 9 * n1 - 3 * n2


def _perm_ops(dtype=jnp.float64):
    """Bond/triangle permutations on the fused 27-dim cell
    (reference SU3_AKLT.py:24-36)."""
    P12 = np.zeros((27, 27))
    P23 = np.zeros((27, 27))
    P31 = np.zeros((27, 27))
    Pt = np.zeros((27, 27))
    Pt2 = np.zeros((27, 27))
    for s in range(27):
        n1, n2, n3 = fmap_inv(s)
        P12[s, fmap(n2, n1, n3)] = 1.0
        P23[s, fmap(n1, n3, n2)] = 1.0
        P31[s, fmap(n3, n2, n1)] = 1.0
        Pt[s, fmap(n2, n3, n1)] = 1.0
        Pt2[s, fmap(n3, n1, n2)] = 1.0
    return tuple(jnp.asarray(m, dtype=dtype) for m in (P12, P23, P31, Pt, Pt2))


def _lambda_ops(dtype=jnp.float64):
    """Diagonal lambda_3 / lambda_8 color observables per fused site
    (reference SU3_AKLT.py:39-55)."""
    l3 = np.diag([1.0, -1.0, 0.0])
    l8 = np.diag([1.0, 1.0, -2.0]) / sqrt(3.0)
    out = {}
    for name, l in (("l3", l3), ("l8", l8)):
        for k in range(3):
            op = np.eye(27)
            for s in range(27):
                ns = fmap_inv(s)
                op[s, s] = l[ns[k], ns[k]]
            out[f"{name}_{k+1}"] = jnp.asarray(op, dtype=dtype)
    return out


class SU3_AKLT:
    """(reference SU3_AKLT.py:57)."""

    def __init__(self, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 27
        self.P12, self.P23, self.P31, self.P123, self.P123m = _perm_ops(dtype)
        self.lambda_ops = _lambda_ops(dtype)

    def energy_triangle(self, state, env):
        """Energy of the down triangle (within the cell) from the 1x1 RDM
        (reference SU3_AKLT.py:73-81)."""
        h = self.P123 + self.P123m
        rho = rdm_gen.rdm1x1((0, 0), state.sites, state.vertexToSite, env.C, env.T)
        return (2 / 3) * jnp.trace(rho @ h)

    def energy_triangle_up(self, state, env):
        """Energy of the up triangle spanning three cells, via the open
        up-triangle RDM (reference SU3_AKLT.py:83-106)."""
        rho = rdm_kagome.rdm2x2_up_triangle_open(
            (0, 0), state.sites, state.vertexToSite, env.C, env.T, 3
        )
        h = (self.P123 + self.P123m).reshape((3,) * 6)
        return (2 / 3) * jnp.einsum("ijkmno,mnoijk", rho, h)

    def eval_lambdas(self, state, env):
        """<lambda_3>, <lambda_8> for the three sites of the cell
        (reference SU3_AKLT.py:109-120)."""
        rho = rdm_gen.rdm1x1((0, 0), state.sites, state.vertexToSite, env.C, env.T)
        c3 = tuple(jnp.trace(rho @ self.lambda_ops[f"l3_{k}"]) for k in (1, 2, 3))
        c8 = tuple(jnp.trace(rho @ self.lambda_ops[f"l8_{k}"]) for k in (1, 2, 3))
        return c3, c8

    def eval_corrf_LL(self, direction, state, env, dist=10):
        """lambda_3-lambda_3 and lambda_8-lambda_8 correlators
        (reference SU3_AKLT.py:122-135)."""
        o3 = self.lambda_ops["l3_1"]
        o8 = self.lambda_ops["l8_1"]
        L3 = corrf_gen.corrf_1sO1sO((0, 0), direction, state, env, o3, lambda r: o3, dist)
        L8 = corrf_gen.corrf_1sO1sO((0, 0), direction, state, env, o8, lambda r: o8, dist)
        return L3, L8

    def eval_corrf_PP(self, direction, state, env, dist=10):
        """Connected P-P correlator (reference SU3_AKLT.py:137-144)."""
        O1 = self.P123 + self.P123m
        PP = corrf_gen.corrf_1sO1sO((0, 0), direction, state, env, O1, lambda r: O1, dist)
        e_t = 1.5 * self.energy_triangle(state, env)
        return PP - e_t**2
