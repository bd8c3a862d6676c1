"""SU(2) irrep operator algebra (counterpart of reference groups/su2.py:5-207).

Operators are built in numpy and returned as jnp arrays of the requested
dtype; they are tiny (m x m) constants baked into jitted Hamiltonian
contractions.
"""

from __future__ import annotations

from math import factorial, sqrt

import jax.numpy as jnp
import numpy as np


class SU2:
    """Spin irrep of dimension ``J`` (physical spin S = (J-1)/2)."""

    def __init__(self, J: int, dtype=jnp.float64):
        self.J = J
        self.dtype = dtype

    def I(self):
        return jnp.asarray(np.eye(self.J), dtype=self.dtype)

    def I_N(self, N: int):
        """Identity over N irreps as a rank-2N tensor (reference su2.py:38-48)."""
        return jnp.asarray(np.eye(self.J**N), dtype=self.dtype).reshape([self.J] * (2 * N))

    def SZ(self):
        m = self.J
        d = np.array([-0.5 * (-(m - 1) + 2 * i) for i in range(m)])
        return jnp.asarray(np.diag(d), dtype=self.dtype)

    def SP(self):
        """S^+ raising operator (reference su2.py:127-147)."""
        m = self.J
        res = np.zeros((m, m))
        for i in range(m - 1):
            res[i, i + 1] = sqrt(
                0.5 * (m - 1) * (0.5 * (m - 1) + 1)
                - (-0.5 * (m - 1) + i) * (-0.5 * (m - 1) + i + 1)
            )
        return jnp.asarray(res, dtype=self.dtype)

    def SM(self):
        """S^- lowering operator (reference su2.py:149-169)."""
        m = self.J
        res = np.zeros((m, m))
        for i in range(1, m):
            res[i, i - 1] = sqrt(
                0.5 * (m - 1) * (0.5 * (m - 1) + 1)
                - (-0.5 * (m - 1) + i) * (-0.5 * (m - 1) + i - 1)
            )
        return jnp.asarray(res, dtype=self.dtype)

    def SY(self):
        assert jnp.issubdtype(self.dtype, jnp.complexfloating), "SY requires complex dtype"
        return -0.5j * (self.SP() - self.SM())

    def BP_rot(self):
        return get_rot_op(self.J, dtype=self.dtype)

    def S(self):
        """Rank-3 stack [S^z, S^x, (S^y)] (reference su2.py:82-92)."""
        ops = [self.SZ(), 0.5 * (self.SP() + self.SM())]
        if jnp.issubdtype(self.dtype, jnp.complexfloating):
            ops.append(-0.5j * (self.SP() - self.SM()))
        else:
            ops.append(jnp.zeros((self.J, self.J), dtype=self.dtype))
        return jnp.stack(ops)

    def SS(self, xyz=(1.0, 1.0, 1.0)):
        """Two-site ``S.S`` as rank-4 tensor ``[i,a,j,b]`` = <ij|op|ab> per site
        pair, i.e. ``xyz0 Sz Sz + xyz1/2 (S+ S- + h.c.)`` in the reference's
        ``iajb`` kron layout (reference su2.py:94-111)."""
        kron = lambda x, y: jnp.einsum("ij,ab->iajb", x, y)
        return (
            xyz[0] * kron(self.SZ(), self.SZ())
            + 0.5 * xyz[1] * kron(self.SP(), self.SM())
            + 0.5 * xyz[2] * kron(self.SM(), self.SP())
        )


def get_rot_op(m: int, dtype=jnp.float64):
    """Bipartite sublattice-rotation operator (reference su2.py:171-175)."""
    res = np.zeros((m, m))
    for i in range(m):
        res[i, m - 1 - i] = (-1) ** i
    return jnp.asarray(res, dtype=dtype)


def get_CG(J, J1, J2):
    """Clebsch-Gordan coefficient <J,m|J1,m1;J2,m2> in Dynkin notation
    (reference su2.py:177-207)."""
    cg = 0.0
    if J[1] == J1[1] + J2[1]:
        prefactor = sqrt(
            (J[0] + 1.0)
            * factorial((J[0] + J1[0] - J2[0]) // 2)
            * factorial((J[0] - J1[0] + J2[0]) // 2)
            * factorial((J1[0] + J2[0] - J[0]) // 2)
            / factorial((J1[0] + J2[0] + J[0]) // 2 + 1)
        ) * sqrt(
            factorial((J[0] + J[1]) // 2)
            * factorial((J[0] - J[1]) // 2)
            * factorial((J1[0] - J1[1]) // 2)
            * factorial((J1[0] + J1[1]) // 2)
            * factorial((J2[0] - J2[1]) // 2)
            * factorial((J2[0] + J2[1]) // 2)
        )
        min_k = min((J1[0] + J2[0]) // 2, J2[0])
        sum_k = 0.0
        for k in range(min_k + 1):
            if (
                (J1[0] + J2[0] - J[0]) // 2 - k >= 0
                and (J1[0] - J1[1]) // 2 - k >= 0
                and (J2[0] + J2[1]) // 2 - k >= 0
                and (J[0] - J2[0] + J1[1]) // 2 + k >= 0
                and (J[0] - J1[0] - J2[1]) // 2 + k >= 0
            ):
                sum_k += ((-1) ** k) / (
                    factorial(k)
                    * factorial((J1[0] + J2[0] - J[0]) // 2 - k)
                    * factorial((J1[0] - J1[1]) // 2 - k)
                    * factorial((J2[0] + J2[1]) // 2 - k)
                    * factorial((J[0] - J2[0] + J1[1]) // 2 + k)
                    * factorial((J[0] - J1[0] - J2[1]) // 2 + k)
                )
        cg = prefactor * sum_k
    return cg
