"""su(3) operator algebra, defining representation (p,q)=(1,0).

Counterpart of reference groups/su3.py:6-248 (``SU3_DEFINING``):
Cartan-Weyl basis built from the Gell-Mann matrices,

    T^+- = (l1 +- i l2)/2,  T^z = l3/2,
    V^+- = (l4 +- i l5)/2,  U^+- = (l6 +- i l7)/2,  Y = l8/sqrt(3)

with the quadratic Casimir C1 = T^z T^z + 3/4 Y Y + (T+T- + T-T+ +
V+V- + V-V+ + U+U- + U-U+)/2 and the cubic Casimir C2.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class SU3_DEFINING:
    def __init__(self, p=1, q=0, dtype=jnp.complex128):
        assert (p, q) == (1, 0), f"su(3) irrep ({p},{q}) not implemented."
        self.p, self.q = p, q
        self.dtype = dtype

    def _m(self, entries):
        M = np.zeros((3, 3), dtype=complex)
        for (i, j), v in entries.items():
            M[i, j] = v
        return jnp.asarray(M, dtype=self.dtype)

    def I(self):
        return jnp.eye(3, dtype=self.dtype)

    def TZ(self):
        return self._m({(0, 0): 0.5, (1, 1): -0.5})

    def Y(self):
        return self._m({(0, 0): 1 / 3, (1, 1): 1 / 3, (2, 2): -2 / 3})

    def TP(self):
        return self._m({(0, 1): 1.0})

    def TM(self):
        return self._m({(1, 0): 1.0})

    def VP(self):
        return self._m({(0, 2): 1.0})

    def VM(self):
        return self._m({(2, 0): 1.0})

    def UP(self):
        return self._m({(1, 2): 1.0})

    def UM(self):
        return self._m({(2, 1): 1.0})

    def Cartan_Weyl(self):
        """Generators stacked as [T+, T-, Tz, V+, V-, U+, U-, Y]
        (reference su3.py:111-128)."""
        return jnp.stack([self.TP(), self.TM(), self.TZ(), self.VP(),
                          self.VM(), self.UP(), self.UM(), self.Y()])

    def J_Gell_Mann(self):
        """Vector of the eight Gell-Mann matrices (reference su3.py:130-147)."""
        return jnp.stack([
            self.TP() + self.TM(),
            -1j * (self.TP() - self.TM()),
            2 * self.TZ(),
            self.VP() + self.VM(),
            -1j * (self.VP() - self.VM()),
            self.UP() + self.UM(),
            -1j * (self.UP() - self.UM()),
            np.sqrt(3.0) * self.Y(),
        ])

    def C1(self):
        """Quadratic Casimir as a 2-site rank-4 tensor [i,j,a,b]
        (reference su3.py:149-161)."""
        kron = lambda x, y: jnp.einsum("ij,ab->iajb", x, y)
        return (
            kron(self.TZ(), self.TZ()) + 0.75 * kron(self.Y(), self.Y())
            + 0.5 * (kron(self.TP(), self.TM()) + kron(self.TM(), self.TP())
                     + kron(self.VP(), self.VM()) + kron(self.VM(), self.VP())
                     + kron(self.UP(), self.UM()) + kron(self.UM(), self.UP()))
        )

    def C2(self):
        """Cubic Casimir as a 3-site rank-6 tensor (reference su3.py:163-188):
        C2 = sum_{ijk} d_ijk F_i F_j F_k with d_ijk = 2 tr({F_i,F_j} F_k)."""
        F = np.asarray(self.J_Gell_Mann()) / 2.0
        # d-symbol via trace; contraction vectorized over numpy
        d = 2.0 * np.einsum("iab,jbc,kca->ijk", F, F, F) \
            + 2.0 * np.einsum("jab,ibc,kca->ijk", F, F, F)
        C2 = np.einsum("ijk,ixa,jyb,kzc->xyzabc", d, F, F, F)
        return jnp.asarray(C2, dtype=self.dtype)
