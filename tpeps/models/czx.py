"""CZX SPT model (Chen-Liu-Wen, PRB 84, 235141) with MPO-symmetric
perturbations.

Counterpart of reference models/czx.py:218-287 (``CZX``): each iPEPS site
fuses four spin-1/2 DoFs at the corners of a vertex (local order
0,1 / 3,2 clockwise, fused by sequential kron); the plaquette
Hamiltonian is the product of four Bell-pair projectors on the
half-plaquettes and an interior 4-spin tunneling term, evaluated through
its 4-site MPO representation (reference builds it with YASTN MPO
algebra, czx.py:64-153; here the same sum-of-products MPOs are built and
multiplied densely with numpy).
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import jax.numpy as jnp

from ..ctm.generic import rdm as rdm_gen
from ..ctm.generic.rdm_mpo import eval_mpo_rdm1x3, eval_mpo_rdm2x2, eval_mpo_rdm3x1

_X = np.array([[0.0, 1.0], [1.0, 0.0]])
_Z = np.array([[1.0, 0.0], [0.0, -1.0]])
_I2 = np.eye(2)
_P0 = np.diag([1.0, 0.0])
_P1 = np.diag([0.0, 1.0])
_SP = np.array([[0.0, 1.0], [0.0, 0.0]])


def _embed(op, pos):
    """Embed a 1-spin operator at local spin ``pos`` of a fused site."""
    return np.kron(np.eye(2**pos), np.kron(op, np.eye(2 ** (3 - pos))))


def _sum_of_products_mpo(terms):
    """MPO over the 4 fused sites for ``sum_k prod_i A_k^i``
    (per-site 16x16 operators); bond dimension = number of terms."""
    K = len(terms)
    d = 16
    M = []
    M0 = np.zeros((1, d, K, d))
    for k, ops in enumerate(terms):
        M0[0, :, k, :] = ops[0]
    M.append(M0)
    for i in (1, 2):
        Mi = np.zeros((K, d, K, d))
        for k, ops in enumerate(terms):
            Mi[k, :, k, :] = ops[i]
        M.append(Mi)
    M3 = np.zeros((K, d, 1, d))
    for k, ops in enumerate(terms):
        M3[k, :, 0, :] = ops[3]
    M.append(M3)
    return M


def _mpo_multiply(F, G):
    """Operator product of two dense MPOs (F applied after G):
    per-site contraction over the shared physical index."""
    out = []
    for f, g in zip(F, G):
        m = np.einsum("asbt,ctdu->acsbdu", f, g)
        s = m.shape
        out.append(m.reshape(s[0] * s[1], s[2], s[3] * s[4], s[5]))
    return out


def _mpo_compress(M, tol=1.0e-12):
    """Left-to-right SVD sweep reducing MPO bond dimensions."""
    out = [np.asarray(m) for m in M]
    for i in range(len(out) - 1):
        b0, d, b1, d2 = out[i].shape
        m = out[i].transpose(0, 1, 3, 2).reshape(b0 * d * d2, b1)
        U, S, Vh = np.linalg.svd(m, full_matrices=False)
        k = max(1, int((S > tol * max(S[0], 1e-300)).sum()))
        out[i] = U[:, :k].reshape(b0, d, d2, k).transpose(0, 1, 3, 2)
        out[i + 1] = np.einsum("ab,bscd->ascd", (S[:k, None] * Vh[:k]), out[i + 1])
    return out


def get_h_czx_mpo():
    """The CZX plaquette Hamiltonian as a 4-site MPO over fused sites in
    row-major plaquette order UL, UR, LL, LR (reference czx.py:64-153).

    Global spin layout (reference czx.py:73-80)::

         0,1    4,5
         3,2----7,6
           |    |
         8,9----12,13
       11,10    15,14
    """
    I16 = np.eye(16)

    def pair_mpo(site_a, pos_a, site_b, pos_b):
        ops0 = [I16] * 4
        ops1 = [I16] * 4
        ops0[site_a], ops0[site_b] = _embed(_P0, pos_a), _embed(_P0, pos_b)
        ops1[site_a], ops1[site_b] = _embed(_P1, pos_a), _embed(_P1, pos_b)
        return _sum_of_products_mpo([ops0, ops1])

    # Bell projectors on half-plaquettes: global pairs (1,4), (6,13),
    # (15,10), (3,8) -> (site, local) coordinates
    factors = [
        pair_mpo(0, 1, 1, 0),
        pair_mpo(1, 2, 3, 1),
        pair_mpo(3, 3, 2, 2),
        pair_mpo(0, 3, 2, 0),
    ]
    # interior tunneling on (2,7,12,9): Sp^4 + Sm^4
    t_up = [_embed(_SP, 2), _embed(_SP, 3), _embed(_SP, 1), _embed(_SP, 0)]
    t_dn = [m.T for m in t_up]
    factors.append(_sum_of_products_mpo([t_up, t_dn]))

    h = reduce(_mpo_multiply, factors)
    h[0] = -h[0]
    h = _mpo_compress(h)
    return tuple(jnp.asarray(m) for m in h)


def get_H_zxz(dtype=jnp.float64):
    """On-site Z/X strip operators (reference czx.py:155-183)."""
    kron4 = lambda a, b, c, d: np.kron(a, np.kron(b, np.kron(c, d)))
    proj = (kron4(_I2, _I2, _I2, _I2) - kron4(_Z, _Z, _Z, _Z)) / 2.0
    Xa = (0.5 * kron4(_I2, _X, _X, _I2) + 0.5 * kron4(_X, _I2, _I2, _X)) @ proj
    Xb = (0.5 * kron4(_X, _X, _I2, _I2) + 0.5 * kron4(_I2, _I2, _X, _X)) @ proj
    Za = 0.5 * kron4(_I2, _I2, _Z, _Z) - 0.5 * kron4(_Z, _Z, _I2, _I2)
    Zb = 0.5 * kron4(_I2, _Z, _Z, _I2) - 0.5 * kron4(_Z, _I2, _I2, _Z)
    return tuple(jnp.asarray(m, dtype=dtype) for m in (Za, Xa, Zb, Xb))


def czx_ground_state():
    """Exact CZX ground-state PEPS: a 4-spin GHZ on every plaquette via
    copy tensors delta[s,a,b]; A[(s0 s1 s2 s3), u=(uL uR), l=(lU lD),
    d=(dL dR), r=(rU rD)] (reference examples/czx/optim_czx.py A_czx)."""
    import numpy as np

    delta = np.zeros((2, 2, 2))
    delta[0, 0, 0] = delta[1, 1, 1] = 1.0
    A = np.einsum("aup,bvq,cwr,dxs->abcduvpsxwqr",
                  delta, delta, delta, delta)
    A = A.reshape(16, 4, 4, 4, 4)
    return jnp.asarray(A / np.abs(A).max())


class CZX:
    """(reference czx.py:218)."""

    def __init__(self, g_czx=1.0, g_zxz=0.0, V=0.0, delta=0.0,
                 zxz_x_projected=True, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 16
        self.g_czx, self.g_zxz, self.V, self.delta = g_czx, g_zxz, V, delta

        self.h_p_czx = get_h_czx_mpo()
        kron4 = lambda a, b, c, d: np.kron(a, np.kron(b, np.kron(c, d)))
        self.U_Z = jnp.asarray(kron4(_Z, _Z, _Z, _Z), dtype=dtype)
        self.U_X = jnp.asarray(kron4(_X, _X, _X, _X), dtype=dtype)
        self.h_site = jnp.asarray(
            -(0.5 * delta) * (kron4(_X, _Z, _I2, _Z) + kron4(_Z, _X, _Z, _I2)
                              + kron4(_I2, _Z, _X, _Z) + kron4(_Z, _I2, _Z, _X)),
            dtype=dtype)
        Za, Xa, Zb, Xb = get_H_zxz(dtype)
        if zxz_x_projected:
            I = jnp.eye(16, dtype=dtype)
            Xa = Xa @ (I - self.U_Z) * 0.5
            Xb = Xb @ (I - self.U_Z) * 0.5
        self.Za, self.Xa, self.Zb, self.Xb = Za, Xa, Zb, Xb

    @staticmethod
    def _as_mpo1(op):
        """One-site operator as an MPO tensor [1, ket, 1, bra]: the ket
        slot carries the operator's input index."""
        return jnp.asarray(op).T.reshape(1, 16, 1, 16)

    def eval_H_ops(self, state, env):
        """Plaquette, ZXZ-strip and on-site expectations over the cell
        (reference czx.py:247-283, Eq. 45)."""
        sites, site_of = dict(state.sites), state.vertexToSite
        C, T = env.C, env.T
        id1 = self._as_mpo1(jnp.eye(16, dtype=self.dtype))
        mpo_ZaXaZa = (self._as_mpo1(self.Za), self._as_mpo1(self.Xa),
                      self._as_mpo1(self.Za))
        mpo_ZbXbZb = (self._as_mpo1(self.Zb), self._as_mpo1(self.Xb),
                      self._as_mpo1(self.Zb))

        eczx = ezxza = ezxzb = e_uz = e_ux = e_hz = 0.0
        for coord in state.sites:
            rho = rdm_gen.rdm1x1(coord, sites, site_of, C, T)
            norm = jnp.trace(rho)
            e_uz += jnp.trace(rho @ self.U_Z) / norm
            e_ux += jnp.trace(rho @ self.U_X) / norm
            e_hz += jnp.trace(rho @ self.h_site) / norm

            num = eval_mpo_rdm2x2(coord, sites, site_of, C, T, self.h_p_czx)
            den = eval_mpo_rdm2x2(coord, sites, site_of, C, T, (id1,) * 4)
            eczx += num / den

            num = eval_mpo_rdm1x3(coord, sites, site_of, C, T, mpo_ZaXaZa)
            den = eval_mpo_rdm1x3(coord, sites, site_of, C, T, (id1,) * 3)
            ezxza += num / den

            num = eval_mpo_rdm3x1(coord, sites, site_of, C, T, mpo_ZbXbZb)
            den = eval_mpo_rdm3x1(coord, sites, site_of, C, T, (id1,) * 3)
            ezxzb += num / den
        n = len(state.sites)
        return tuple(x / n for x in (eczx, ezxza, ezxzb, e_uz, e_ux, e_hz))

    def energy_per_site(self, state, env):
        """(reference czx.py:285-287)."""
        eczx, ezxza, ezxzb, e_uz, e_ux, e_hz = self.eval_H_ops(state, env)
        e = (self.g_zxz / 2 * (ezxza + ezxzb)
             + self.V * (e_uz - e_ux + 2) + self.g_czx * eczx + e_hz)
        return e.real if jnp.iscomplexobj(e) else e

    def eval_obs(self, state, env):
        eczx, ezxza, ezxzb, e_uz, e_ux, e_hz = self.eval_H_ops(state, env)
        labels = ["e_czx", "e_zxz_a", "e_zxz_b", "U_Z", "U_X", "h_Z"]
        vals = [eczx, ezxza, ezxzb, e_uz, e_ux, e_hz]
        return [complex(v).real for v in vals], labels
