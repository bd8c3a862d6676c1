"""Abelian (block-sparse) 2-site simple update.

Counterpart of reference itevol/su_2site_abelian.py:4-153 over
:class:`tpeps.sym.tensor.AbelianTensor` instead of yastn; mirrors the
dense :mod:`tpeps.itevol.simple_update` step for step — absorb outer
weights, reduced SVD splits around the active bond, gate application,
multiplet-safe truncated SVD (:func:`tpeps.sym.tensor.svd_blockwise`
with a global cross-sector cut), weight restoration.

Bond weights live per charge sector (dict ``q -> vector``), exactly the
``S_dict`` format of ``svd_blockwise`` — the truncation step's output
IS the new weight.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ipeps.ipeps_abelian import IPEPS_ABELIAN
from ..sym.tensor import AbelianTensor, svd_blockwise

_DXY_TO_AXIS = {(0, -1): 1, (-1, 0): 2, (0, 1): 3, (1, 0): 4}


class IPEPS_ABELIAN_WEIGHTED(IPEPS_ABELIAN):
    """Abelian iPEPS with diagonal positive bond weights (reference
    ipeps/ipeps_abelian.py:535-762 ``IPEPS_ABELIAN_WEIGHTED``).

    ``weights[(coord, dxy)]`` is a dict ``charge -> vector`` over the
    sectors of the bond leg leaving ``coord`` in direction ``dxy``.
    """

    def __init__(self, sym=None, sites=None, weights=None, state=None,
                 vertexToSite=None, lX=None, lY=None):
        if state is not None:
            sym, sites = state.sym, state.sites
            vertexToSite, lX, lY = state.vertexToSite, state.lX, state.lY
        super().__init__(sym, sites, vertexToSite=vertexToSite, lX=lX, lY=lY)
        self.weights = dict(weights) if weights else self.generate_weights()

    def generate_weights(self):
        weights = {}
        for coord in self.sites:
            for dxy, ax in _DXY_TO_AXIS.items():
                w_id = (coord, dxy)
                w_rid = (
                    self.vertexToSite((coord[0] + dxy[0], coord[1] + dxy[1])),
                    (-dxy[0], -dxy[1]),
                )
                if w_id not in weights and w_rid not in weights:
                    leg = self.sites[coord].legs[ax]
                    W = {q: np.ones(d) for q, d in leg.charges}
                    weights[w_id] = W
                    weights[w_rid] = W
        return weights

    def absorb_weights(self) -> IPEPS_ABELIAN:
        """sqrt(W) into both adjacent tensors (reference
        ipeps_abelian.py:616-660)."""
        sites = {}
        for coord, a in self.sites.items():
            for dxy, ax in _DXY_TO_AXIS.items():
                w = self.weights[(coord, dxy)]
                a = _mul_weight_axis(a, {q: np.sqrt(np.abs(v)) for q, v in w.items()}, ax)
            sites[coord] = a
        return IPEPS_ABELIAN(self.sym, sites, self.vertexToSite, self.lX, self.lY)


def _mul_weight_axis(A: AbelianTensor, w: dict, axis: int) -> AbelianTensor:
    blocks = {}
    for qs, b in A.blocks.items():
        v = w.get(qs[axis])
        if v is None:
            continue
        shape = [1] * b.ndim
        shape[axis] = -1
        blocks[qs] = b * np.asarray(v).reshape(shape)
    return A.copy_with(blocks)


def gate_from_hamiltonian(h2_dense, tau, phys_leg, sym):
    """Trotter gate exp(-tau h) as a charge-conserving 4-leg tensor
    ``[s0', s1', s0, s1]`` with signatures (1, 1, -1, -1); ``h2_dense``
    is the dense 2-site term ``h[s0,s1,s0',s1']`` ordered to match the
    ``phys_leg`` sector layout."""
    d = h2_dense.shape[0]
    hm = np.asarray(h2_dense).reshape(d * d, d * d)
    w, v = np.linalg.eigh(0.5 * (hm + hm.conj().T))
    g = (v * np.exp(-tau * w)[None, :]) @ v.conj().T
    g = g.reshape(d, d, d, d)
    return AbelianTensor.from_dense(
        jnp.asarray(g), sym, (1, 1, -1, -1), (phys_leg,) * 4, 0
    ).to_backend("np")


def apply_gate_2s(state: IPEPS_ABELIAN_WEIGHTED, bond, gate, max_D: int,
                  inv_cutoff: float = 1.0e-14, eps_multiplet: float = 0.0):
    """One 2-site simple-update step (reference su_2site_abelian.py:19)."""
    xy1, dxy, xy2 = bond
    ndxy = (-dxy[0], -dxy[1])
    c1, c2 = state.vertexToSite(xy1), state.vertexToSite(xy2)
    ax1, ax2 = _DXY_TO_AXIS[dxy], _DXY_TO_AXIS[ndxy]

    A, B = state.sites[c1], state.sites[c2]
    outer1 = [d_ for d_ in _DXY_TO_AXIS if d_ != dxy]
    outer2 = [d_ for d_ in _DXY_TO_AXIS if d_ != ndxy]
    for d_ in outer1:
        A = _mul_weight_axis(A, state.weights[(c1, d_)], _DXY_TO_AXIS[d_])
    for d_ in outer2:
        B = _mul_weight_axis(B, state.weights[(c2, d_)], _DXY_TO_AXIS[d_])

    # reduced splits: A = xA . rA  (rA carries phys + bond), B = rB . xB
    outerA = tuple(a for a in range(5) if a not in (0, ax1))
    xA, sA, rA = svd_blockwise(A, outerA, (0, ax1))
    rA = _scale_first_leg(rA, sA)                      # (k, s, b)
    outerB = tuple(a for a in range(5) if a not in (0, ax2))
    rB_u, sB, xB = svd_blockwise(B, (0, ax2), outerB)
    rB = _scale_last_leg(rB_u, sB)                     # (s, b, k)

    # theta = rA . W . rB, gate applied
    W = state.weights[(c1, dxy)]
    rAW = _mul_weight_axis(rA, W, 2)
    theta = rAW.tensordot(rB, ((2,), (1,)))            # (k1, s0, s1, k2)
    theta = gate.tensordot(theta, ((2, 3), (1, 2)))    # (s0', s1', k1, k2)
    theta = theta.transpose((2, 0, 1, 3))              # (k1, s0', s1', k2)

    U, S, V = svd_blockwise(theta, (0, 1), (2, 3), chi=max_D,
                            eps_multiplet=eps_multiplet)
    smax = max(float(np.abs(np.asarray(v)).max()) for v in S.values())
    W_new = {q: np.asarray(v) / smax for q, v in S.items()}

    # reassemble
    A_new = xA.tensordot(U, ((len(outerA),), (0,)))    # outerA + (s, bond)
    order = list(outerA) + [0, ax1]
    A_new = A_new.transpose(tuple(order.index(i) for i in range(5)))
    B_new = V.tensordot(xB, ((2,), (0,)))              # (bond, s) + outerB
    orderB = [ax2, 0] + list(outerB)
    B_new = B_new.transpose(tuple(orderB.index(i) for i in range(5)))

    def _winv(w):
        return {
            q: np.where(np.abs(v) > inv_cutoff, 1.0 / np.where(np.abs(v) > inv_cutoff, v, 1.0), 0.0)
            for q, v in w.items()
        }

    for d_ in outer1:
        A_new = _mul_weight_axis(A_new, _winv(state.weights[(c1, d_)]), _DXY_TO_AXIS[d_])
    for d_ in outer2:
        B_new = _mul_weight_axis(B_new, _winv(state.weights[(c2, d_)]), _DXY_TO_AXIS[d_])

    nA = float(A_new.max_abs())
    nB = float(B_new.max_abs())
    state.sites[c1] = A_new * (1.0 / nA)
    state.sites[c2] = B_new * (1.0 / nB)
    state.weights[(c1, dxy)] = W_new
    state.weights[(c2, ndxy)] = W_new
    return state


def _scale_first_leg(t, S):
    blocks = {}
    for qs, b in t.blocks.items():
        v = np.asarray(S[qs[0]])
        blocks[qs] = np.asarray(b) * v.reshape((-1,) + (1,) * (b.ndim - 1))
    return t.copy_with(blocks)


def _scale_last_leg(t, S):
    blocks = {}
    for qs, b in t.blocks.items():
        v = np.asarray(S[qs[-1]])
        blocks[qs] = np.asarray(b) * v.reshape((1,) * (b.ndim - 1) + (-1,))
    return t.copy_with(blocks)


def run_seq_2s(state, gate_seq, max_D: int, inv_cutoff: float = 1.0e-14):
    """Apply a sequence of (bond, gate) pairs (reference
    su_2site_abelian.py:4-10)."""
    for bond, gate in gate_seq:
        state = apply_gate_2s(state, bond, gate, max_D, inv_cutoff)
    return state
