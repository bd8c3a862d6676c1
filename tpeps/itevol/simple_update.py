"""Imaginary-time evolution by 2-site simple update.

Counterpart of reference itevol/su_2site_abelian.py:4-153 (which runs
over YASTN block-sparse tensors); this dense version operates on
:class:`tpeps.ipeps.ipeps.IPEPS_WEIGHTED` — an iPEPS augmented with
diagonal positive bond weights.  One step:

1. absorb the six outer bond weights into the two site tensors,
2. reduced split of each tensor around the active bond (SVD),
3. contract reduced factors + bond weight + Trotter gate,
4. truncated, multiplet-safe SVD back to bond dimension D,
5. restore outer weights (pseudo-inverse with cutoff).

Each step is a fixed composition of matmuls/SVDs: jittable per bond
direction, so a full sweep compiles once and runs on-device.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..linalg.svd import truncated_svd

_DXY_TO_AXIS = {(0, -1): 1, (-1, 0): 2, (0, 1): 3, (1, 0): 4}


def _mul_weight_axis(A, w, axis):
    """Multiply diagonal weight (vector) along the given axis."""
    shape = [1] * A.ndim
    shape[axis] = -1
    return A * w.reshape(shape)


def gate_from_hamiltonian(h2, tau):
    """Trotter gate exp(-tau h) for a 2-site term ``h[s0,s1,s0',s1']``.

    :return: gate with index convention ``[s0', s1', s0, s1]`` matching
        the reference's application (su_2site_abelian.py:99).
    """
    d = h2.shape[0]
    hm = h2.reshape(d * d, d * d)
    w, v = jnp.linalg.eigh(0.5 * (hm + hm.conj().T))
    g = (v * jnp.exp(-tau * w)[None, :]) @ v.conj().T
    return g.reshape(d, d, d, d)


def apply_gate_2s(state, bond, gate, max_D: int, inv_cutoff: float = 1.0e-14,
                  eps_multiplet: float = 1.0e-10):
    """Apply a 2-site gate on ``bond = (xy1, dxy, xy2)``
    (reference su_2site_abelian.py:19-153)."""
    xy1, dxy, xy2 = bond
    ndxy = (-dxy[0], -dxy[1])
    c1 = state.vertexToSite(xy1)
    c2 = state.vertexToSite(xy2)
    ax1 = _DXY_TO_AXIS[dxy]
    ax2 = _DXY_TO_AXIS[ndxy]

    A = state.sites[c1]
    B = state.sites[c2]
    outer1 = [d for d in _DXY_TO_AXIS if d != dxy]
    outer2 = [d for d in _DXY_TO_AXIS if d != ndxy]
    for d_ in outer1:
        A = _mul_weight_axis(A, state.weights[(c1, d_)], _DXY_TO_AXIS[d_])
    for d_ in outer2:
        B = _mul_weight_axis(B, state.weights[(c2, d_)], _DXY_TO_AXIS[d_])

    # reduced split around the active bond
    permA = [a for a in range(5) if a not in (0, ax1)] + [0, ax1]
    At = A.transpose(permA)
    outer_shape_A = At.shape[:3]
    d_phys, Dbond = At.shape[3], At.shape[4]
    Am = At.reshape(-1, d_phys * Dbond)
    k1 = min(Am.shape)
    xA, sA, vA = jnp.linalg.svd(Am, full_matrices=False)
    rA = (sA[:, None] * vA).reshape(k1, d_phys, Dbond)

    permB = [0, ax2] + [a for a in range(5) if a not in (0, ax2)]
    Bt = B.transpose(permB)
    outer_shape_B = Bt.shape[2:]
    Bm = Bt.reshape(d_phys * Dbond, -1)
    k2 = min(Bm.shape)
    uB, sB, xB = jnp.linalg.svd(Bm, full_matrices=False)
    rB = (uB * sB[None, :]).reshape(d_phys, Dbond, k2)

    # theta = rA . W . rB with the gate applied
    W = state.weights[(c1, dxy)]
    theta = jnp.einsum("ksb,b,zbq->kszq", rA, W, rB)
    theta = jnp.einsum("SZsz,kszq->kSZq", gate, theta)

    # truncated SVD back to the bond.  NOTE: no multiplet masking here —
    # simple update carries no gradients (the mask exists for AD
    # stability), and masking a split multiplet to zero collapses the
    # bond to a product state (observed: Heisenberg SU falls onto the
    # classical Neel state at exactly E=-0.5)
    th = theta.reshape(k1 * d_phys, d_phys * k2)
    U, S, V = truncated_svd(th, max_D, keep_multiplets=False)
    W_new = S / jnp.abs(S).max()
    nA = U.reshape(k1, d_phys, max_D)
    nB = V.conj().T.reshape(max_D, d_phys, k2)

    # reassemble site tensors
    A_new = jnp.einsum("ok,ksb->osb", xA, nA).reshape(*outer_shape_A, d_phys, max_D)
    # [outer1..., s, bond] -> [s, aux in canonical order]
    order = [a for a in range(5) if a not in (0, ax1)] + [0, ax1]
    A_new = A_new.transpose([order.index(i) for i in range(5)])
    B_new = jnp.einsum("bsq,qo->sbo", nB, xB).reshape(d_phys, max_D, *outer_shape_B)
    orderB = [0, ax2] + [a for a in range(5) if a not in (0, ax2)]
    B_new = B_new.transpose([orderB.index(i) for i in range(5)])

    # restore outer weights
    def _winv(w):
        aw = jnp.abs(w)
        return jnp.where(aw > inv_cutoff, 1.0 / jnp.where(aw > inv_cutoff, w, 1.0), 0.0)

    for d_ in outer1:
        A_new = _mul_weight_axis(A_new, _winv(state.weights[(c1, d_)]), _DXY_TO_AXIS[d_])
    for d_ in outer2:
        B_new = _mul_weight_axis(B_new, _winv(state.weights[(c2, d_)]), _DXY_TO_AXIS[d_])

    state.sites[c1] = A_new / jnp.abs(A_new).max()
    state.sites[c2] = B_new / jnp.abs(B_new).max()
    state.weights[(c1, dxy)] = W_new
    state.weights[(c2, ndxy)] = W_new
    return state


def run_seq_2s(state, gate_seq, max_D: int, inv_cutoff: float = 1.0e-14):
    """Apply a sequence of ``(bond, gate)`` pairs
    (reference su_2site_abelian.py:4-10)."""
    for bond, gate in gate_seq:
        state = apply_gate_2s(state, bond, gate, max_D, inv_cutoff)
    return state


def all_nn_bonds(state):
    """All non-equivalent nearest-neighbour bonds of the unit cell:
    right- and down-pointing from every site."""
    bonds = []
    for coord in state.sites:
        bonds.append((coord, (1, 0), (coord[0] + 1, coord[1])))
        bonds.append((coord, (0, 1), (coord[0], coord[1] + 1)))
    return bonds
