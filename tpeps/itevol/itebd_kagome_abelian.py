"""3-site iTEBD (simple update) for the ABELIAN kagome iPESS via a
block-sparse higher-order SVD.

Counterpart of reference itevol/itebd_ipess_kagome_abelian.py:9-159 +
itevol/hosvd_abelian.py:4-61.  Same algorithm as the dense
:mod:`tpeps.itevol.itebd_kagome` — gate a triangle with the opposite
triangle's Schmidt weights absorbed, re-split with a mode-wise
truncated SVD — but every decomposition is charge-resolved
(:func:`tpeps.sym.tensor.svd_blockwise` with a global cut across
sectors), so the U(1)/U(1)xU(1) block structure of the state is
preserved exactly through the evolution.

Tensor conventions are those of
:mod:`tpeps.ipeps.ipess_kagome_abelian`:
  T_u[i, a, b]  sig (-1, 1, 1);   B_c[s0, j, i] sig (1, -1, 1)
  T_d[j, k, l]  sig (1, -1, -1);  B_b[s1, k, c] sig (1, 1, -1)
                                  B_a[s2, l, d] sig (1, 1, -1)
Schmidt weights are dicts ``charge -> vector`` keyed by the charges of
the corresponding B-tensor leg.  Where the SVD's fresh internal leg
(signature -1, charge labels q) does not match the documented bond
convention, BOTH ends are flipped (an isomorphism) and the weight keys
negated with them.
"""

from __future__ import annotations

import numpy as np

from ..sym.tensor import AbelianTensor, _qscale, svd_blockwise
from .su_abelian import _mul_weight_axis

LKEYS_UP = ("lambda_up_a", "lambda_up_b", "lambda_up_c")
LKEYS_DN = ("lambda_dn_a", "lambda_dn_b", "lambda_dn_c")


def trotter_gate_3_abelian(h3, dt, phys_leg, sym):
    """``(gate, gate_half)``: exp(-dt h3) as charge-conserving 6-leg
    tensors ``[s0', s1', s2', s0, s1, s2]`` with signatures
    (1, 1, 1, -1, -1, -1); ``h3`` is the dense (d^3, d^3) hermitian
    triangle Hamiltonian."""
    import jax.numpy as jnp

    h = np.asarray(h3)
    d3 = h.shape[0]
    d = round(d3 ** (1.0 / 3.0))
    w, U = np.linalg.eigh(0.5 * (h + h.conj().T))

    def make(t):
        g = (U * np.exp(-t * w)[None, :]) @ U.conj().T
        g = g.reshape((d,) * 6)
        return AbelianTensor.from_dense(
            jnp.asarray(g), sym, (1, 1, 1, -1, -1, -1), (phys_leg,) * 6, 0
        ).to_backend("np")

    return make(dt), make(dt / 2.0)


def _winv(w, tol):
    out = {}
    for q, v in w.items():
        v = np.asarray(v)
        m = np.abs(v) > tol
        out[q] = np.where(m, 1.0 / np.where(m, v, 1.0), 0.0)
    return out


def _neg_keys(sym, d):
    return {_qscale(sym, -1, q): v for q, v in d.items()}


def hosvd3_abelian(A, bond_dim: int, eps_multiplet: float = 1.0e-10):
    """Blockwise HOSVD of a 6-leg tensor ``A[s0,i0,s1,i1,s2,i2]``
    (reference hosvd_abelian.py:4-61): per mode k a charge-conserving
    isometry ``U_k[s_k, i_k, new]`` (new-leg signature -1) and spectrum
    dict, plus the core ``S = A x_k U_k^+``."""
    Us, lams = [], []
    for k in range(3):
        row = (2 * k, 2 * k + 1)
        col = tuple(a for a in range(6) if a not in row)
        U, S, _ = svd_blockwise(A, row, col, chi=bond_dim,
                                eps_multiplet=eps_multiplet)
        smax = max(float(np.abs(np.asarray(v)).max()) for v in S.values())
        lams.append({q: np.asarray(v) / smax for q, v in S.items()})
        Us.append(U)
    core = A
    for U in Us:
        # mode legs are always the two leading legs of the running core
        core = core.tensordot(U.conj(), ((0, 1), (0, 1)))
    # core legs now (new0, new1, new2), each signature +1 (conj of -1)
    return core, tuple(Us), tuple(lams)


def tri_t_dn(T_d, B_a, B_b, B_c, lup_a, lup_b, lup_c, gate, bond_dim: int,
             tol: float = 1.0e-12, eps_multiplet: float = 1.0e-10):
    """Gate + HOSVD re-split of the DOWN triangle (reference
    itebd_ipess_kagome_abelian.py:28-75, block-sparse)."""
    Bc = _mul_weight_axis(B_c, lup_c, 2)
    Bb = _mul_weight_axis(B_b, lup_b, 2)
    Ba = _mul_weight_axis(B_a, lup_a, 2)
    # A[s0, i, s1, c, s2, d]
    q = Bc.tensordot(T_d, ((1,), (0,)))          # (s0, i, k, l)
    q = q.tensordot(Bb, ((2,), (1,)))            # (s0, i, l, s1, c)
    q = q.tensordot(Ba, ((2,), (1,)))            # (s0, i, s1, c, s2, d)
    A = gate.tensordot(q, ((3, 4, 5), (0, 2, 4)))  # (s0', s1', s2', i, c, d)
    A = A.transpose((0, 3, 1, 4, 2, 5))

    core, (Uc, Ub, Ua), (lc, lb, la) = hosvd3_abelian(A, bond_dim,
                                                      eps_multiplet)
    sym = T_d.sym
    # B_c: [s0, j(new, -1), i]  — convention already matches U's -1 leg
    B_c_new = _mul_weight_axis(Uc.transpose((0, 2, 1)), _winv(lup_c, tol), 2)
    # B_b/B_a: dn leg is absorbed (+1) by convention -> flip both ends
    B_b_new = Ub.transpose((0, 2, 1)).flip_charges((1,))
    B_b_new = _mul_weight_axis(B_b_new, _winv(lup_b, tol), 2)
    B_a_new = Ua.transpose((0, 2, 1)).flip_charges((1,))
    B_a_new = _mul_weight_axis(B_a_new, _winv(lup_a, tol), 2)
    T_d_new = core.flip_charges((1, 2))          # (j +1, k -1, l -1)
    T_d_new = T_d_new * (1.0 / float(T_d_new.max_abs()))
    lb, la = _neg_keys(sym, lb), _neg_keys(sym, la)
    return B_a_new, B_b_new, B_c_new, la, lb, lc, T_d_new


def tri_t_up(T_u, B_a, B_b, B_c, ldn_a, ldn_b, ldn_c, gate, bond_dim: int,
             tol: float = 1.0e-12, eps_multiplet: float = 1.0e-10):
    """Gate + HOSVD re-split of the UP triangle (reference
    itebd_ipess_kagome_abelian.py:76-112, block-sparse)."""
    Bc = _mul_weight_axis(B_c, ldn_c, 1)
    Bb = _mul_weight_axis(B_b, ldn_b, 1)
    Ba = _mul_weight_axis(B_a, ldn_a, 1)
    # A[s0, j, s1, k, s2, l]
    q = Bc.tensordot(T_u, ((2,), (0,)))          # (s0, j, a, b)
    q = q.tensordot(Bb, ((2,), (2,)))            # (s0, j, b, s1, k)
    q = q.tensordot(Ba, ((2,), (2,)))            # (s0, j, s1, k, s2, l)
    A = gate.tensordot(q, ((3, 4, 5), (0, 2, 4)))  # (s0', s1', s2', j, k, l)
    A = A.transpose((0, 3, 1, 4, 2, 5))

    core, (Uc, Ub, Ua), (lc, lb, la) = hosvd3_abelian(A, bond_dim,
                                                      eps_multiplet)
    sym = T_u.sym
    # B_c: up leg i is +1 by convention -> flip both ends
    B_c_new = Uc.flip_charges((2,))              # (s0, j, i +1)
    B_c_new = _mul_weight_axis(B_c_new, _winv(ldn_c, tol), 1)
    # B_b/B_a: up legs c/d are -1 by convention — U's -1 leg matches
    B_b_new = _mul_weight_axis(Ub, _winv(ldn_b, tol), 1)
    B_a_new = _mul_weight_axis(Ua, _winv(ldn_a, tol), 1)
    T_u_new = core.flip_charges((0,))            # (i -1, a +1, b +1)
    T_u_new = T_u_new * (1.0 / float(T_u_new.max_abs()))
    lc = _neg_keys(sym, lc)
    return B_a_new, B_b_new, B_c_new, la, lb, lc, T_u_new


def itebd_step(tensors, lambdas, gate, posit: str, bond_dim: int,
               tol: float = 1.0e-12):
    """One triangle update (reference itebd_ipess_kagome_abelian.py:113)."""
    t = dict(tensors)
    lam = dict(lambdas)
    if posit == "dn":
        Ba, Bb, Bc, la, lb, lc, Td = tri_t_dn(
            t["T_d"], t["B_a"], t["B_b"], t["B_c"],
            lam["lambda_up_a"], lam["lambda_up_b"], lam["lambda_up_c"],
            gate, bond_dim, tol)
        t.update(B_a=Ba, B_b=Bb, B_c=Bc, T_d=Td)
        lam.update(lambda_dn_a=la, lambda_dn_b=lb, lambda_dn_c=lc)
    elif posit == "up":
        Ba, Bb, Bc, la, lb, lc, Tu = tri_t_up(
            t["T_u"], t["B_a"], t["B_b"], t["B_c"],
            lam["lambda_dn_a"], lam["lambda_dn_b"], lam["lambda_dn_c"],
            gate, bond_dim, tol)
        t.update(B_a=Ba, B_b=Bb, B_c=Bc, T_u=Tu)
        lam.update(lambda_up_a=la, lambda_up_b=lb, lambda_up_c=lc)
    else:
        raise ValueError(posit)
    return t, lam


def itebd(tensors, lambdas, h3, tau: float, dt: float, bond_dim: int,
          phys_leg=None, sym="U1", tol: float = 1.0e-12):
    """2nd-order Trotter sweep over [0, tau] in steps of dt (reference
    itebd_ipess_kagome_abelian.py:143-159).

    :param tensors: dict T_u/T_d/B_a/B_b/B_c of AbelianTensors
    :param lambdas: dict of the six weight dicts (see
        :func:`init_lambdas_abelian`)
    :param h3: dense (d^3, d^3) triangle Hamiltonian
    """
    if phys_leg is None:
        phys_leg = tensors["B_a"].legs[0]
    gate, gate_half = trotter_gate_3_abelian(h3, dt, phys_leg, sym)
    tensors, lambdas = itebd_step(tensors, lambdas, gate_half, "dn",
                                  bond_dim, tol)
    for _ in range(round(tau / dt)):
        tensors, lambdas = itebd_step(tensors, lambdas, gate, "up",
                                      bond_dim, tol)
        tensors, lambdas = itebd_step(tensors, lambdas, gate, "dn",
                                      bond_dim, tol)
    tensors, lambdas = itebd_step(tensors, lambdas, gate_half, "up",
                                  bond_dim, tol)
    return tensors, lambdas


def init_lambdas_abelian(tensors):
    """Identity weights matching the current bond sector structure,
    keyed by the B-tensor leg charges."""
    lam = {}
    for key, ax, name in (("B_a", 1, "lambda_dn_a"), ("B_b", 1, "lambda_dn_b"),
                          ("B_c", 1, "lambda_dn_c"), ("B_a", 2, "lambda_up_a"),
                          ("B_b", 2, "lambda_up_b"), ("B_c", 2, "lambda_up_c")):
        leg = tensors[key].legs[ax]
        lam[name] = {q: np.ones(d) for q, d in leg.charges}
    return lam
