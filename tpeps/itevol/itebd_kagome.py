"""3-site iTEBD (simple update) for kagome iPESS via HOSVD.

Counterpart of reference itevol/itebd_ipess_kagome_abelian.py:9-159 +
itevol/hosvd_abelian.py:4-61, in dense jnp form.  The iPESS tensor
conventions are those of :mod:`tpeps.ipeps.ipess_kagome`:

* ``T_u[i,a,b]``, ``T_d[j,k,l]`` — triangle tensors,
* ``B_c[u,j,i]``, ``B_b[v,k,c]``, ``B_a[w,l,d]`` — bond tensors
  ``[phys, down-triangle leg, up-triangle leg]``.

One step applies the 3-site Trotter gate to a triangle (its three bond
tensors absorbed with the opposite triangle's Schmidt weights), then
re-splits with a higher-order SVD: the three mode isometries become the
new bond tensors, the mode spectra the new weights, and the core the
new triangle tensor.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..linalg.svd import truncated_svd

LKEYS_UP = ("lambda_up_a", "lambda_up_b", "lambda_up_c")
LKEYS_DN = ("lambda_dn_a", "lambda_dn_b", "lambda_dn_c")


def trotter_gate_3(h3, dt):
    """(gate, gate_half) = exp(-dt h3), exp(-dt/2 h3) for a hermitian
    3-site hamiltonian given as a (d^3, d^3) matrix (reference
    itebd_ipess_kagome_abelian.py:9-18)."""
    w, U = jnp.linalg.eigh(h3)
    g = (U * jnp.exp(-dt * w)[None, :]) @ U.conj().T
    gh = (U * jnp.exp(-dt / 2 * w)[None, :]) @ U.conj().T
    return g, gh


def _pinv_vec(lam, tol):
    m = lam / lam[0] > tol
    return jnp.where(m, 1.0 / jnp.where(m, lam, 1.0), 0.0)


def hosvd3(A, bond_dim: int, eps_multiplet: float = 1.0e-10):
    """Higher-order SVD of a 6-leg tensor ``A[s0,i0,s1,i1,s2,i2]``
    (reference hosvd_abelian.py:4-61): per mode k an isometry
    ``U_k[(s_k i_k), D]`` and spectrum ``lambda_k`` from the truncated
    SVD of the mode unfolding; returns ``(core, (U0,U1,U2),
    (l0,l1,l2))`` with the core ``S = A x_0 U0^+ x_1 U1^+ x_2 U2^+``.
    """
    d0, i0, d1, i1, d2, i2 = A.shape
    Us, lams = [], []
    perms = [(0, 1, 2, 3, 4, 5), (2, 3, 0, 1, 4, 5), (4, 5, 0, 1, 2, 3)]
    for p in perms:
        M = A.transpose(p).reshape(A.shape[p[0]] * A.shape[p[1]], -1)
        U, S, _ = truncated_svd(M, bond_dim, eps_multiplet=eps_multiplet)
        lam = S / jnp.max(S)
        Us.append(U)
        lams.append(lam)
    C = A.reshape(d0 * i0, d1 * i1, d2 * i2)
    core = jnp.einsum("xyz,xa,yb,zc->abc", C, jnp.conj(Us[0]),
                      jnp.conj(Us[1]), jnp.conj(Us[2]))
    return core, tuple(Us), tuple(lams)


def tri_t_dn(T_d, B_a, B_b, B_c, lup_a, lup_b, lup_c, gate, bond_dim: int,
             tol: float = 1.0e-12):
    """Gate application + HOSVD re-splitting on the DOWN triangle
    (reference itebd_ipess_kagome_abelian.py:28-75)."""
    Bc = B_c * lup_c[None, None, :]
    Bb = B_b * lup_b[None, None, :]
    Ba = B_a * lup_a[None, None, :]
    A = jnp.einsum("jkl,uji,vkc,wld->uivcwd", T_d, Bc, Bb, Ba)
    d = B_a.shape[0]
    g6 = gate.reshape(d, d, d, d, d, d)
    A = jnp.einsum("abeuvw,uivcwd->aibced", g6, A)
    core, (Uc, Ub, Ua), (lc, lb, la) = hosvd3(A, bond_dim)
    iC = B_c.shape[2]

    def new_B(U, lup_inv, ileg):
        D = U.shape[1]
        B = U.reshape(d, ileg, D).transpose(0, 2, 1)  # [phys, dn(new), up]
        return B * lup_inv[None, None, :]

    B_c_new = new_B(Uc, _pinv_vec(lup_c, tol), B_c.shape[2])
    B_b_new = new_B(Ub, _pinv_vec(lup_b, tol), B_b.shape[2])
    B_a_new = new_B(Ua, _pinv_vec(lup_a, tol), B_a.shape[2])
    T_d_new = core / jnp.abs(core).max()
    return B_a_new, B_b_new, B_c_new, la, lb, lc, T_d_new


def tri_t_up(T_u, B_a, B_b, B_c, ldn_a, ldn_b, ldn_c, gate, bond_dim: int,
             tol: float = 1.0e-12):
    """Gate application + HOSVD re-splitting on the UP triangle
    (reference itebd_ipess_kagome_abelian.py:76-112)."""
    Bc = B_c * ldn_c[None, :, None]
    Bb = B_b * ldn_b[None, :, None]
    Ba = B_a * ldn_a[None, :, None]
    A = jnp.einsum("iab,uji,vka,wlb->ujvkwl", T_u, Bc, Bb, Ba)
    d = B_a.shape[0]
    g6 = gate.reshape(d, d, d, d, d, d)
    A = jnp.einsum("abeuvw,uivcwd->aibced", g6, A)
    core, (Uc, Ub, Ua), (lc, lb, la) = hosvd3(A, bond_dim)

    def new_B(U, ldn_inv, dleg):
        D = U.shape[1]
        B = U.reshape(d, dleg, D)  # [phys, dn, up(new)]
        return B * ldn_inv[None, :, None]

    B_c_new = new_B(Uc, _pinv_vec(ldn_c, tol), B_c.shape[1])
    B_b_new = new_B(Ub, _pinv_vec(ldn_b, tol), B_b.shape[1])
    B_a_new = new_B(Ua, _pinv_vec(ldn_a, tol), B_a.shape[1])
    T_u_new = core / jnp.abs(core).max()
    return B_a_new, B_b_new, B_c_new, la, lb, lc, T_u_new


def itebd_step(tensors, lambdas, gate, posit: str, bond_dim: int,
               tol: float = 1.0e-12):
    """One triangle update (reference
    itebd_ipess_kagome_abelian.py:113-141); mutates copies."""
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
          tol: float = 1.0e-12):
    """2nd-order Trotter sweep over [0, tau] in steps of dt (reference
    itebd_ipess_kagome_abelian.py:143-159).

    :param tensors: dict with keys T_u, T_d, B_a, B_b, B_c
    :param lambdas: dict with the six lambda_{up,dn}_{a,b,c} weights
    :param h3: (d^3, d^3) three-site hamiltonian of one triangle
    :return: ``(tensors, lambdas)``
    """
    gate, gate_half = trotter_gate_3(h3, dt)
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


def init_lambdas(tensors):
    """Identity weights matching the current bond dimensions."""
    lam = {}
    lam["lambda_dn_a"] = jnp.ones(tensors["B_a"].shape[1])
    lam["lambda_dn_b"] = jnp.ones(tensors["B_b"].shape[1])
    lam["lambda_dn_c"] = jnp.ones(tensors["B_c"].shape[1])
    lam["lambda_up_a"] = jnp.ones(tensors["B_a"].shape[2])
    lam["lambda_up_b"] = jnp.ones(tensors["B_b"].shape[2])
    lam["lambda_up_c"] = jnp.ones(tensors["B_c"].shape[2])
    return lam
