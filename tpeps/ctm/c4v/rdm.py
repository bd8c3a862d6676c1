"""Reduced density matrices for the 1-site C4v iPEPS.

Counterpart of reference ctm/one_site_c4v/rdm_c4v.py (1,926 LoC).  Each
RDM contracts the infinite network with a cluster of open physical
indices; by C4v symmetry the right/lower halves reuse the left/upper
halves, and single-layer contraction avoids the D^4 double-layer tensor.

Output convention: ``rho[s_0..s_n, s'_0..s'_n]`` with unprimed indices
from the non-conjugated (ket) layer — reference rdm_c4v.py docstrings;
energies evaluate as ``einsum('ijab,ijab', rho, H)``.

All functions are pure jnp on ``(a, EnvC4v)`` and differentiable; the
positivity projection of ``sym_pos_def`` is straight-through (the
reference clamps under ``torch.no_grad``, ctm/generic/rdm.py:44-53).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ctmrg import open_c2x2_sl
from .env import EnvC4v


def _cast_to_real(t, imag_eps: float = 1.0e-8):
    """Drop a (checked-small) imaginary part (reference ctm/generic/rdm.py:26-35).

    A large imaginary part of an RDM trace/energy is a broken-environment
    symptom the reference surfaces with a warning; under tracing the check
    is skipped (host callbacks in the hot differentiated path are not
    worth it), but eval-time concrete values are checked."""
    if jnp.iscomplexobj(t):
        if not isinstance(t, jax.core.Tracer):
            im, re = float(jnp.abs(t.imag).max()), float(jnp.abs(t.real).max())
            if im > imag_eps * max(re, 1.0):
                import warnings

                warnings.warn(
                    f"_cast_to_real: imaginary part {im:.3e} exceeds "
                    f"{imag_eps:.1e}x real part {re:.3e} — environment "
                    "may be broken", stacklevel=2,
                )
        return t.real
    return t


def _sym_pos_def_matrix(rho, sym_pos_def: bool = False):
    """Hermitize, optionally project to positive semidefinite
    (straight-through), normalize by trace
    (reference ctm/generic/rdm.py:38-56)."""
    rho = 0.5 * (rho + rho.conj().T)
    if sym_pos_def:
        w, u = jnp.linalg.eigh(jax.lax.stop_gradient(rho))
        w_pos = jnp.clip(w, 0.0, None)
        rho_pos = (u * w_pos[None, :]) @ u.conj().T
        # forward = clamped, backward = identity (reference clamps in-place
        # under no_grad, ctm/generic/rdm.py:44-53)
        rho = rho + jax.lax.stop_gradient(rho_pos - rho)
    norm = _cast_to_real(jnp.trace(rho))
    return rho / norm


def _sym_pos_def_rdm(rho, sym_pos_def: bool = False):
    """Apply :func:`_sym_pos_def_matrix` to a rank-2n RDM
    (reference ctm/generic/rdm.py:59-68)."""
    nsites = rho.ndim // 2
    orig = rho.shape
    dim = 1
    for s in orig[:nsites]:
        dim *= s
    rho = _sym_pos_def_matrix(rho.reshape(dim, dim), sym_pos_def=sym_pos_def)
    return rho.reshape(orig)


def _open_c2x2_6(a, env: EnvC4v):
    """Open enlarged corner as ``[down-chi, d^2, right-chi, r^2, s, s']``
    (the layout used by the 2x1/3x1 builders, reference rdm_c4v.py:616-650)."""
    chi = env.C.shape[0]
    D = a.shape[1]
    d = a.shape[0]
    oc = open_c2x2_sl(a, env.C, env.T)  # [(j,dk,db),(i,rk,rb),s,s']
    return oc.reshape(chi, D * D, chi, D * D, d, d)


def rdm1x1_sl(a, env: EnvC4v, sym_pos_def: bool = False):
    """1-site RDM, layer-by-layer (reference rdm_c4v.py:266-391)."""
    C, T = env
    chi = C.shape[0]
    D = a.shape[1]
    T4 = T.reshape(chi, chi, D, D)

    # left column CTC: contract C-T-C top to bottom
    #   C--y          [y: top-right chi,
    #   T--(l1,l2)     (l1,l2): middle right D pair,
    #   C--v           v: bottom-right chi]
    ctc = jnp.einsum("xy,xwlm->ywlm", C, T4)
    ctc = jnp.einsum("ywlm,wv->ylmv", ctc, C)

    # bottom edge T[v, b, (e1,e2)] pointing up
    q = jnp.einsum("ylmv,vbef->ylmbef", ctc, T4)
    # ket layer: contract a[s,u,l,d,r] over (l, d)
    q = jnp.einsum("ylmbef,suler->ymbfsur", q, a)
    # bra layer: conj(a)[z,g,m,f,h] over (l-bra=m, d-bra=f)
    q = jnp.einsum("ymbfsur,zgmfh->ybsurzgh", q, jnp.conj(a))
    # q: [y(top-left chi), b(bottom-right chi), s, u, r, s', u', r']
    # top edge T[y, i, (u,u')] (index 0 towards the left column, reference
    # rdm_c4v.py:344-351)
    q = jnp.einsum("ybsurzgh,yiug->ibsrzh", q, T4)
    # close with the right column (same CTC, mirrored):
    # contract i<->v', b<->y', (r,r')<->(l1,l2)'
    rho = jnp.einsum("ibsrzh,brhi->sz", q, ctc)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x1_sl(a, env: EnvC4v, sym_pos_def: bool = False):
    """2-site nearest-neighbour RDM via left-half reuse
    (reference rdm_c4v.py:530-667)::

        C--T-----T-----C = C2x2--C2x2
        |  |     |     |   |     |
        T--a^+a--a^+a--T   C2x1--C2x1
        |  |     |     |
        C--T-----T-----C
    """
    C, T = env
    oc = _open_c2x2_6(a, env)  # [x(down-chi), m(d^2), i(right-chi), r(r^2), s, s']
    # bottom-left C2x1: C[x,y] T[y, b, n] -> [x(up), b(right), n(up D^2)]
    cb = jnp.einsum("xy,ybn->xbn", C, T)
    # left half: contract C2x1 up-chi/up-D^2 with corner down-chi/down-D^2
    lh = jnp.einsum("xbm,xmirsz->birsz", cb, oc)
    # right half = left half (C4v): contract b<->i', i<->b', r<->r'
    rho = jnp.einsum("birsz,ibrwv->szwv", lh, lh)
    # [s0, s0', s1, s1'] -> [s0, s1, s0', s1']
    rho = rho.transpose(0, 2, 1, 3)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm3x1_sl(a, env: EnvC4v, sym_pos_def: bool = False):
    """Next-to-next nearest neighbour (distance-2) 2-site RDM
    (reference rdm_c4v.py:667-1115): left half + central T-aa*-T column
    + mirrored right half.  Physical order ``s0 (center traced) s1``.
    """
    C, T = env
    chi = C.shape[0]
    D = a.shape[1]
    D2 = D * D
    oc = _open_c2x2_6(a, env)
    # closed double-layer transfer tensor A[u^2, l^2, d^2, r^2]
    # (fused pairs ket-major, reference rdm_c4v.py:726-729)
    A = jnp.einsum("suldr,svmfg->uvlmdfrg", a, jnp.conj(a)).reshape(D2, D2, D2, D2)
    cb = jnp.einsum("xy,ybn->xbn", C, T)
    lh = jnp.einsum("xbm,xmirsz->birsz", cb, oc)  # [b, i, r^2, s, s']
    # extra central column: bottom T, double-layer A, top T
    q = jnp.einsum("bcn,birsz->cnirsz", T, lh)
    q = jnp.einsum("uvnw,cnivsz->uwcisz", A, q)
    q = jnp.einsum("tiu,uwcisz->twcsz", T, q)
    # mirrored right half: contract t<->b', w<->r', c<->i'
    rho = jnp.einsum("twcsz,tcwef->szef", q, lh)
    rho = rho.transpose(0, 2, 1, 3)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


# double-layer variants agree in value with the single-layer ones; alias
# for reference-API parity (reference rdm_c4v.py:168-265,394-529).
def rdm1x1(a, env: EnvC4v, sym_pos_def: bool = False):
    return rdm1x1_sl(a, env, sym_pos_def=sym_pos_def)


def rdm2x1(a, env: EnvC4v, sym_pos_def: bool = False):
    return rdm2x1_sl(a, env, sym_pos_def=sym_pos_def)


def rdm3x1(a, env: EnvC4v, sym_pos_def: bool = False):
    return rdm3x1_sl(a, env, sym_pos_def=sym_pos_def)


def rdm2x2_NN_lowmem_sl(a, env: EnvC4v, sym_pos_def: bool = False):
    """Nearest-neighbour 2-site RDM from 2x2 quadrants
    (reference rdm_c4v.py:1117-1285)::

        C2x2--C2x2c        s0 c
        C2x2--C2x2c        s1 c
    """
    chi = env.C.shape[0]
    D = a.shape[1]
    d = a.shape[0]
    oc = open_c2x2_sl(a, env.C, env.T).reshape(chi * D * D, chi * D * D, d * d)
    cc = jnp.einsum("xyss->xy", oc.reshape(chi * D * D, chi * D * D, d, d))
    r1 = jnp.einsum("ab,bci->aci", cc, oc)
    r2 = jnp.einsum("ab,bci->aci", cc, r1)
    rho = jnp.einsum("xyj,yxi->ji", oc, r2)
    rho = rho.reshape(d, d, d, d).transpose(0, 2, 1, 3)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x2_NNN_lowmem_sl(a, env: EnvC4v, sym_pos_def: bool = False):
    """Next-nearest (diagonal) 2-site RDM from 2x2 quadrants
    (reference rdm_c4v.py:1286-1445)::

        C2x2---C2x2c       s0 c
        C2x2c--C2x2        c  s1
    """
    chi = env.C.shape[0]
    D = a.shape[1]
    d = a.shape[0]
    oc = open_c2x2_sl(a, env.C, env.T).reshape(chi * D * D, chi * D * D, d * d)
    cc = jnp.einsum("xyss->xy", oc.reshape(chi * D * D, chi * D * D, d, d))
    r1 = jnp.einsum("ab,bci->aci", cc, oc)
    rho = jnp.einsum("aci,caj->ij", r1, r1)
    rho = rho.reshape(d, d, d, d).transpose(0, 2, 1, 3)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x2(a, env: EnvC4v, sym_pos_def: bool = False):
    """Full 2x2 plaquette RDM (reference rdm_c4v.py:1446-1546).

    Physical order::

        s0 s1
        s2 s3
    """
    chi = env.C.shape[0]
    D = a.shape[1]
    d = a.shape[0]
    oc = open_c2x2_sl(a, env.C, env.T)  # [x, y, s, s']
    # upper half: two corners joined left-right
    uh = jnp.einsum("xiab,iycd->xyabcd", oc, oc)
    # join upper and (identical) lower halves
    rho = jnp.einsum("xyabcd,yxefgh->abcdefgh", uh, uh)
    # [s0,z0,s1,z1,s2',z2',s3',z3'] -> (s0,s1,s2,s3; s0',s1',s2',s3')
    # (reference rdm_c4v.py:1536-1539 permute 0,2,6,4,1,3,7,5)
    rho = rho.transpose(0, 2, 6, 4, 1, 3, 7, 5)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def aux_rdm1x1(env: EnvC4v, D: int):
    """Auxiliary (virtual-index) RDM of a 1x1 patch: the boundary ring
    C-T-C-T-C-T-C-T with the four D^2 legs opened and split into
    (ket, bra) pairs, giving rho[u l d r, u' l' d' r']
    (reference rdm_c4v.py:1630-1676 ``aux_rdm1x1``).

    Built with exactly the contraction sequence of the validated
    generic rdm1x1 (tpeps/ctm/generic/rdm.py:26-51) with the site
    insertion removed, so ``einsum("uldrULDR,suldr,zULDR->sz", rho, a,
    conj(a))`` reproduces rdm1x1 exactly.
    """
    C = env.C
    chi = C.shape[0]
    Tl = env.T.reshape(chi, chi, D, D)
    Tt = env.T.transpose(0, 2, 1).reshape(chi, D, D, chi)
    Tb = env.T.transpose(2, 0, 1).reshape(D, D, chi, chi)
    Tr = env.T.transpose(0, 2, 1).reshape(chi, D, D, chi)

    L = jnp.einsum("xy,xblk->yblk", C, Tl)
    L = jnp.einsum("yblk,bw->ylkw", L, C)
    q = jnp.einsum("ylkw,yuvi->lkwuvi", L, Tt)
    q = jnp.einsum("lkwuvi,dewj->lkuvidej", q, Tb)
    R = jnp.einsum("pq,qmnb->pmnb", C, Tr)
    R = jnp.einsum("pmnb,bj->pmnj", R, C)
    rho = jnp.einsum("lkuvidej,imnj->uvlkdemn", q, R)
    # [u,u', l,l', d,d', r,r'] -> kets then bras
    return rho.transpose(0, 2, 4, 6, 1, 3, 5, 7)


def ddA_rdm1x1(a, env: EnvC4v):
    """Partial 1-site RDM: the boundary ring contracted with the BRA
    tensor only, leaving the ket slots open (reference
    rdm_c4v.py:1548-1629 ``ddA_rdm1x1``) — the environment-weighted
    gradient frame ``d<psi|psi> / dA = ddA_rdm1x1`` (up to conj), used
    by the reference's hand-rolled optimization paths.

    :return: ``rho[s, u, l, d, r]`` over the KET indices.
    """
    frame = aux_rdm1x1(env, a.shape[1])  # [uk lk dk rk, ub lb db rb]
    return jnp.einsum("uldrULDR,sULDR->suldr", frame, jnp.conj(a))


def rdm2x1_tiled(a, env: EnvC4v, sym_pos_def: bool = False):
    """API-parity alias of the tiled/low-memory 2x1 RDM (reference
    rdm_c4v_specialized.py:10-267).  The reference tiles the double
    layer manually to bound GPU memory; under XLA the layer-by-layer
    ``rdm2x1_sl`` achieves the same peak-memory behaviour, so this
    delegates."""
    return rdm2x1_sl(a, env, sym_pos_def=sym_pos_def)


def rdm2x2_NN_tiled(a, env: EnvC4v, sym_pos_def: bool = False):
    """API-parity alias (reference rdm_c4v_specialized.py:268-358);
    delegates to the low-memory NN 2x2 RDM."""
    return rdm2x2_NN_lowmem_sl(a, env, sym_pos_def=sym_pos_def)


def rdm2x2_NNN_tiled(a, env: EnvC4v, sym_pos_def: bool = False):
    """API-parity alias (reference rdm_c4v_specialized.py:359-467);
    delegates to the low-memory NNN 2x2 RDM."""
    return rdm2x2_NNN_lowmem_sl(a, env, sym_pos_def=sym_pos_def)
