"""MPO expectation values over small patches.

Counterpart of reference ctm/generic/rdm.py:1677-1962
(``eval_mpo_rdm2x2_oe`` / ``eval_mpo_rdm1x3_oe`` / ``eval_mpo_rdm3x1_oe``):
evaluate an MPO (tuple of tensors ``M[left, ket, right, bra]``, boundary
bonds summed) threaded through a 2x2 plaquette or a 1x3 / 3x1 strip,
without materializing the d^8-sized open RDM — the MPO bond flows
through the double-layer contraction instead.

MPO chain order on the plaquette is row-major with a direct bond from
the upper-right to the lower-left site (reference rdm.py:1692-1730
wiring): M0(00) -- M1(10) -- M2(01) -- M3(11).
"""

from __future__ import annotations

import jax.numpy as jnp

from .components import corner_ld, corner_lu, corner_rd, corner_ru
from .corrf import get_edge


def _corner_mpo(corner_open, M):
    """Contract the open (ket, bra) pair of an enlarged corner with one
    MPO tensor; result carries the two MPO bonds."""
    return jnp.einsum("xrsz,LsRz->xrLR", corner_open, M)


def eval_mpo_rdm2x2(coord, sites, site_of, C, T, mpo):
    """Unnormalized <MPO> over the 2x2 plaquette anchored at ``coord``
    (upper-left).  Pair with ``mpo`` of identity tensors for the norm."""
    assert len(mpo) == 4
    lu = corner_lu(coord, sites, site_of, C, T, open_phys=True)
    ru = corner_ru((coord[0] + 1, coord[1]), sites, site_of, C, T, open_phys=True)
    ld = corner_ld((coord[0], coord[1] + 1), sites, site_of, C, T, open_phys=True)
    rd = corner_rd((coord[0] + 1, coord[1] + 1), sites, site_of, C, T, open_phys=True)
    # boundary bonds (left of M0, right of M3) are summed
    lu_m = jnp.einsum("xrsz,LsRz->xrR", lu, mpo[0])
    ru_m = _corner_mpo(ru, mpo[1])
    ld_m = _corner_mpo(ld, mpo[2])
    rd_m = jnp.einsum("yrsz,LsRz->yrL", rd, mpo[3])
    # composition mirrors rdm.rdm2x2: uh over (lu.right, ru.left),
    # lh over (ld.right, rd.left); final over the vertical bonds
    uh = jnp.einsum("xrR,ryRQ->xyQ", lu_m, ru_m)
    lh = jnp.einsum("xrQW,yrW->xyQ", ld_m, rd_m)
    return jnp.einsum("xyQ,xyQ->", uh, lh)


def _aMa(a, M):
    """Double layer with an MPO tensor sandwiched:
    ``[mL, mR, u^2, l^2, d^2, r^2]``."""
    A = jnp.einsum("sefgh,LsRz,zabcd->LReafbgchd", a, M, jnp.conj(a))
    d = a.shape
    return A.reshape(M.shape[0], M.shape[2], d[1] ** 2, d[2] ** 2, d[3] ** 2, d[4] ** 2)


def _apply_TM_mpo(coord, direction, sites, site_of, T, edge, M):
    """Grow ``edge[chi, D^2, chi, mbond]`` by one site carrying the MPO
    bond along (the MPO-bond analogue of corrf.apply_TM_1sO)."""
    c = site_of(coord)
    A = _aMa(sites[c], M)
    if direction == (1, 0):
        Tt, Tb = T[(c, (0, -1))], T[(c, (0, 1))]
        E = jnp.einsum("tnq,tmbL->nqmbL", Tt, edge)
        E = jnp.einsum("nqmbL,LRnmdr->qbdrR", E, A)
        return jnp.einsum("qbdrR,dbw->qrwR", E, Tb)
    if direction == (0, 1):
        Tl, Tr = T[(c, (-1, 0))], T[(c, (1, 0))]
        E = jnp.einsum("tbn,tmrL->bnmrL", Tl, edge)
        E = jnp.einsum("bnmrL,LRmndw->brdwR", E, A)
        return jnp.einsum("brdwR,rwq->bdqR", E, Tr)
    raise NotImplementedError(f"direction {direction}")


def _eval_mpo_strip(coord, direction, sites, site_of, C, T, mpo):
    n = len(mpo)
    rev = (-direction[0], -direction[1])
    E = get_edge(coord, rev, sites, site_of, C, T)
    # broadcast a leading MPO-boundary bond; contracting it in the first
    # step sums the (typically dim-1) boundary, as in the reference
    E = jnp.broadcast_to(E[..., None], E.shape + (mpo[0].shape[0],))
    c = coord
    for i in range(n):
        E = _apply_TM_mpo(c, direction, sites, site_of, T, E, mpo[i])
        c = (c[0] + direction[0], c[1] + direction[1])
    # sum the trailing boundary bond, close with the cap edge
    E = E.sum(-1)
    cap = get_edge((c[0] - direction[0], c[1] - direction[1]), direction,
                   sites, site_of, C, T)
    return jnp.einsum("abc,abc->", E, cap)


def eval_mpo_rdm2x1(coord, sites, site_of, C, T, mpo):
    """Unnormalized <MPO> on the horizontal pair (coord, coord+(1,0))
    (reference rdm.py ``eval_mpo_rdm2x1``)."""
    assert len(mpo) == 2
    return _eval_mpo_strip(coord, (1, 0), sites, site_of, C, T, mpo)


def eval_mpo_rdm1x2(coord, sites, site_of, C, T, mpo):
    """Unnormalized <MPO> on the vertical pair (coord, coord+(0,1))."""
    assert len(mpo) == 2
    return _eval_mpo_strip(coord, (0, 1), sites, site_of, C, T, mpo)


def _dl(a):
    """Plain fused double layer [u^2, l^2, d^2, r^2]."""
    d = a.shape
    A = jnp.einsum("sulmr,szabc->uzlambrc", a, jnp.conj(a))
    return A.reshape(d[1] ** 2, d[2] ** 2, d[3] ** 2, d[4] ** 2)


def eval_mpo_rdm2x2_NNN_1n1(coord, sites, site_of, C, T, mpo2):
    """Unnormalized <M_ll M_ur> on the anti-diagonal pair
    (coord, coord+(1,-1)) — lower-left site first (reference
    rdm.py ``eval_mpo_rdm2x2_NNN_1n1``).

    :param mpo2: ``(M_ur, M_ll)`` two-tensor MPO whose bond connects
        M_ur.right with M_ll.left (build from a gate with site order
        (upper-right, lower-left) via :func:`mpo_from_gate`); pass
        ``None`` for the norm network.
    """
    x, y = coord[0], coord[1] - 1  # upper-left of the 2x2 window
    c00, c10 = site_of((x, y)), site_of((x + 1, y))
    c01, c11 = site_of((x, y + 1)), site_of((x + 1, y + 1))

    A00 = _dl(sites[c00])
    A11 = _dl(sites[c11])
    if mpo2 is None:
        A10m = _dl(sites[c10])[None]          # [k=1, u2, l2, d2, r2]
        A01m = _dl(sites[c01])[None]
    else:
        M_ur, M_ll = mpo2
        # _aMa gives [mL, mR, ...]; boundary bonds are dim 1
        A10m = _aMa(sites[c10], M_ur)[0]      # [R=k, u2, l2, d2, r2]
        A01m = _aMa(sites[c01], M_ll)[:, 0]   # [L=k, u2, l2, d2, r2]

    # edges
    Et = jnp.einsum("xy,ymz->xmz", C[(c00, (-1, -1))], T[(c00, (0, -1))])
    Et = jnp.einsum("xmz,znw->xmnw", Et, T[(c10, (0, -1))])
    Et = jnp.einsum("xmnw,wv->xmnv", Et, C[(c10, (1, -1))])
    Eb = jnp.einsum("xy,myr->xmr", C[(c01, (-1, 1))], T[(c01, (0, 1))])
    Eb = jnp.einsum("xmr,nrw->xmnw", Eb, T[(c11, (0, 1))])
    Eb = jnp.einsum("xmnw,bw->xmnb", Eb, C[(c11, (1, 1))])

    Tl0, Tl1 = T[(c00, (-1, 0))], T[(c01, (-1, 0))]
    Tr0, Tr1 = T[(c10, (1, 0))], T[(c11, (1, 0))]

    q = jnp.einsum("xmnv,xwl->mnvwl", Et, Tl0)
    q = jnp.einsum("mnvwl,mlDR->nvwDR", q, A00)
    q = jnp.einsum("nvwDR,knREF->vwDkEF", q, A10m)
    q = jnp.einsum("vwDkEF,vFu->wDkEu", q, Tr0)
    q = jnp.einsum("wDkEu,wzl->DkEuzl", q, Tl1)
    q = jnp.einsum("DkEuzl,kDlGR->EuzGR", q, A01m)
    q = jnp.einsum("EuzGR,ERHS->uzGHS", q, A11)
    q = jnp.einsum("uzGHS,uSb->zGHb", q, Tr1)
    return jnp.einsum("zGHb,zGHb->", q, Eb)


def eval_mpo_rdm1x3(coord, sites, site_of, C, T, mpo):
    """Unnormalized <MPO> on the horizontal 1x3 strip starting at
    ``coord`` (reference rdm.py:1789-1884)."""
    assert len(mpo) == 3
    return _eval_mpo_strip(coord, (1, 0), sites, site_of, C, T, mpo)


def eval_mpo_rdm3x1(coord, sites, site_of, C, T, mpo):
    """Unnormalized <MPO> on the vertical 3x1 strip starting at
    ``coord`` (reference rdm.py:1885-1962)."""
    assert len(mpo) == 3
    return _eval_mpo_strip(coord, (0, 1), sites, site_of, C, T, mpo)


def mpo_from_gate(G, n, d, tol=1.0e-12, max_rank=None):
    """Split an n-site gate ``G[(s0..s_{n-1}), (s0'..s_{n-1}')]`` into an
    MPO tuple by successive SVDs (utility for models defining plaquette
    terms as dense gates).

    :param max_rank: if given, use a randomized range finder capped at
        ``max_rank`` instead of a full SVD — large-d gates (maple-leaf
        d=64 gives 4096x4096 matrices) are low-rank sums of two-spin
        terms, so this cuts minutes of LAPACK time to seconds.  The
        residual is checked: if the sketch misses weight beyond ``tol``
        the full SVD runs as fallback.
    """
    import numpy as np

    def trunc_svd(m):
        if max_rank is not None and min(m.shape) > 4 * max_rank:
            rng = np.random.default_rng(0)
            om = rng.standard_normal((m.shape[1], max_rank + 8))
            Q, _ = np.linalg.qr(m @ om)
            B = Q.T.conj() @ m
            Ub, S, Vh = np.linalg.svd(B, full_matrices=False)
            U = Q @ Ub
            # residual check: projected norm must capture everything
            if abs(np.linalg.norm(B) - np.linalg.norm(m)) <= tol * max(
                np.linalg.norm(m), 1.0
            ):
                return U, S, Vh
        return np.linalg.svd(m, full_matrices=False)

    G = np.asarray(G).reshape((d,) * (2 * n))
    # interleave: [s0, s0', s1, s1', ...]
    perm = [i + n * j for i in range(n) for j in range(2)]
    Gt = G.transpose(perm)
    mpo = []
    rest = Gt.reshape(1, *Gt.shape)  # [bond, s0, s0', s1, s1', ...]
    for i in range(n - 1):
        b = rest.shape[0]
        m = rest.reshape(b * d * d, -1)
        U, S, Vh = trunc_svd(m)
        k = max(int((S > tol * S[0]).sum()), 1)
        U, S, Vh = U[:, :k], S[:k], Vh[:k]
        mpo.append(U.reshape(b, d, d, k).transpose(0, 1, 3, 2))
        rest = (S[:, None] * Vh).reshape(k, *((d, d) * (n - 1 - i)))
    mpo.append(rest.reshape(rest.shape[0], d, d, 1).transpose(0, 1, 3, 2))
    return tuple(jnp.asarray(m) for m in mpo)
