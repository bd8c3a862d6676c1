"""Reduced density matrices for kagome iPESS embedded in square-lattice CTM.

Counterpart of reference ctm/pess_kagome/rdm_kagome.py:30-1550.  The
three kagome DoFs of a down triangle are fused into one square-lattice
site; RDMs open a chosen subset of the 3 DoFs per corner of a 2x2
patch.  Uses the generic square-lattice environment of
:mod:`tpeps.ctm.generic.env`.
"""

from __future__ import annotations

import string

import jax.numpy as jnp

from ..c4v.rdm import _cast_to_real, _sym_pos_def_rdm


def _dl_spec(open_sites) -> str:
    """Einsum spec for the kagome double-layer tensor, derived from the
    index roles: ket ``A3[p0 p1 p2, u l d r]`` against bra ``conj(A3)``
    with the DoFs in ``open_sites`` left open (fresh bra letters) and
    the rest traced (shared letters); output = interleaved (ket, bra)
    aux pairs, then open ket DoFs, then open bra DoFs."""
    it = iter(string.ascii_lowercase)
    ket_p = [next(it) for _ in range(3)]
    aux_k = [next(it) for _ in range(4)]
    bra_p = [next(it) if i in open_sites else ket_p[i] for i in range(3)]
    aux_b = [next(it) for _ in range(4)]
    out = "".join(k + b for k, b in zip(aux_k, aux_b))
    out += "".join(ket_p[i] for i in open_sites)
    out += "".join(bra_p[i] for i in open_sites)
    return f"{''.join(ket_p)}{''.join(aux_k)},{''.join(bra_p)}{''.join(aux_b)}->{out}"


_DL_CONTRACTION = {
    os_: _dl_spec(os_)
    for os_ in ((0, 1, 2), (1, 2), (0, 2), (0, 1), (0,), (1,), (2,), ())
}


def double_layer_a(A, dof_dim: int, open_sites=()):
    """Double-layer tensor with selected kagome DoFs left open
    (reference rdm_kagome.py:30-91).  Aux pairs fused; the open physical
    DoFs are aggregated into a trailing |ket><bra| index."""
    open_sites = tuple(sorted(open_sites))
    dims = A.shape
    A3 = A.reshape((dof_dim,) * 3 + dims[1:])
    a = jnp.einsum(_DL_CONTRACTION[open_sites], A3, jnp.conj(A3))
    out_shape = [x**2 for x in dims[1:]]
    if open_sites:
        out_shape.append(-1)
    return a.reshape(out_shape)


def enlarged_corner(coord, sites, site_of, C, T, corner: str, dof_dim: int,
                    open_sites=(), a=None):
    """Enlarged corner with an optional open-DoF passenger index
    (reference rdm_kagome.py:92-311)."""
    c = site_of(coord)
    if a is None:
        a = double_layer_a(sites[c], dof_dim, open_sites)
    pleg = len(tuple(open_sites)) > 0
    extra = [4] if pleg else []
    if corner == "LU":
        q = jnp.tensordot(C[(c, (-1, -1))], T[(c, (0, -1))], ((1,), (0,)))
        q = jnp.tensordot(q, T[(c, (-1, 0))], ((0,), (0,)))
        q = jnp.tensordot(q, a, ((0, 3), (0, 1)))
        q = q.transpose(tuple([1, 2, 0, 3] + extra))
        new_shape = [q.shape[0] * q.shape[1], q.shape[2] * q.shape[3]] + ([-1] if pleg else [])
        return q.reshape(new_shape)
    if corner == "RU":
        q = jnp.tensordot(C[(c, (1, -1))], T[(c, (1, 0))], ((1,), (0,)))
        q = jnp.tensordot(q, T[(c, (0, -1))], ((0,), (2,)))
        q = jnp.tensordot(q, a, ((0, 3), (3, 0)))
        q = q.transpose(tuple([1, 2, 0, 3] + extra))
        new_shape = [q.shape[0] * q.shape[1], q.shape[2] * q.shape[3]] + ([-1] if pleg else [])
        return q.reshape(new_shape)
    if corner == "RD":
        q = jnp.tensordot(C[(c, (1, 1))], T[(c, (0, 1))], ((1,), (2,)))
        q = jnp.tensordot(q, T[(c, (1, 0))], ((0,), (2,)))
        q = jnp.tensordot(q, a, ((0, 3), (2, 3)))
        q = q.transpose(tuple([1, 2, 0, 3] + extra))
        new_shape = [q.shape[0] * q.shape[1], q.shape[2] * q.shape[3]] + ([-1] if pleg else [])
        return q.reshape(new_shape)
    if corner == "LD":
        q = jnp.tensordot(C[(c, (-1, 1))], T[(c, (-1, 0))], ((0,), (1,)))
        q = jnp.tensordot(q, T[(c, (0, 1))], ((0,), (1,)))
        q = jnp.tensordot(q, a, ((1, 2), (1, 2)))
        q = q.transpose(tuple([0, 2, 1, 3] + extra))
        new_shape = [q.shape[0] * q.shape[1], q.shape[2] * q.shape[3]] + ([-1] if pleg else [])
        return q.reshape(new_shape)
    raise ValueError(f"Invalid corner: {corner}")


def trace1x1_dn_kagome(coord, sites, site_of, C, T, op, dof_dim: int):
    """Unnormalized expectation of a 3-DoF operator on the down triangle
    of a single site (reference rdm_kagome.py:312-464)."""
    c = site_of(coord)
    A = sites[c]
    if op.ndim == 6:
        op = op.reshape(op.shape[0] ** 3, -1)
    tr = jnp.tensordot(C[(c, (-1, -1))], T[(c, (-1, 0))], ((0,), (0,)))
    tr = jnp.tensordot(tr, C[(c, (-1, 1))], ((1,), (0,)))
    tr = jnp.tensordot(tr, T[(c, (0, 1))], ((2,), (1,)))
    a_op = jnp.einsum("xuldr,yx,yULDR->uUlLdDrR", A, op, jnp.conj(A))
    d = A.shape
    a_op = a_op.reshape(d[1] ** 2, d[2] ** 2, d[3] ** 2, d[4] ** 2)
    tr = jnp.tensordot(tr, a_op, ((1, 2), (1, 2)))
    tr = jnp.tensordot(T[(c, (0, -1))], tr, ((0, 1), (0, 2)))
    tr = jnp.tensordot(C[(c, (1, -1))], tr, ((0,), (0,)))
    tr = jnp.tensordot(T[(c, (1, 0))], tr, ((0, 1), (0, 2)))
    tr = jnp.tensordot(tr, C[(c, (1, 1))], ((0, 1), (0, 1)))
    return tr


def rdm1x1_kagome(coord, sites, site_of, C, T, dof_dim: int, sym_pos_def=False,
                  sites_to_keep=(0, 1, 2)):
    """1-site RDM of the down triangle over a kept-DoF subset
    (reference rdm_kagome.py:464-766 with ``sites_to_keep``), returned
    as ``rho[kets; bras]``."""
    keep = _keep(sites_to_keep)
    c = site_of(coord)
    a = double_layer_a(sites[c], dof_dim, keep)  # [u2,l2,d2,r2,(ket;bra)]
    tr = jnp.tensordot(C[(c, (-1, -1))], T[(c, (-1, 0))], ((0,), (0,)))
    tr = jnp.tensordot(tr, C[(c, (-1, 1))], ((1,), (0,)))
    tr = jnp.tensordot(tr, T[(c, (0, 1))], ((2,), (1,)))
    # tr: [C1-right(top), T1-right D^2, T2-up D^2, T2-right chi]
    tr = jnp.tensordot(tr, a, ((1, 2), (1, 2)))  # -> [top, bot-right, u2, r2, phys]
    tr = jnp.tensordot(T[(c, (0, -1))], tr, ((0, 1), (0, 2)))  # [top-right, bot-right, r2, phys]
    tr = jnp.tensordot(C[(c, (1, -1))], tr, ((0,), (0,)))
    tr = jnp.tensordot(T[(c, (1, 0))], tr, ((0, 1), (0, 2)))  # [bot, bot-right, phys]
    rho = jnp.tensordot(tr, C[(c, (1, 1))], ((0, 1), (0, 1)))  # [phys]
    rho = rho.reshape([dof_dim] * (2 * len(keep)))
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x2_up_triangle_open(coord, sites, site_of, C, T, dof_dim: int,
                            sym_pos_def=False):
    """3-site RDM of the UP triangle spanning the 2x2 patch with
    upper-left at ``coord`` (reference rdm_kagome.py:1008-1131):
    DoF 1 of site coord+(1,0), DoF 0 of coord+(1,1), DoF 2 of coord+(0,1).
    Returns ``rho[s0,s1,s2; s0',s1',s2']``."""
    lu = enlarged_corner(coord, sites, site_of, C, T, "LU", dof_dim, ())
    ru = enlarged_corner((coord[0] + 1, coord[1]), sites, site_of, C, T, "RU",
                         dof_dim, (1,))
    rd = enlarged_corner((coord[0] + 1, coord[1] + 1), sites, site_of, C, T, "RD",
                         dof_dim, (0,))
    ld = enlarged_corner((coord[0], coord[1] + 1), sites, site_of, C, T, "LD",
                         dof_dim, (2,))
    upper = jnp.tensordot(lu, ru, ((1,), (0,)))  # [lu0, ru1, ru-phys]
    lower = jnp.tensordot(ld, rd, ((1,), (1,)))  # [ld0, ld-phys, rd0, rd-phys]
    lower = lower.transpose(0, 2, 1, 3)
    rho = jnp.tensordot(upper, lower, ((0, 1), (0, 1)))  # [ru-p, ld-p, rd-p]
    rho = rho.reshape([dof_dim] * 6)
    # per-corner pairs are (ket, bra); geometric site order (reference
    # rdm_kagome.py:1120-1131)
    rho = rho.transpose(0, 2, 4, 1, 3, 5)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x2_dn_triangle_with_operator(coord, sites, site_of, C, T, op, dof_dim: int):
    """Normalized expectation of a 3-DoF operator on the down triangle of
    site ``coord`` within a 2x2 patch (reference rdm_kagome.py:1132-1285).

    :return: ``(<op>, norm)``
    """
    c = site_of(coord)
    A = sites[c]
    if op.ndim == 6:
        op = op.reshape(op.shape[0] ** 3, -1)
    dims = A.shape
    a = jnp.einsum("mefgh,mabcd->eafbgchd", A, jnp.conj(A)).reshape(
        dims[1] ** 2, dims[2] ** 2, dims[3] ** 2, dims[4] ** 2
    )
    a_op = jnp.einsum("mefgh,nm,nabcd->eafbgchd", A, op, jnp.conj(A)).reshape(
        dims[1] ** 2, dims[2] ** 2, dims[3] ** 2, dims[4] ** 2
    )
    q = jnp.tensordot(C[(c, (-1, -1))], T[(c, (0, -1))], ((1,), (0,)))
    q = jnp.tensordot(q, T[(c, (-1, 0))], ((0,), (0,)))
    lu_op = jnp.tensordot(q, a_op, ((0, 3), (0, 1)))
    lu_id = jnp.tensordot(q, a, ((0, 3), (0, 1)))
    lu_op = lu_op.transpose(1, 2, 0, 3).reshape(lu_op.shape[1] * lu_op.shape[2], -1)
    lu_id = lu_id.transpose(1, 2, 0, 3).reshape(lu_id.shape[1] * lu_id.shape[2], -1)

    ru = enlarged_corner((coord[0] + 1, coord[1]), sites, site_of, C, T, "RU", dof_dim, ())
    rd = enlarged_corner((coord[0] + 1, coord[1] + 1), sites, site_of, C, T, "RD", dof_dim, ())
    ld = enlarged_corner((coord[0], coord[1] + 1), sites, site_of, C, T, "LD", dof_dim, ())

    upper_op = lu_op @ ru
    upper_id = lu_id @ ru
    lower = jnp.tensordot(ld, rd, ((1,), (1,)))
    val = jnp.tensordot(upper_op, lower, ((0, 1), (0, 1)))
    norm = jnp.tensordot(upper_id, lower, ((0, 1), (0, 1)))
    norm = _cast_to_real(norm)
    return val / norm, norm


def _keep(sites_to_keep):
    """Normalize DoF subsets: letters 'A','B','C' or ints 0,1,2."""
    m = {"A": 0, "B": 1, "C": 2}
    return tuple(sorted(m.get(s, s) for s in sites_to_keep))


def rdm2x2_kagome(coord, sites, site_of, C, T, dof_dim: int,
                  sites_to_keep_00=(0, 1, 2), sites_to_keep_10=(0, 1, 2),
                  sites_to_keep_01=(0, 1, 2), sites_to_keep_11=(0, 1, 2),
                  sym_pos_def=False):
    """2x2-patch RDM with arbitrary kept-DoF subsets per position
    (reference rdm_kagome.py:1286-1422 ``rdm2x2_kagome``).

    :return: ``rho[kets_00, kets_10, kets_01, kets_11;
        bras_00, ...]`` over the kept DoFs (positions with no kept DoF
        contribute no index), each position's DoFs in ascending order.
    """
    keeps = [_keep(k) for k in
             (sites_to_keep_00, sites_to_keep_10, sites_to_keep_01,
              sites_to_keep_11)]
    x, y = coord
    lu = enlarged_corner(coord, sites, site_of, C, T, "LU", dof_dim, keeps[0])
    ru = enlarged_corner((x + 1, y), sites, site_of, C, T, "RU", dof_dim, keeps[1])
    ld = enlarged_corner((x, y + 1), sites, site_of, C, T, "LD", dof_dim, keeps[2])
    rd = enlarged_corner((x + 1, y + 1), sites, site_of, C, T, "RD", dof_dim, keeps[3])

    def mat3(q, has_p):
        return q if has_p else q[:, :, None]

    lu = mat3(lu, bool(keeps[0]))
    ru = mat3(ru, bool(keeps[1]))
    ld = mat3(ld, bool(keeps[2]))
    rd = mat3(rd, bool(keeps[3]))
    upper = jnp.einsum("ijp,jkq->ikpq", lu, ru)
    lower = jnp.einsum("ijr,kjs->ikrs", ld, rd)
    rho = jnp.einsum("ikpq,ikrs->pqrs", upper, lower)
    # unfuse each present passenger into (kets..., bras...) and order
    # all kets first (position order 00,10,01,11), then all bras
    ket_dims, shapes = [], []
    for k in keeps:
        nk = len(k)
        shapes.append(([dof_dim] * nk, [dof_dim] * nk))
        ket_dims.append(nk)
    full_shape = []
    for (kd, bd) in shapes:
        full_shape += kd + bd
    rho = rho.reshape(full_shape if full_shape else (1,) * 4)
    perm_k, perm_b = [], []
    off = 0
    for nk in ket_dims:
        perm_k += list(range(off, off + nk))
        perm_b += list(range(off + nk, off + 2 * nk))
        off += 2 * nk
    rho = rho.transpose(perm_k + perm_b)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x1_kagome(coord, sites, site_of, C, T, dof_dim: int,
                  sites_to_keep_00=(0, 1, 2), sites_to_keep_10=(0, 1, 2),
                  sym_pos_def=False):
    """Horizontal 2x1 window RDM with kept-DoF subsets
    (reference rdm_kagome.py:767-890); contraction mirrors the
    validated ``tpeps.ctm.generic.dl.rdm2x1_dl`` with the kagome
    passenger index threaded last."""
    k0, k1 = _keep(sites_to_keep_00), _keep(sites_to_keep_10)
    c0 = site_of(coord)
    c1 = site_of((coord[0] + 1, coord[1]))
    a0 = double_layer_a(sites[c0], dof_dim, k0)
    a1 = double_layer_a(sites[c1], dof_dim, k1)
    if not k0:
        a0 = a0[..., None]
    if not k1:
        a1 = a1[..., None]
    q = jnp.einsum("xy,ymz->xmz", C[(c0, (-1, -1))], T[(c0, (0, -1))])
    q = jnp.einsum("xmz,xwl->mzwl", q, T[(c0, (-1, 0))])
    q = jnp.einsum("mzwl,mldrp->zwdrp", q, a0)
    q = jnp.einsum("zwdrp,wv->zvdrp", q, C[(c0, (-1, 1))])
    q = jnp.einsum("zvdrp,dvu->zrup", q, T[(c0, (0, 1))])
    q = jnp.einsum("zrup,znw->rupnw", q, T[(c1, (0, -1))])
    q = jnp.einsum("rupnw,nrdsq->upwdsq", q, a1)
    q = jnp.einsum("upwdsq,dug->pwsqg", q, T[(c1, (0, 1))])
    q = jnp.einsum("pwsqg,wt->ptsqg", q, C[(c1, (1, -1))])
    q = jnp.einsum("ptsqg,tsh->pqgh", q, T[(c1, (1, 0))])
    rho = jnp.einsum("pqgh,hg->pq", q, C[(c1, (1, 1))])
    return _unfuse_pair_rho(rho, dof_dim, (len(k0), len(k1)), sym_pos_def)


def rdm1x2_kagome(coord, sites, site_of, C, T, dof_dim: int,
                  sites_to_keep_00=(0, 1, 2), sites_to_keep_01=(0, 1, 2),
                  sym_pos_def=False):
    """Vertical 1x2 window RDM with kept-DoF subsets
    (reference rdm_kagome.py:891-1007)."""
    k0, k1 = _keep(sites_to_keep_00), _keep(sites_to_keep_01)
    c0 = site_of(coord)
    c1 = site_of((coord[0], coord[1] + 1))
    a0 = double_layer_a(sites[c0], dof_dim, k0)
    a1 = double_layer_a(sites[c1], dof_dim, k1)
    if not k0:
        a0 = a0[..., None]
    if not k1:
        a1 = a1[..., None]
    q = jnp.einsum("xy,ymz->xmz", C[(c0, (-1, -1))], T[(c0, (0, -1))])
    q = jnp.einsum("xmz,zn->xmn", q, C[(c0, (1, -1))])
    q = jnp.einsum("xmn,nrv->xmrv", q, T[(c0, (1, 0))])
    q = jnp.einsum("xmrv,xwl->mrvwl", q, T[(c0, (-1, 0))])
    q = jnp.einsum("mrvwl,mldrp->vwdp", q, a0)
    q = jnp.einsum("vwdp,wcl->vdpcl", q, T[(c1, (-1, 0))])
    q = jnp.einsum("vdpcl,dlgsq->vpcgsq", q, a1)
    q = jnp.einsum("vpcgsq,vst->pcgqt", q, T[(c1, (1, 0))])
    q = jnp.einsum("pcgqt,cy->pgqty", q, C[(c1, (-1, 1))])
    q = jnp.einsum("pgqty,gyu->pqtu", q, T[(c1, (0, 1))])
    rho = jnp.einsum("pqtu,tu->pq", q, C[(c1, (1, 1))])
    return _unfuse_pair_rho(rho, dof_dim, (len(k0), len(k1)), sym_pos_def)


def _unfuse_pair_rho(rho, dof_dim, nkept, sym_pos_def):
    n0, n1 = nkept
    rho = rho.reshape([dof_dim] * (2 * n0) + [dof_dim] * (2 * n1))
    perm = (list(range(0, n0)) + list(range(2 * n0, 2 * n0 + n1))
            + list(range(n0, 2 * n0))
            + list(range(2 * n0 + n1, 2 * n0 + 2 * n1)))
    rho = rho.transpose(perm)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x2_nnn_1(coord, sites, site_of, C, T, op, dof_dim: int):
    """The two NNN bonds crossing the 2x2 patch diagonally adjacent to
    the LD--RU direction (reference rdm_kagome.py:1423-1478):
    (RU DoF 1, LD DoF 0) and (RU DoF 0, LD DoF 2).

    :param op: rank-4 two-site operator ``op[k_up, k_low, b_up, b_low]``
    :return: ``(bond12, bond31, norm)`` — unnormalized values and the
        patch norm.
    """
    x, y = coord
    lu = enlarged_corner(coord, sites, site_of, C, T, "LU", dof_dim, ())
    rd = enlarged_corner((x + 1, y + 1), sites, site_of, C, T, "RD", dof_dim, ())

    def bond(cs_ru, cs_ld):
        ru = enlarged_corner((x + 1, y), sites, site_of, C, T, "RU", dof_dim,
                             (cs_ru,))
        ld = enlarged_corner((x, y + 1), sites, site_of, C, T, "LD", dof_dim,
                             (cs_ld,))
        upper = jnp.einsum("ij,jkp->ikp", lu, ru)
        lower = jnp.einsum("ikq,jk->ijq", ld, rd)
        val = jnp.einsum("ikp,ikq->pq", upper, lower)
        val = val.reshape(dof_dim, dof_dim, dof_dim, dof_dim)
        # val[k_up, b_up, k_low, b_low]
        return jnp.einsum("aebf,abef->", val, op)

    ru0 = enlarged_corner((x + 1, y), sites, site_of, C, T, "RU", dof_dim, ())
    ld0 = enlarged_corner((x, y + 1), sites, site_of, C, T, "LD", dof_dim, ())
    # rd rows = up (contracted with ru-col), rd cols = left (with ld-col)
    norm = jnp.einsum("ij,jk,kl,il->", lu, ru0, rd, ld0)
    return bond(1, 0), bond(0, 2), _cast_to_real(norm)


def rdm2x2_nnn_2(coord, sites, site_of, C, T, op, dof_dim: int):
    """NNN bonds along the top row of the 2x2 patch (reference
    rdm_kagome.py:1479-1548): (LU DoF 2, RU DoF 1) and
    (LU DoF 1, RU DoF 0).  Same conventions as :func:`rdm2x2_nnn_1`."""
    x, y = coord
    rd = enlarged_corner((x + 1, y + 1), sites, site_of, C, T, "RD", dof_dim, ())
    ld = enlarged_corner((x, y + 1), sites, site_of, C, T, "LD", dof_dim, ())
    lower = jnp.einsum("ij,kj->ik", ld, rd)

    def bond(cs_lu, cs_ru):
        lu = enlarged_corner(coord, sites, site_of, C, T, "LU", dof_dim,
                             (cs_lu,))
        ru = enlarged_corner((x + 1, y), sites, site_of, C, T, "RU", dof_dim,
                             (cs_ru,))
        upper = jnp.einsum("ijp,jkq->ikpq", lu, ru)
        val = jnp.einsum("ikpq,ik->pq", upper, lower)
        val = val.reshape(dof_dim, dof_dim, dof_dim, dof_dim)
        return jnp.einsum("aebf,abef->", val, op)

    lu0 = enlarged_corner(coord, sites, site_of, C, T, "LU", dof_dim, ())
    ru0 = enlarged_corner((x + 1, y), sites, site_of, C, T, "RU", dof_dim, ())
    norm = jnp.einsum("ij,jk,ik->", lu0, ru0, lower)
    return bond(2, 1), bond(1, 0), _cast_to_real(norm)


def rdm2x2_nnn_3(coord, sites, site_of, C, T, op, dof_dim: int):
    """NNN bonds along the left column of the 2x2 patch (reference
    rdm_kagome.py:1550-1620): (LU DoF 2, LD DoF 0) and
    (LU DoF 1, LD DoF 2).  Same conventions as :func:`rdm2x2_nnn_1`."""
    x, y = coord
    ru = enlarged_corner((x + 1, y), sites, site_of, C, T, "RU", dof_dim, ())
    rd = enlarged_corner((x + 1, y + 1), sites, site_of, C, T, "RD", dof_dim, ())
    # ru-col (down) contracts rd-row (up); output [ru-left, rd-left]
    right = jnp.einsum("jk,kl->jl", ru, rd)

    def bond(cs_lu, cs_ld):
        lu = enlarged_corner(coord, sites, site_of, C, T, "LU", dof_dim,
                             (cs_lu,))
        ld = enlarged_corner((x, y + 1), sites, site_of, C, T, "LD", dof_dim,
                             (cs_ld,))
        left = jnp.einsum("ijp,ilq->jlpq", lu, ld)
        val = jnp.einsum("jlpq,jl->pq", left, right)
        val = val.reshape(dof_dim, dof_dim, dof_dim, dof_dim)
        return jnp.einsum("aebf,abef->", val, op)

    lu0 = enlarged_corner(coord, sites, site_of, C, T, "LU", dof_dim, ())
    ld0 = enlarged_corner((x, y + 1), sites, site_of, C, T, "LD", dof_dim, ())
    norm = jnp.einsum("ij,il,jl->", lu0, ld0, right)
    return bond(2, 0), bond(1, 2), _cast_to_real(norm)
