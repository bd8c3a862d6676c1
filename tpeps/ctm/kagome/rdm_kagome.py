"""Reduced density matrices for kagome iPESS embedded in square-lattice CTM.

Counterpart of reference ctm/pess_kagome/rdm_kagome.py:30-1550.  The
three kagome DoFs of a down triangle are fused into one square-lattice
site; RDMs open a chosen subset of the 3 DoFs per corner of a 2x2
patch.  Uses the generic square-lattice environment of
:mod:`tpeps.ctm.generic.env`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..c4v.rdm import _cast_to_real, _sym_pos_def_rdm

_DL_CONTRACTION = {
    (0, 1, 2): "mikefgh,njlabcd->eafbgchdmiknjl",
    (1, 2): "mikefgh,mjlabcd->eafbgchdikjl",
    (0, 2): "mikefgh,nilabcd->eafbgchdmknl",
    (0, 1): "mikefgh,njkabcd->eafbgchdminj",
    (0,): "mikefgh,nikabcd->eafbgchdmn",
    (1,): "mikefgh,mjkabcd->eafbgchdij",
    (2,): "mikefgh,milabcd->eafbgchdkl",
    (): "mikefgh,mikabcd->eafbgchd",
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
    a_op = jnp.einsum("iabcd,ji,jefgh->aebfcgdh", A, op, jnp.conj(A))
    d = A.shape
    a_op = a_op.reshape(d[1] ** 2, d[2] ** 2, d[3] ** 2, d[4] ** 2)
    tr = jnp.tensordot(tr, a_op, ((1, 2), (1, 2)))
    tr = jnp.tensordot(T[(c, (0, -1))], tr, ((0, 1), (0, 2)))
    tr = jnp.tensordot(C[(c, (1, -1))], tr, ((0,), (0,)))
    tr = jnp.tensordot(T[(c, (1, 0))], tr, ((0, 1), (0, 2)))
    tr = jnp.tensordot(tr, C[(c, (1, 1))], ((0, 1), (0, 1)))
    return tr


def rdm1x1_kagome(coord, sites, site_of, C, T, dof_dim: int, sym_pos_def=False):
    """1-site (3 DoF) RDM of the down triangle
    (reference rdm_kagome.py:464-766): the trace network with all three
    DoFs open, returned as ``rho[s0,s1,s2; s0',s1',s2']``."""
    c = site_of(coord)
    a = double_layer_a(sites[c], dof_dim, (0, 1, 2))  # [u2,l2,d2,r2,(ket;bra)]
    tr = jnp.tensordot(C[(c, (-1, -1))], T[(c, (-1, 0))], ((0,), (0,)))
    tr = jnp.tensordot(tr, C[(c, (-1, 1))], ((1,), (0,)))
    tr = jnp.tensordot(tr, T[(c, (0, 1))], ((2,), (1,)))
    # tr: [C1-right(top), T1-right D^2, T2-up D^2, T2-right chi]
    tr = jnp.tensordot(tr, a, ((1, 2), (1, 2)))  # -> [top, bot-right, u2, r2, phys]
    tr = jnp.tensordot(T[(c, (0, -1))], tr, ((0, 1), (0, 2)))  # [top-right, bot-right, r2, phys]
    tr = jnp.tensordot(C[(c, (1, -1))], tr, ((0,), (0,)))
    tr = jnp.tensordot(T[(c, (1, 0))], tr, ((0, 1), (0, 2)))  # [bot, bot-right, phys]
    rho = jnp.tensordot(tr, C[(c, (1, 1))], ((0, 1), (0, 1)))  # [phys]
    rho = rho.reshape([dof_dim] * 6)
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
