"""2x3 / 3x2 patch RDMs and partially-open 2x2 RDMs.

Counterpart of reference ctm/generic/rdm_looped.py:159-1744
(``rdm2x3_loop_oe`` / ``rdm3x2_loop_oe``, ``open_sites=[1,2,3,4]``) and
``ctm/generic/rdm.py`` ``rdm2x2(..., open_sites=...)`` — the RDMs used
by the triangular-lattice ring-exchange and chirality terms
(models/spin_triangular.py).

The reference bounds peak memory by index-unrolled loops
(oe_ext.contract_with_unroll); here the patches are contracted directly
with a pairwise-optimal order whose peak is O(chi^2 D^6 d^3) — fine for
the bond dimensions these models run at (D<=4); a sliced variant can be
added for larger D.

Patch positions are row-major; returned indices are the sorted open
positions, kets first then bras.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..c4v.rdm import _sym_pos_def_rdm
from .components import corner_ld, corner_lu, corner_rd, corner_ru

_CORNER_FNS = (corner_lu, corner_ru, corner_ld, corner_rd)
_CORNER_COORD = ((0, 0), (1, 0), (0, 1), (1, 1))


def rdm2x2_open(coord, sites, site_of, C, T, open_sites=(0, 1, 2, 3),
                sym_pos_def: bool = False, slice_phys: bool = False):
    """2x2 patch RDM with an arbitrary subset of open positions
    (reference rdm.py ``rdm2x2`` with ``open_sites``); positions
    0=upper-left, 1=upper-right, 2=lower-left, 3=lower-right.

    :return: ``rho[s_{p0},...,s_{pk}; s'_{p0},...,s'_{pk}]`` for the
        sorted open positions ``p0 < ... < pk``
    """
    open_sites = tuple(sorted(open_sites))
    d = sites[site_of(coord)].shape[0]
    q3 = []
    for pos, (fn, (dx, dy)) in enumerate(zip(_CORNER_FNS, _CORNER_COORD)):
        is_open = pos in open_sites
        c = fn((coord[0] + dx, coord[1] + dy), sites, site_of, C, T,
               open_phys=is_open, slice_phys=slice_phys)
        if is_open:
            c = c.reshape(c.shape[0], c.shape[1], -1)  # fuse (s, s')
        else:
            c = c[:, :, None]
        q3.append(c)
    lu, ru, ld, rd = q3
    uh = jnp.einsum("xri,ryj->xyij", lu, ru)
    lh = jnp.einsum("xri,yrj->xyij", ld, rd)
    rho = jnp.einsum("xyij,xykl->ijkl", uh, lh)  # [p_lu, p_ru, p_ld, p_rd]
    # drop closed (size-1) passengers, unfuse (ket, bra) pairs
    keep = [i for i in range(4) if i in open_sites]
    shape = []
    for i in range(4):
        shape += [d, d] if i in open_sites else [1, 1]
    rho = rho.reshape(shape)
    # current order: (k0,b0,k1,b1,k2,b2,k3,b3); select kets then bras
    perm = [2 * i for i in keep] + [2 * i + 1 for i in keep]
    rho = rho.transpose(perm + [2 * i for i in range(4) if i not in open_sites]
                        + [2 * i + 1 for i in range(4) if i not in open_sites])
    rho = rho.reshape([d] * (2 * len(keep)))
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x3_open1234(coord, sites, site_of, C, T, sym_pos_def: bool = False):
    """2-row x 3-col patch (upper-left at ``coord``) with open positions
    1 (top-mid), 2 (top-right), 3 (bottom-left), 4 (bottom-mid)
    (reference rdm_looped.py ``rdm2x3_loop_oe(open_sites=[1,2,3,4])``).

    :return: ``rho[s1,s2,s3,s4; s1',s2',s3',s4']``
    """
    x, y = coord
    c10 = site_of((x + 1, y))
    c11 = site_of((x + 1, y + 1))
    chi = C[(site_of(coord), (-1, -1))].shape[0]
    a10, a11 = sites[c10], sites[c11]
    D = a10.shape[1]

    # left half: closed LU over open LD; unfuse bond pairs to c10/c11
    lu = corner_lu(coord, sites, site_of, C, T)
    ldo = corner_ld((x, y + 1), sites, site_of, C, T, open_phys=True)
    lh = jnp.einsum("dr,dqxX->rqxX", lu, ldo)
    lh = lh.reshape(chi, D, D, chi, D, D, *lh.shape[2:])  # t,k,K,b,m,M,x3,X3

    Tt = T[(c10, (0, -1))].reshape(chi, D, D, chi)  # [t, u, U, q]
    Tb = T[(c11, (0, 1))].reshape(D, D, chi, chi)  # [f, F, b, p]

    E = jnp.einsum("tkKbmMxX,tuUq->kKbmMxXuUq", lh, Tt)
    E = jnp.einsum("kKbmMxXuUq,yuker->KbmMxXUqyer", E, a10)
    E = jnp.einsum("KbmMxXUqyer,YUKER->bmMxXqyerYER", E, jnp.conj(a10))
    E = jnp.einsum("bmMxXqyerYER,fFbp->mMxXqyerYERfFp", E, Tb)
    E = jnp.einsum("mMxXqyerYERfFp,gemfw->MxXqyrYERFpgw", E, a11)
    E = jnp.einsum("MxXqyrYERFpgw,GEMFW->xXqyrYRpgwGW", E, jnp.conj(a11))

    # right half: open RU over closed RD
    ruo = corner_ru((x + 2, y), sites, site_of, C, T, open_phys=True)
    rd = corner_rd((x + 2, y + 1), sites, site_of, C, T)
    rh = jnp.einsum("ldzZ,dq->lqzZ", ruo, rd)
    rh = rh.reshape(chi, D, D, chi, D, D, *rh.shape[2:])  # q,r,R,p,w,W,x2,X2

    rho = jnp.einsum("xXqyrYRpgwGW,qrRpwWzZ->yzxgYZXG", E, rh)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm2x3_open1234_loop(coord, sites, site_of, C, T, sym_pos_def: bool = False,
                         slice_phys: bool = True):
    """Index-unrolled :func:`rdm2x3_open1234`: the contraction is sliced
    over the top-mid ket physical index (``lax.map``), dividing the
    peak intermediate by d, with phys-sliced open corners — the
    counterpart of reference ctm/generic/rdm_looped.py:159
    ``rdm2x3_loop_oe`` (oe_ext ``contract_with_unroll``).  Exactly equal
    to the direct contraction (tests/test_rdm_loop.py)."""
    import jax
    from jax import lax

    x, y = coord
    c10 = site_of((x + 1, y))
    c11 = site_of((x + 1, y + 1))
    chi = C[(site_of(coord), (-1, -1))].shape[0]
    a10, a11 = sites[c10], sites[c11]
    D = a10.shape[1]

    lu = corner_lu(coord, sites, site_of, C, T)
    ldo = corner_ld((x, y + 1), sites, site_of, C, T, open_phys=True,
                    slice_phys=slice_phys)
    lh = jnp.einsum("dr,dqxX->rqxX", lu, ldo)
    lh = lh.reshape(chi, D, D, chi, D, D, *lh.shape[2:])  # t,k,K,b,m,M,x3,X3

    Tt = T[(c10, (0, -1))].reshape(chi, D, D, chi)  # [t, u, U, q]
    Tb = T[(c11, (0, 1))].reshape(D, D, chi, chi)  # [f, F, b, p]

    E0 = jnp.einsum("tkKbmMxX,tuUq->kKbmMxXuUq", lh, Tt)

    ruo = corner_ru((x + 2, y), sites, site_of, C, T, open_phys=True,
                    slice_phys=slice_phys)
    rd = corner_rd((x + 2, y + 1), sites, site_of, C, T)
    rh = jnp.einsum("ldzZ,dq->lqzZ", ruo, rd)
    rh = rh.reshape(chi, D, D, chi, D, D, *rh.shape[2:])  # q,r,R,p,w,W,x2,X2

    def one_slice(a10_y):
        # a10_y = a10[y] with legs (u, l=k, d=e, r)
        E = jnp.einsum("kKbmMxXuUq,uker->KbmMxXUqer", E0, a10_y)
        E = jnp.einsum("KbmMxXUqer,YUKER->bmMxXqerYER", E, jnp.conj(a10))
        E = jnp.einsum("bmMxXqerYER,fFbp->mMxXqerYERfFp", E, Tb)
        E = jnp.einsum("mMxXqerYERfFp,gemfw->MxXqrYERFpgw", E, a11)
        E = jnp.einsum("MxXqrYERFpgw,GEMFW->xXqrYRpgwGW", E, jnp.conj(a11))
        return jnp.einsum("xXqrYRpgwGW,qrRpwWzZ->zxgYZXG", E, rh)

    rho = lax.map(one_slice, a10)  # [y, z,x,g,Y,Z,X,G]
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm3x2_open1234_loop(coord, sites, site_of, C, T, sym_pos_def: bool = False,
                         slice_phys: bool = True):
    """Index-unrolled :func:`rdm3x2_open1234` via the diagonal
    reflection (reference rdm_looped.py:1029 ``rdm3x2_loop_oe``)."""
    t_sites, t_site_of, tC, tT = transpose_lattice(sites, site_of, C, T)
    return rdm2x3_open1234_loop((coord[1], coord[0]), t_sites, t_site_of, tC, tT,
                                sym_pos_def=sym_pos_def, slice_phys=slice_phys)


def transpose_lattice(sites, site_of, C, T):
    """Reflect the lattice along the main diagonal (x <-> y).

    Maps on-site tensors ``a[s,u,l,d,r] -> a[s,l,u,r,d]``, swaps the
    top/left and bottom/right environment edges and transposes corners.
    Any RDM of the transposed lattice equals the corresponding
    reflected-patch RDM of the original — used to evaluate Nx x Ny
    patches with the validated Ny x Nx contraction.
    """
    t_sites = {(c[1], c[0]): a.transpose(0, 2, 1, 4, 3) for c, a in sites.items()}

    def t_site_of(coord):
        c = site_of((coord[1], coord[0]))
        return (c[1], c[0])

    tC, tT = {}, {}
    for (c, vec), m in C.items():
        tc = (c[1], c[0])
        if vec in ((-1, -1), (1, 1)):
            tC[(tc, vec)] = m.T
        elif vec == (1, -1):
            tC[(tc, (-1, 1))] = m
        else:  # (-1, 1)
            tC[(tc, (1, -1))] = m
    for (c, vec), m in T.items():
        tc = (c[1], c[0])
        if vec == (0, -1):  # top [l, D2, r] -> left [u, d, D2]
            tT[(tc, (-1, 0))] = m.transpose(0, 2, 1)
        elif vec == (-1, 0):  # left [u, d, D2] -> top [l, D2, r]
            tT[(tc, (0, -1))] = m.transpose(0, 2, 1)
        elif vec == (0, 1):  # bottom [D2, l, r] -> right [u, D2, d]
            tT[(tc, (1, 0))] = m.transpose(1, 0, 2)
        else:  # right [u, D2, d] -> bottom [D2, l, r]
            tT[(tc, (0, 1))] = m.transpose(1, 0, 2)
    return t_sites, t_site_of, tC, tT


def rdm3x2_open1234(coord, sites, site_of, C, T, sym_pos_def: bool = False):
    """3-row x 2-col patch (upper-left at ``coord``) with open positions
    1 (mid-left), 2 (bottom-left), 3 (top-right), 4 (mid-right) —
    positions are COLUMN-major (s0..s2 left column, s3..s5 right column;
    reference rdm_looped.py:1341-1385 ``rdm3x2_loop_oe``).

    Evaluated as the 2x3 RDM of the diagonally-reflected lattice (the
    reflection maps the 3x2 column-major numbering onto the 2x3
    row-major numbering).

    :return: ``rho[s1,s2,s3,s4; s1',s2',s3',s4']``
    """
    t_sites, t_site_of, tC, tT = transpose_lattice(sites, site_of, C, T)
    return rdm2x3_open1234((coord[1], coord[0]), t_sites, t_site_of, tC, tT,
                           sym_pos_def=sym_pos_def)


def rdm2x3_open1234_compressed(coord, sites, site_of, C, T, compressed_chi,
                               sym_pos_def: bool = False, proj_kwargs=None):
    """Compressed 2x3 ring-exchange RDM (counterpart of reference
    rdm_looped.py:770 ``rdm2x3_loop_trglringex_compressed``): the
    (chi * D^2) legs crossing the two column cuts are truncated to
    ``compressed_chi`` with CTM up/down-move projector pairs computed
    on the spot, bounding the contraction cost by the compressed
    dimension.  Like the reference's compressed variant this is an
    approximation controlled by how well the CTM projector subspace
    spans the cut (excellent on converged physical states, see
    tests/test_rdm_loop.py).

    Open positions as :func:`rdm2x3_open1234` (1 top-mid, 2 top-right,
    3 bottom-left, 4 bottom-mid); same output order.
    """
    from .projectors import ctm_get_projectors

    x, y = coord
    c10 = site_of((x + 1, y))
    c11 = site_of((x + 1, y + 1))
    chi = C[(site_of(coord), (-1, -1))].shape[0]
    a10, a11 = sites[c10], sites[c11]
    D = a10.shape[1]
    pk = dict(proj_kwargs or {})

    Ptu1, Pu1 = ctm_get_projectors((0, -1), (x + 1, y), sites, site_of, C, T,
                                   compressed_chi, **pk)
    Ptu2, Pu2 = ctm_get_projectors((0, -1), (x + 2, y), sites, site_of, C, T,
                                   compressed_chi, **pk)
    Ptd1, Pd1 = ctm_get_projectors((0, 1), (x, y + 1), sites, site_of, C, T,
                                   compressed_chi, **pk)
    Ptd2, Pd2 = ctm_get_projectors((0, 1), (x + 1, y + 1), sites, site_of,
                                   C, T, compressed_chi, **pk)

    # left half (closed LU over open LD), both row cuts compressed
    lu = corner_lu(coord, sites, site_of, C, T)
    ldo = corner_ld((x, y + 1), sites, site_of, C, T, open_phys=True)
    lh = jnp.einsum("dr,dqxX->rqxX", lu, ldo)
    lh = jnp.einsum("rqxX,ra->aqxX", lh, Ptu1)
    lh = jnp.einsum("aqxX,qb->abxX", lh, Pd1)

    Tt = T[(c10, (0, -1))].reshape(chi, D, D, chi)  # [t, u, U, q]
    Tb = T[(c11, (0, 1))].reshape(D, D, chi, chi)   # [f, F, z, p]
    Pu1u = Pu1.reshape(chi, D, D, -1)               # [t, k, K, a]
    Ptu2u = Ptu2.reshape(chi, D, D, -1)             # [q, r, R, c]
    Ptd1u = Ptd1.reshape(chi, D, D, -1)             # [z, m, M, b]
    Pd2u = Pd2.reshape(chi, D, D, -1)               # [p, w, W, d]

    E = jnp.einsum("abxX,tkKa->bxXtkK", lh, Pu1u)
    E = jnp.einsum("bxXtkK,tuUq->bxXkKuUq", E, Tt)
    E = jnp.einsum("bxXkKuUq,yuker->bxXKUqyer", E, a10)
    E = jnp.einsum("bxXKUqyer,YUKER->bxXqyerYER", E, jnp.conj(a10))
    E = jnp.einsum("bxXqyerYER,qrRc->bxXyeYEc", E, Ptu2u)
    E = jnp.einsum("bxXyeYEc,zmMb->xXyeYEczmM", E, Ptd1u)
    E = jnp.einsum("xXyeYEczmM,fFzp->xXyeYEcmMfFp", E, Tb)
    E = jnp.einsum("xXyeYEcmMfFp,gemfw->xXyYEcMFpgw", E, a11)
    E = jnp.einsum("xXyYEcMFpgw,GEMFW->xXyYcpgwGW", E, jnp.conj(a11))
    E = jnp.einsum("xXyYcpgwGW,pwWd->xXyYcgGd", E, Pd2u)

    # right half (open RU over closed RD), compressed
    ruo = corner_ru((x + 2, y), sites, site_of, C, T, open_phys=True)
    rd = corner_rd((x + 2, y + 1), sites, site_of, C, T)
    rh = jnp.einsum("ldzZ,dq->lqzZ", ruo, rd)
    rh = jnp.einsum("lqzZ,lc->cqzZ", rh, Pu2)
    rh = jnp.einsum("cqzZ,qd->cdzZ", rh, Ptd2)

    rho = jnp.einsum("xXyYcgGd,cdzZ->yzxgYZXG", E, rh)
    return _sym_pos_def_rdm(rho, sym_pos_def=sym_pos_def)


def rdm3x2_open1234_compressed(coord, sites, site_of, C, T, compressed_chi,
                               sym_pos_def: bool = False, proj_kwargs=None):
    """Compressed 3x2 ring-exchange RDM (counterpart of reference
    rdm_looped.py:1495 ``rdm3x2_loop_trglringex_compressed``), evaluated
    as the compressed 2x3 RDM of the diagonally-reflected lattice —
    same site numbering as :func:`rdm3x2_open1234`."""
    t_sites, t_site_of, tC, tT = transpose_lattice(sites, site_of, C, T)
    return rdm2x3_open1234_compressed(
        (coord[1], coord[0]), t_sites, t_site_of, tC, tT, compressed_chi,
        sym_pos_def=sym_pos_def, proj_kwargs=proj_kwargs)


def rdm_compressed_sequence(rdm_compressed_f, coord, sites, site_of, C, T,
                            chi_sequence, proj_kwargs=None, **kwargs):
    """Evaluate a compressed RDM over an increasing ``compressed_chi``
    sequence (counterpart of reference rdm_looped.py:1745-1788
    ``rdm2x3_loop_trglringex_compressed_seq``/``rdm3x2_*_seq``): returns
    the list of RDMs, letting callers monitor convergence in the
    compression dimension or Richardson-extrapolate an observable.

    :param rdm_compressed_f: :func:`rdm2x3_open1234_compressed` or
        :func:`rdm3x2_open1234_compressed`
    :param chi_sequence: iterable of compressed cut dimensions
    :return: ``[rho(chi_c) for chi_c in chi_sequence]``
    """
    return [
        rdm_compressed_f(coord, sites, site_of, C, T, chi_c,
                         proj_kwargs=proj_kwargs, **kwargs)
        for chi_c in chi_sequence
    ]
