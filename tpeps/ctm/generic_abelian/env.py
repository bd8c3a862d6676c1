"""Abelian block-sparse CTM environment for generic unit cells.

Counterpart of reference ctm/generic_abelian/env_abelian.py:13-470 over
:class:`tpeps.sym.tensor.AbelianTensor` instead of yastn.  Same geometry
as the dense :mod:`tpeps.ctm.generic.env`, but environment legs keep
their charge structure and the D-pair legs stay **unfused**:

* ``C[(coord,(dx,dy))]`` rank-2 (chi, chi)
* ``T[(c,(0,-1))]`` top:    (chi_left, Dk_down, Db_down, chi_right)
* ``T[(c,(-1,0))]`` left:   (chi_up, chi_down, Dk_right, Db_right)
* ``T[(c,(0,1))]``  bottom: (Dk_up, Db_up, chi_left, chi_right)
* ``T[(c,(1,0))]``  right:  (chi_up, Dk_left, Db_left, chi_down)

chi legs carry emergent charge sectors: the initial ones are fused
double-layer (ket, bra) pairs; after a move they are the truncated SVD
legs.  ``chi`` is the *target* total dimension — blocks start smaller
and grow until the global cross-sector truncation binds.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

CORNER_VECS = ((-1, -1), (1, -1), (1, 1), (-1, 1))
EDGE_VECS = ((0, -1), (-1, 0), (0, 1), (1, 0))


class ENV_ABELIAN:
    """Host-side container of AbelianTensor corners/edges."""

    def __init__(self, chi: int, C=None, T=None):
        self.chi = chi
        self.C = dict(C) if C else {}
        self.T = dict(T) if T else {}

    def clone(self):
        return ENV_ABELIAN(self.chi, dict(self.C), dict(self.T))

    def get_spectra(self):
        """Sorted singular values of every corner (dense embed; corners
        are chi x chi at most — cheap)."""
        out = {}
        for k, c in self.C.items():
            out[k] = jnp.sort(jnp.linalg.svd(c.to_dense(), compute_uv=False))[::-1]
        return out


def env_with_grading(env: ENV_ABELIAN, fermionic: bool) -> ENV_ABELIAN:
    """Reinterpret every environment tensor with the given Grassmann
    grading flag (blocks shared, no copies).

    For fermionic states the environment is CONVERGED on the bosonic
    interpretation: every closed norm-network term is identically
    sign-free in the row-major arrangement (verified term-by-term on
    2x1/1x2/2x2 tori in tests/test_fermionic.py), so the bosonic CTM
    computes the exact norm environment with the physical truncation
    spectrum, while the graded run's open pieces carry a non-factorizable
    sign structure that wrecks the truncation basis.  Observables then
    reinstate the grading: RDM patches contract graded state tensors
    with the graded *view* of this environment (chi legs' parity is
    well-defined: a fused (ket, bra) pair's parity p(k)+p(b) is a
    function of the fused charge alone).
    """
    from ...sym.tensor import AbelianTensor

    out = ENV_ABELIAN(env.chi)
    for k, t in env.C.items():
        out.C[k] = AbelianTensor(t.sym, t.signature, t.legs, t.n, t.blocks,
                                 t.dtype, fermionic)
    for k, t in env.T.items():
        out.T[k] = AbelianTensor(t.sym, t.signature, t.legs, t.n, t.blocks,
                                 t.dtype, fermionic)
    return out


def _normalized(t):
    s = t.max_abs()
    if isinstance(s, (float, np.floating, np.ndarray)):
        return t * (1.0 / float(s))  # host backend
    return t * (1.0 / jax.lax.stop_gradient(s))


def init_env(state, chi: int, init_type: str = "CTMRG") -> ENV_ABELIAN:
    if init_type == "CTMRG":
        return init_from_ipeps_pbc(state, chi)
    if init_type == "eye":
        return init_eye(state, chi)
    raise ValueError(f"Invalid abelian environment initialization: {init_type}")


def init_eye(state, chi: int) -> ENV_ABELIAN:
    """Identity-channel environment (yastn EnvCTM ``init='eye'``, used by
    the reference's fermionic runs, examples/honeycomb/CI.py:135): every
    corner is the scalar 1 on a dim-1 charge-0 chi leg and every edge is
    the identity on its (ket, bra) bond pair.  Chi sectors then grow
    move by move through the truncated projectors."""
    from ...sym.tensor import AbelianTensor, leg

    env = ENV_ABELIAN(chi)
    one = np.ones((1, 1))

    def triv(sym):
        return leg({0 if sym != "U1xU1" else (0, 0): 1})

    for coord in state.sites:
        a = state.sites[coord]
        sym = a.sym
        t0 = triv(sym)
        backend_np = all(
            isinstance(b, np.ndarray) for b in a.blocks.values()
        )
        q0 = 0 if sym != "U1xU1" else (0, 0)
        # corner signatures mirror init_from_ipeps_pbc's fused pairs:
        # C(-1,-1)=(d2,r2)->(-1,-1); C(1,-1)=(l2,d2)->(1,-1);
        # C(1,1)=(u2,l2)->(1,1);     C(-1,1)=(u2,r2)->(1,-1)
        corner_sig = {
            (-1, -1): (-1, -1), (1, -1): (1, -1),
            (1, 1): (1, 1), (-1, 1): (1, -1),
        }
        for cvec in CORNER_VECS:
            c = AbelianTensor(sym, corner_sig[cvec], (t0, t0), 0, dtype=a.dtype,
                              fermionic=a.fermionic)
            c.blocks[(q0, q0)] = one if backend_np else jnp.asarray(one, a.dtype)
            env.C[(coord, cvec)] = c

        # edge identities: delta over the facing (ket, bra) pair.  Leg
        # layouts follow the module docstring; the ket leg keeps the
        # site tensor's signature, the bra leg its conjugate's.
        #   a[s,u,l,d,r] signature (1,1,1,-1,-1)
        for dvec, ax in (((0, -1), 3), ((-1, 0), 4), ((0, 1), 1), ((1, 0), 2)):
            # T faces the opposite leg of the neighbouring site: the top
            # edge carries the site's u-facing bond -> pair of (d-leg of
            # the row above) == (u-leg charges); use the site's own axis
            # that the edge plugs into: top edge plugs into u (ax=1)...
            pass
        # top edge (0,-1): legs (chi_l, Dk, Db, chi_r); D pair faces the
        # site's u leg (contracts with a's u (sig +1) and a*'s u (-1)),
        # so the edge's ket leg must carry sig -1 and the bra +1, with
        # the u-leg charge table.
        def eye_edge(bond_ax, order):
            lk = a.legs[bond_ax]
            sk, sb = -a.signature[bond_ax], a.signature[bond_ax]
            legs_T = {
                "kb_mid": ((t0, lk, lk, t0), (1, sk, sb, -1)),
                "kb_tail": ((t0, t0, lk, lk), (1, -1, sk, sb)),
                "kb_head": ((lk, lk, t0, t0), (sk, sb, 1, -1)),
                "kb_mid2": ((t0, lk, lk, t0), (1, sk, sb, -1)),
            }[order]
            t = AbelianTensor(sym, legs_T[1], legs_T[0], 0, dtype=a.dtype,
                              fermionic=a.fermionic)
            for q, d in lk.charges:
                ey = np.eye(d)
                if order == "kb_mid" or order == "kb_mid2":
                    blk = ey.reshape(1, d, d, 1)
                    key = (q0, q, q, q0)
                elif order == "kb_tail":
                    blk = ey.reshape(1, 1, d, d)
                    key = (q0, q0, q, q)
                else:
                    blk = ey.reshape(d, d, 1, 1)
                    key = (q, q, q0, q0)
                t.blocks[key] = blk if backend_np else jnp.asarray(blk, a.dtype)
            return t

        env.T[(coord, (0, -1))] = eye_edge(1, "kb_mid")    # (chi_l, uk, ub, chi_r)
        env.T[(coord, (-1, 0))] = eye_edge(2, "kb_tail")   # (chi_u, chi_d, lk, lb)
        env.T[(coord, (0, 1))] = eye_edge(3, "kb_head")    # (dk, db, chi_l, chi_r)
        env.T[(coord, (1, 0))] = eye_edge(4, "kb_mid2")    # (chi_u, rk, rb, chi_d)
    return env


def init_from_ipeps_pbc(state, chi: int) -> ENV_ABELIAN:
    """Environment from PBC-traced double layers (reference
    env_abelian.py:317-470; same network as the dense
    :func:`tpeps.ctm.generic.env.init_from_ipeps_pbc`, with (ket, bra)
    pairs hard-fused into chi legs via ``fuse_pair``)."""
    env = ENV_ABELIAN(chi)

    for coord in state.sites:
        # corners: trace phys + two outward directions.  site legs are
        # a[s,u,l,d,r] = (0..4); tensordot with the conjugate traces the
        # (ket, bra) pairs of the listed axes.
        A = state.site((coord[0] - 1, coord[1] - 1))
        c = A.tensordot(A.conj(), ((0, 1, 2), (0, 1, 2)))  # (d,r, d',r')
        c = c.transpose((0, 2, 1, 3)).fuse_pair(0).fuse_pair(1)  # [d^2, r^2]
        env.C[(coord, (-1, -1))] = _normalized(c)

        A = state.site((coord[0] + 1, coord[1] - 1))
        c = A.tensordot(A.conj(), ((0, 1, 4), (0, 1, 4)))  # (l,d, l',d')
        c = c.transpose((0, 2, 1, 3)).fuse_pair(0).fuse_pair(1)  # [l^2, d^2]
        env.C[(coord, (1, -1))] = _normalized(c)

        A = state.site((coord[0] + 1, coord[1] + 1))
        c = A.tensordot(A.conj(), ((0, 3, 4), (0, 3, 4)))  # (u,l, u',l')
        c = c.transpose((0, 2, 1, 3)).fuse_pair(0).fuse_pair(1)  # [u^2, l^2]
        env.C[(coord, (1, 1))] = _normalized(c)

        A = state.site((coord[0] - 1, coord[1] + 1))
        c = A.tensordot(A.conj(), ((0, 2, 3), (0, 2, 3)))  # (u,r, u',r')
        c = c.transpose((0, 2, 1, 3)).fuse_pair(0).fuse_pair(1)  # [u^2, r^2]
        env.C[(coord, (-1, 1))] = _normalized(c)

        # edges: trace phys + one outward direction, fuse the two chi
        # pairs, keep the bond-facing pair unfused
        A = state.site((coord[0], coord[1] - 1))
        t = A.tensordot(A.conj(), ((0, 1), (0, 1)))  # (l,d,r, l',d',r')
        # -> (l,l', d,d', r,r') -> (chi_l, dk, db, chi_r)
        t = t.transpose((0, 3, 1, 4, 2, 5)).fuse_pair(0)  # (chi_l, d,d', r,r')
        t = t.fuse_pair(3)  # (chi_l, dk, db, chi_r)
        env.T[(coord, (0, -1))] = _normalized(t)

        A = state.site((coord[0] - 1, coord[1]))
        t = A.tensordot(A.conj(), ((0, 2), (0, 2)))  # (u,d,r, u',d',r')
        t = t.transpose((0, 3, 1, 4, 2, 5)).fuse_pair(0)  # (chi_u, d,d', r,r')
        t = t.fuse_pair(1)  # (chi_u, chi_d, rk, rb)
        env.T[(coord, (-1, 0))] = _normalized(t)

        A = state.site((coord[0], coord[1] + 1))
        t = A.tensordot(A.conj(), ((0, 3), (0, 3)))  # (u,l,r, u',l',r')
        t = t.transpose((0, 3, 1, 4, 2, 5))  # (u,u', l,l', r,r')
        t = t.fuse_pair(2).fuse_pair(3)  # (uk, ub, chi_l, chi_r)
        env.T[(coord, (0, 1))] = _normalized(t)

        A = state.site((coord[0] + 1, coord[1]))
        t = A.tensordot(A.conj(), ((0, 4), (0, 4)))  # (u,l,d, u',l',d')
        t = t.transpose((0, 3, 1, 4, 2, 5)).fuse_pair(0)  # (chi_u, l,l', d,d')
        t = t.fuse_pair(3)  # (chi_u, lk, lb, chi_d)
        env.T[(coord, (1, 0))] = _normalized(t)
    return env
