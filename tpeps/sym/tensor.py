"""Abelian-symmetric block-sparse tensors.

The YASTN replacement (SURVEY.md §2.15: "the single largest new
component"): charge-conserving tensors whose non-zero blocks are dense
jnp arrays addressed by per-leg charge tuples.

Design for jit: the block structure (symmetry, signatures, per-leg
charge->dimension maps, total charge) is *static metadata*; the blocks
form a dict pytree with static keys — exactly the static-metadata /
dynamic-data split the reference engineers for torch checkpointing of
YASTN tensors (ctm/generic_abelian/ctmrg.py:130-211).  Any function of
AbelianTensors with fixed metadata traces once and jits.

Charge rule: a block with leg charges (q_1..q_r) is allowed iff
``sum_i s_i q_i == n`` (signatures s_i = +-1, total charge n), with
group addition (integers for U(1), mod-2 for Z2, tuples for products).

Supported symmetries: "U1", "Z2", "U1xU1".
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def _lib(b):
    """Array library of a block: numpy for the host backend, jnp for the
    traced/differentiable backend.

    The numpy backend exists because abelian CTMRG dispatches thousands
    of tiny (O(D) x O(D)) block ops per move from a host loop; each
    eager jnp op costs ~0.1-1 ms of dispatch + per-shape compile, which
    is 100-1000x the arithmetic (measured: one D=3 move 12-45 s on jnp
    vs <0.1 s on np).  The same backend split exists in the reference's
    YASTN dependency (backend_np / backend_torch, SURVEY.md §2.15).
    """
    return np if isinstance(b, np.ndarray) else jnp


def _np_dtype(dtype):
    return np.dtype(np.asarray(jnp.zeros(0, dtype)).dtype)


def _qadd(sym, *qs):
    if sym == "Z2":
        return sum(qs) % 2
    if sym == "U1xU1":
        return tuple(sum(x) for x in zip(*qs))
    return sum(qs)


def _qscale(sym, s, q):
    if sym == "Z2":
        return (s * q) % 2
    if sym == "U1xU1":
        return tuple(s * x for x in q)
    return s * q


def _parity(sym, q) -> int:
    """Fermionic parity of a charge: occupation number mod 2 (YASTN's
    rule for sym_U1/sym_Z2/sym_U1xU1 with ``fermionic=True``)."""
    if sym == "U1xU1":
        return (q[0] + q[1]) % 2
    return q % 2


def _perm_sign(parities, axes) -> float:
    """Grassmann sign of reordering a monomial ``theta_0..theta_{r-1}``
    (parities[i] in {0,1}) into the order given by ``axes``: (-1) per
    inversion among odd symbols."""
    odd = [a for a in axes if parities[a]]
    inv = 0
    for i in range(len(odd)):
        for j in range(i + 1, len(odd)):
            if odd[i] > odd[j]:
                inv += 1
    return -1.0 if inv % 2 else 1.0


@dataclass(frozen=True)
class LegCharges:
    """Charge sectors of one leg: mapping charge -> dimension.

    ``pshift`` offsets the fermionic grading of the leg: its parity is
    ``(charge-parity + pshift) mod 2``.  Needed for legs whose charge is
    shifted away from the particle number — e.g. the reference's
    half-filling physical legs, stored fused with a charge -1 dummy
    (test-input/abelian/CI_D3_1x1_U1_state.json ``hfs``): the dummy is a
    *bosonic* charge carrier, so the fused leg must be graded by the
    TRUE fermion parity p(q+1) = p(q)+1."""

    charges: tuple  # tuple of (charge, dim) pairs, charge-sorted
    pshift: int = 0

    @property
    def dims(self):
        return dict(self.charges)

    def total_dim(self):
        return sum(d for _, d in self.charges)

    def offset(self, q):
        off = 0
        for c, d in self.charges:
            if c == q:
                return off
            off += d
        raise KeyError(q)


def leg(charge_dims, pshift: int = 0) -> LegCharges:
    """Build a LegCharges from a {charge: dim} mapping."""
    items = sorted(charge_dims.items(), key=lambda x: (str(type(x[0])), x[0]))
    return LegCharges(tuple(items), pshift)


class AbelianTensor:
    """Block-sparse tensor with abelian charge conservation.

    With ``fermionic=True`` the tensor is Grassmann-graded: each block
    is the coefficient of an ordered monomial
    ``theta_0^{p(q_0)} ... theta_{r-1}^{p(q_{r-1})}`` (parity p = charge
    mod 2), signature +1 legs carry ``theta`` (ket), -1 legs
    ``theta-bar`` (dual).  ``transpose`` / ``tensordot`` / ``conj`` then
    insert the Grassmann reordering signs automatically, so **every
    network contraction written for the bosonic abelian stack computes
    the correct fermionic value unchanged** — no explicit swap-gate
    placement anywhere (the reference reaches fermions through YASTN's
    hand-placed ``swap_gate`` calls instead,
    ctm/generic_abelian/corrf_fermionic.py:29-227).  The network value
    is the Grassmann integral of the product of all tensors and is
    independent of pairwise-contraction order (validated against the
    brute-force integral in tests/test_fermionic.py).
    """

    def __init__(self, sym: str, signature, legs, n=0, blocks=None, dtype=jnp.float64,
                 fermionic: bool = False, conj_reversal: bool = False):
        self.sym = sym
        if sym == "U1xU1" and isinstance(n, int):
            assert n == 0
            n = (0, 0)
        self.signature = tuple(signature)
        self.legs = tuple(legs)
        self.n = n
        self.dtype = dtype
        self.fermionic = fermionic
        # conj_reversal: apply the Grassmann dagger-reversal block signs in
        # conj() even when the tensor is contracted bosonically — the
        # "planar-bosonic" evaluation mode of fermionic networks (see
        # groups/fermions.py): every closed fermionic network equals the
        # bosonic contraction of the same blocks PROVIDED the bra keeps
        # the graded conj's reversal signs (verified term-by-term on
        # tori and open patches in tests/test_fermionic.py).
        self.conj_reversal = conj_reversal
        self.blocks = dict(blocks) if blocks else {}

    def _parities(self, qs):
        return tuple(
            (_parity(self.sym, q) + l.pshift) % 2 for q, l in zip(qs, self.legs)
        )

    def leg_parity(self, i: int, q) -> int:
        return (_parity(self.sym, q) + self.legs[i].pshift) % 2

    # -------------------------------------------------------------- meta
    @property
    def ndim(self):
        return len(self.legs)

    def allowed(self, qs) -> bool:
        tot = _qadd(self.sym, *(_qscale(self.sym, s, q) for s, q in zip(self.signature, qs)))
        return tot == self.n

    def block_shape(self, qs):
        return tuple(l.dims[q] for l, q in zip(self.legs, qs))

    def all_allowed_blocks(self):
        for qs in itertools.product(*[[c for c, _ in l.charges] for l in self.legs]):
            if self.allowed(qs):
                yield qs

    # ------------------------------------------------------------ create
    @classmethod
    def zeros(cls, sym, signature, legs, n=0, dtype=jnp.float64, backend="jnp",
              fermionic=False):
        xp = np if backend == "np" else jnp
        t = cls(sym, signature, legs, n, dtype=dtype, fermionic=fermionic)
        for qs in t.all_allowed_blocks():
            t.blocks[qs] = xp.zeros(t.block_shape(qs), dtype=_np_dtype(dtype) if backend == "np" else dtype)
        return t

    @classmethod
    def random(cls, key, sym, signature, legs, n=0, dtype=jnp.float64, backend="jnp",
               fermionic=False):
        t = cls(sym, signature, legs, n, dtype=dtype, fermionic=fermionic)
        for qs in t.all_allowed_blocks():
            key, sub = jax.random.split(key)
            b = jax.random.uniform(
                sub, t.block_shape(qs), dtype=dtype, minval=-0.5, maxval=0.5
            )
            t.blocks[qs] = np.asarray(b) if backend == "np" else b
        return t

    def to_backend(self, backend: str):
        """Convert all blocks to the numpy ("np") or jnp ("jnp") backend."""
        conv = np.asarray if backend == "np" else jnp.asarray
        return self.copy_with({q: conv(b) for q, b in self.blocks.items()})

    def copy_with(self, blocks):
        return AbelianTensor(self.sym, self.signature, self.legs, self.n, blocks,
                             self.dtype, self.fermionic, self.conj_reversal)

    # --------------------------------------------------------------- ops
    def conj(self):
        """Complex conjugate; flips all signatures and the total charge.

        Fermionic: the dagger of an ordered Grassmann monomial reverses
        it, ``(theta_1..theta_k)^+ = theta-bar_k..theta-bar_1``; keeping
        the stored leg order therefore costs the reversal sign
        ``(-1)^{k(k-1)/2}`` per block (k = number of odd legs)."""
        blocks = {}
        for q, b in self.blocks.items():
            bc = _lib(b).conj(b)
            if self.fermionic or self.conj_reversal:
                k = sum(self._parities(q))
                if (k * (k - 1) // 2) % 2:
                    bc = -bc
            blocks[q] = bc
        return AbelianTensor(
            self.sym,
            tuple(-s for s in self.signature),
            self.legs,
            _qscale(self.sym, -1, self.n),
            blocks,
            self.dtype,
            self.fermionic,
            self.conj_reversal,
        )

    def conj_blocks(self):
        """Conjugate block values only (no signature/charge change) —
        yastn's ``conj_blocks``; ``conj() == flip_signature().conj_blocks()``."""
        return self.copy_with({q: _lib(b).conj(b) for q, b in self.blocks.items()})

    def flip_charges(self, axes):
        """Flip the signature of the listed legs AND negate their block
        charges (yastn's ``switch_signature``; total charge unchanged:
        the charge-rule terms ``s_i q_i = (-s_i)(-q_i)`` are invariant).

        An isomorphism whenever the affected leg tables are symmetric
        under ``q -> -q`` — used to normalize C4v abelian states stored
        with uniform signatures to the generic bond convention
        (reference ipeps/ipeps_abelian_c4v.py:178)."""
        axes = tuple(axes)

        def fq(i, q):
            return _qscale(self.sym, -1, q) if i in axes else q

        sig = tuple(-s if i in axes else s for i, s in enumerate(self.signature))
        legs = tuple(
            leg({_qscale(self.sym, -1, q): d for q, d in l.charges}, l.pshift)
            if i in axes else l
            for i, l in enumerate(self.legs)
        )
        blocks = {
            tuple(fq(i, q) for i, q in enumerate(qs)): b for qs, b in self.blocks.items()
        }
        return AbelianTensor(self.sym, sig, legs, self.n, blocks, self.dtype,
                             self.fermionic, self.conj_reversal)

    def charge_conjugate(self):
        """Negate all block charges and the total charge, keeping
        signatures (yastn's ``flip_signature().switch_signature('all')``,
        reference ipeps_abelian_c4v.py:199 — the Neel partner map)."""
        legs = tuple(
            leg({_qscale(self.sym, -1, q): d for q, d in l.charges}, l.pshift)
            for l in self.legs
        )
        blocks = {
            tuple(_qscale(self.sym, -1, q) for q in qs): b
            for qs, b in self.blocks.items()
        }
        return AbelianTensor(
            self.sym, self.signature, legs, _qscale(self.sym, -1, self.n), blocks,
            self.dtype, self.fermionic, self.conj_reversal
        )

    def transpose(self, axes):
        """Leg permutation; fermionic tensors pick up the Grassmann
        reordering sign per block."""
        axes = tuple(axes)
        blocks = {}
        for q, b in self.blocks.items():
            bt = b.transpose(axes)
            if self.fermionic:
                sgn = _perm_sign(self._parities(q), axes)
                if sgn < 0:
                    bt = -bt
            blocks[tuple(q[a] for a in axes)] = bt
        return AbelianTensor(
            self.sym,
            tuple(self.signature[a] for a in axes),
            tuple(self.legs[a] for a in axes),
            self.n,
            blocks,
            self.dtype,
            self.fermionic,
            self.conj_reversal,
        )

    def __add__(self, other):
        assert self.signature == other.signature and self.n == other.n
        out = {}
        for q in set(self.blocks) | set(other.blocks):
            a = self.blocks.get(q)
            b = other.blocks.get(q)
            out[q] = a + b if (a is not None and b is not None) else (a if a is not None else b)
        return self.copy_with(out)

    def __mul__(self, scalar):
        return self.copy_with({q: scalar * b for q, b in self.blocks.items()})

    __rmul__ = __mul__

    def norm(self):
        if not self.blocks:
            return jnp.asarray(0.0)
        xp = _lib(next(iter(self.blocks.values())))
        return xp.sqrt(sum(xp.sum(xp.abs(b) ** 2) for b in self.blocks.values()))

    def max_abs(self):
        xp = _lib(next(iter(self.blocks.values())))
        return max(xp.abs(b).max() for b in self.blocks.values())

    # --------------------------------------------------------- tensordot
    def tensordot(self, other, axes):
        """Charge-conserving tensordot.

        Contracted leg pairs must carry matching charge sectors with
        opposite effective signatures (as in YASTN); the result's total
        charge is the group sum.
        """
        ax_a, ax_b = axes
        ax_a, ax_b = tuple(ax_a), tuple(ax_b)
        for i, j in zip(ax_a, ax_b):
            # opposite signatures make the contracted charges cancel for
            # every sector, so the result has a uniform total charge;
            # same-sign contraction would yield an invalid tensor.  For
            # Z2, -1 == +1 mod 2, so the signature is immaterial.
            if self.sym != "Z2" and self.signature[i] != -other.signature[j]:
                raise ValueError(
                    f"contracted legs ({i},{j}) must carry opposite signatures, "
                    f"got {self.signature[i]} and {other.signature[j]}"
                )
            if (self.fermionic or other.fermionic) and \
                    self.legs[i].pshift != other.legs[j].pshift:
                raise ValueError(
                    f"contracted legs ({i},{j}) carry different parity shifts"
                )
            da, db = self.legs[i].dims, other.legs[j].dims
            for q in set(da) & set(db):
                if da[q] != db[q]:
                    raise ValueError(
                        f"charge-sector dim mismatch on contracted legs ({i},{j}), "
                        f"charge {q}: {da[q]} vs {db[q]}"
                    )
        keep_a = [i for i in range(self.ndim) if i not in ax_a]
        keep_b = [i for i in range(other.ndim) if i not in ax_b]

        fermionic = self.fermionic or other.fermionic
        if fermionic:
            # Grassmann contraction = graded-permute a's contracted legs
            # to the end (in ax_a order), b's to the front reversed, then
            # annihilate the now-adjacent (theta, theta-bar) pairs
            # innermost-first.  A pair annihilates sign-free when the
            # theta (sig +1) precedes its theta-bar; when a's side is the
            # dual the pair sits as (theta-bar, theta) and costs
            # (-1)^{p(q)}.  All three signs depend only on block charges.
            perm_a = tuple(keep_a) + ax_a
            perm_b = tuple(reversed(ax_b)) + tuple(keep_b)
            dual_a = tuple(
                i for i, j in zip(ax_a, ax_b)
                if (self.signature[i] if self.sym != "Z2" else -other.signature[j]) == -1
            )

        out_blocks = {}
        # group blocks of `other` by their contracted-leg charges
        b_by_con = {}
        for qb, blk in other.blocks.items():
            con = tuple(qb[i] for i in ax_b)
            b_by_con.setdefault(con, []).append((qb, blk))

        # collect the charge-matched block pairs first; execution strategy
        # is backend-dependent (see below)
        pairs = []  # (qout, block_a, block_b, sign)
        for qa, ba in self.blocks.items():
            con = tuple(qa[i] for i in ax_a)
            matches = b_by_con.get(con, [])
            if not matches:
                continue
            if fermionic:
                pa = self._parities(qa)
                sgn_a = _perm_sign(pa, perm_a)
                if any(pa[i] for i in dual_a):
                    k = sum(pa[i] for i in dual_a)
                    sgn_a *= -1.0 if k % 2 else 1.0
            for qb, bb in matches:
                qout = tuple(qa[i] for i in keep_a) + tuple(qb[i] for i in keep_b)
                sgn = 1.0
                if fermionic:
                    sgn = sgn_a * _perm_sign(other._parities(qb), perm_b)
                pairs.append((qout, ba, bb, sgn))

        batched = (
            len(pairs) > 8
            and _lib(pairs[0][1]) is jnp
            and _lib(pairs[0][2]) is jnp
        )
        if not batched:
            # host (numpy) backend, or few pairs: plain per-pair tensordots
            for qout, ba, bb, sgn in pairs:
                prod = _lib(ba).tensordot(ba, bb, (ax_a, ax_b))
                if sgn < 0:
                    prod = -prod
                if qout in out_blocks:
                    out_blocks[qout] = out_blocks[qout] + prod
                else:
                    out_blocks[qout] = prod
        else:
            # traced/jnp backend: signature-batched execution.  Group the
            # pairs by (shape_a, shape_b) and run each group as ONE
            # stacked dot_general (vmapped tensordot), accumulating
            # same-charge outputs with a segment-sum.  This keeps the
            # compiled program size O(distinct shape signatures) instead
            # of O(block pairs) — the difference between the D=8 chi=160
            # frozen abelian move compiling or exhausting the XLA
            # compiler (counterpart of the reference's device-resident
            # yastn torch backend, ctm/generic_abelian/ctmrg.py:159-165).
            groups = {}
            for idx, (qout, ba, bb, sgn) in enumerate(pairs):
                groups.setdefault((ba.shape, bb.shape), []).append(idx)
            bdot = jax.vmap(lambda x, y: jnp.tensordot(x, y, (ax_a, ax_b)))
            for idxs in groups.values():
                if len(idxs) == 1:
                    qout, ba, bb, sgn = pairs[idxs[0]]
                    prod = jnp.tensordot(ba, bb, (ax_a, ax_b))
                    if sgn < 0:
                        prod = -prod
                    if qout in out_blocks:
                        out_blocks[qout] = out_blocks[qout] + prod
                    else:
                        out_blocks[qout] = prod
                    continue
                A = jnp.stack([pairs[i][1] for i in idxs])
                B = jnp.stack([pairs[i][2] for i in idxs])
                prod = bdot(A, B)
                sgns = [pairs[i][3] for i in idxs]
                if fermionic and any(s < 0 for s in sgns):
                    sv = jnp.asarray(np.asarray(sgns), dtype=prod.dtype)
                    prod = prod * sv.reshape((-1,) + (1,) * (prod.ndim - 1))
                qouts = [pairs[i][0] for i in idxs]
                uniq = list(dict.fromkeys(qouts))
                if len(uniq) != len(qouts):
                    seg_ids = jnp.asarray([uniq.index(q) for q in qouts],
                                          dtype=jnp.int32)
                    prod = jax.ops.segment_sum(prod, seg_ids,
                                               num_segments=len(uniq))
                for i, q in enumerate(uniq):
                    if q in out_blocks:
                        out_blocks[q] = out_blocks[q] + prod[i]
                    else:
                        out_blocks[q] = prod[i]

        sig = tuple(self.signature[i] for i in keep_a) + tuple(other.signature[i] for i in keep_b)
        legs = tuple(self.legs[i] for i in keep_a) + tuple(other.legs[i] for i in keep_b)
        n = _qadd(self.sym, self.n, other.n)
        # dtype PROMOTES across operands (complex x real -> complex);
        # tracking only self.dtype would mislabel the result and later
        # cast complex blocks to real in dense assembly
        out_dtype = jnp.promote_types(self.dtype, other.dtype)
        return AbelianTensor(self.sym, sig, legs, n, out_blocks, out_dtype, fermionic,
                             self.conj_reversal or other.conj_reversal)

    # ------------------------------------------------------------ fusion
    def fuse_pair(self, i: int):
        """Fuse adjacent legs ``(i, i+1)`` into one leg.

        The fused leg keeps the signature of leg ``i`` (YASTN's hard-
        fusion convention): its sector charge ``qf`` satisfies
        ``s_i*qf = s_i*q1 + s_{i+1}*q2``.  Within a fused sector the
        constituent pairs are ordered by sorted ``(q1, q2)`` and laid
        out row-major (q1 major) — two legs fused from signature pairs
        ``(s1,s2)`` and ``(-s1,-s2)`` with the same sector content are
        contractible with each other (same sectors, same internal order).

        Used by the abelian CTM to fuse double-layer (ket, bra) pairs
        into environment chi legs (reference fuses via yastn,
        ctm/generic_abelian/env_abelian.py:317-470).
        """
        s1, s2 = self.signature[i], self.signature[i + 1]
        sf = s1
        l1, l2 = self.legs[i], self.legs[i + 1]

        # fused sector table: qf -> ordered [(q1, q2, d1, d2, offset)]
        pairs = sorted(
            (q1, q2)
            for q1 in l1.dims
            for q2 in l2.dims
        )
        sec = {}
        for q1, q2 in pairs:
            qf = _qscale(
                self.sym, sf,
                _qadd(self.sym, _qscale(self.sym, s1, q1), _qscale(self.sym, s2, q2)),
            )
            d1, d2 = l1.dims[q1], l2.dims[q2]
            lst = sec.setdefault(qf, [])
            off = sum(e[2] * e[3] for e in lst)
            lst.append((q1, q2, d1, d2, off))
        fused_leg = leg({qf: sum(e[2] * e[3] for e in lst) for qf, lst in sec.items()},
                    (l1.pshift + l2.pshift) % 2)
        offset_of = {
            (qf, q1, q2): off for qf, lst in sec.items() for q1, q2, _, _, off in lst
        }

        out_blocks = {}
        for qs, b in self.blocks.items():
            q1, q2 = qs[i], qs[i + 1]
            qf = _qscale(
                self.sym, sf,
                _qadd(self.sym, _qscale(self.sym, s1, q1), _qscale(self.sym, s2, q2)),
            )
            qout = qs[:i] + (qf,) + qs[i + 2 :]
            sh = b.shape
            bm = b.reshape(sh[:i] + (sh[i] * sh[i + 1],) + sh[i + 2 :])
            full_shape = (
                sh[:i] + (fused_leg.dims[qf],) + sh[i + 2 :]
            )
            off = offset_of[(qf, q1, q2)]
            sl = (
                (slice(None),) * i
                + (slice(off, off + sh[i] * sh[i + 1]),)
                + (slice(None),) * (self.ndim - i - 2)
            )
            dst = out_blocks.get(qout)
            if isinstance(bm, np.ndarray):
                if dst is None:
                    dst = np.zeros(full_shape, dtype=bm.dtype)
                    out_blocks[qout] = dst
                dst[sl] += bm
            else:
                if dst is None:
                    dst = jnp.zeros(full_shape, dtype=self.dtype)
                out_blocks[qout] = dst.at[sl].add(bm)

        sig = self.signature[:i] + (sf,) + self.signature[i + 2 :]
        legs_out = self.legs[:i] + (fused_leg,) + self.legs[i + 2 :]
        return AbelianTensor(self.sym, sig, legs_out, self.n, out_blocks, self.dtype,
                             self.fermionic, self.conj_reversal)

    # ---------------------------------------------------------- aux legs
    def add_leg(self, axis: int = -1, s: int = -1, q=None, pshift: int = 0):
        """Insert a dim-1 leg carrying charge ``q`` at ``axis`` such that
        the total charge becomes group-neutral (yastn's ``add_leg``).

        Used to make odd fermionic operators (c, c+) parity-even by
        attaching an explicit string leg; contracting the string legs of
        an operator pair reproduces the ordered product with the correct
        anticommutation signs through the graded tensordot.
        """
        if axis < 0:
            axis = self.ndim + 1 + axis
        if q is None:
            # leg absorbs the total charge: n_new = n + s*q = 0  =>  q = -s*n
            q = _qscale(self.sym, -s, self.n)
        n_new = _qadd(self.sym, self.n, _qscale(self.sym, s, q))
        blocks = {}
        for qs, b in self.blocks.items():
            sh = b.shape
            blocks[qs[:axis] + (q,) + qs[axis:]] = b.reshape(sh[:axis] + (1,) + sh[axis:])
        sig = self.signature[:axis] + (s,) + self.signature[axis:]
        legs = self.legs[:axis] + (leg({q: 1}, pshift),) + self.legs[axis:]
        # Grassmann note: inserting a dim-1 leg at `axis` places its
        # theta at that position in every block monomial with NO sign —
        # callers account for ordering via subsequent graded transposes.
        return AbelianTensor(self.sym, sig, legs, n_new, blocks, self.dtype,
                             self.fermionic, self.conj_reversal)

    def trace_scalar(self):
        """Full graded trace of a rank-2k tensor paired as
        (0,k),(1,k+1),...: contract with itself via an identity — here
        simply tensordot with a charge-matched identity chain is
        overkill; for the common rank-2 case return sum_q tr(B_q) with
        the graded cap sign."""
        assert self.ndim == 2
        tot = None
        for (q0, q1), b in self.blocks.items():
            xp = _lib(b)
            v = xp.trace(b)
            if self.fermionic and _parity(self.sym, q0):
                # monomial theta theta-bar (sig (+1,-1)): cap sign-free;
                # (theta-bar, theta) order costs (-1)^p
                if self.signature[0] == -1:
                    v = -v
            tot = v if tot is None else tot + v
        return tot

    # ------------------------------------------------------------- dense
    def to_dense(self):
        """Embed into a dense array (charge sectors ordered per leg).

        Backend-aware: numpy blocks assemble on the host; jnp blocks
        (including tracers — this method is jit/AD-traceable) assemble
        via functional index updates, so traced observable paths that
        end in a small dense rho (e.g. the abelian RDMs) differentiate
        through block values."""
        shape = tuple(l.total_dim() for l in self.legs)
        if all(isinstance(b, np.ndarray) for b in self.blocks.values()):
            out_dtype = (np.result_type(*(b.dtype for b in self.blocks.values()))
                         if self.blocks else _np_dtype(self.dtype))
            out = np.zeros(shape, dtype=out_dtype)
            for qs, b in self.blocks.items():
                sl = tuple(
                    slice(l.offset(q), l.offset(q) + l.dims[q])
                    for l, q in zip(self.legs, qs)
                )
                out[sl] = b
            return jnp.asarray(out)
        out = jnp.zeros(shape, dtype=self.dtype)
        for qs, b in self.blocks.items():
            sl = tuple(
                slice(l.offset(q), l.offset(q) + l.dims[q]) for l, q in zip(self.legs, qs)
            )
            out = out.at[sl].set(b)
        return out

    @classmethod
    def from_dense(cls, dense, sym, signature, legs, n=0):
        """Project a dense array onto the allowed charge blocks."""
        t = cls(sym, signature, legs, n, dtype=dense.dtype)
        dense = np.asarray(dense)
        for qs in t.all_allowed_blocks():
            sl = tuple(
                slice(l.offset(q), l.offset(q) + l.dims[q]) for l, q in zip(t.legs, qs)
            )
            blk = dense[sl]
            if np.any(blk != 0):
                t.blocks[qs] = jnp.asarray(blk)
        return t


def _sector_matrices(t: AbelianTensor, row_axes, col_axes):
    """Assemble dense per-charge-sector matrices of a tensor viewed over
    (row_axes | col_axes).  Shared by the blockwise SVD/eigh."""
    row_axes, col_axes = tuple(row_axes), tuple(col_axes)
    tp = t.transpose(row_axes + col_axes)
    nrow = len(row_axes)

    sectors = {}
    for qs, b in tp.blocks.items():
        qrow = tuple(qs[:nrow])
        qsec = _qadd(
            t.sym, *(_qscale(t.sym, s, q) for s, q in zip(tp.signature[:nrow], qrow))
        ) if nrow > 1 else _qscale(t.sym, tp.signature[0], qs[0])
        sectors.setdefault(qsec, []).append((qs, b))

    out = {}
    for qsec, items in sectors.items():
        row_keys = sorted(set(tuple(qs[:nrow]) for qs, _ in items))
        col_keys = sorted(set(tuple(qs[nrow:]) for qs, _ in items))
        row_dims = {rk: int(np.prod([tp.legs[i].dims[rk[i]] for i in range(nrow)])) for rk in row_keys}
        col_dims = {ck: int(np.prod([tp.legs[nrow + i].dims[ck[i]] for i in range(len(ck))])) for ck in col_keys}
        row_off, off = {}, 0
        for rk in row_keys:
            row_off[rk] = off
            off += row_dims[rk]
        col_off, offc = {}, 0
        for ck in col_keys:
            col_off[ck] = offc
            offc += col_dims[ck]
        host = all(isinstance(b, np.ndarray) for _, b in items)
        if host:
            # derive from the actual blocks: the declared dtype can lag
            # behind a promotion (guarded also in tensordot)
            m_dtype = np.result_type(*(np.asarray(b).dtype for _, b in items))
            M = np.zeros((off, offc), dtype=m_dtype)
            for qs, b in items:
                rk, ck = tuple(qs[:nrow]), tuple(qs[nrow:])
                M[
                    row_off[rk] : row_off[rk] + row_dims[rk],
                    col_off[ck] : col_off[ck] + col_dims[ck],
                ] = b.reshape(row_dims[rk], col_dims[ck])
        else:
            M = jnp.zeros((off, offc), dtype=tp.dtype)
            for qs, b in items:
                rk, ck = tuple(qs[:nrow]), tuple(qs[nrow:])
                M = M.at[
                    row_off[rk] : row_off[rk] + row_dims[rk],
                    col_off[ck] : col_off[ck] + col_dims[ck],
                ].set(b.reshape(row_dims[rk], col_dims[ck]))
        out[qsec] = (row_keys, col_keys, row_dims, col_dims, row_off, col_off, M)
    return tp, nrow, out


def _global_cut(all_vals, chi, reltol, eps_multiplet):
    """Global cross-sector truncation by magnitude with reltol filter and
    multiplet-safe boundary retreat.  ``all_vals``: [(|v|, qsec, i)]."""
    all_vals.sort(key=lambda x: -x[0])
    vmax = all_vals[0][0] if all_vals else 0.0
    if reltol > 0.0:
        all_vals = [e for e in all_vals if e[0] > reltol * vmax]
    if chi is not None and len(all_vals) > chi:
        cut = chi
        if eps_multiplet > 0.0:
            while cut > 1 and abs(all_vals[cut - 1][0] - all_vals[cut][0]) < eps_multiplet * vmax:
                cut -= 1
        all_vals = all_vals[:cut]
    keep = {}
    for _, qsec, i in all_vals:
        keep.setdefault(qsec, []).append(i)
    return keep


def eigh_blockwise(t: AbelianTensor, row_axes, col_axes, chi=None,
                   reltol: float = 0.0, eps_multiplet: float = 0.0):
    """Truncated spectral decomposition of a *hermitian* AbelianTensor
    viewed over (row_axes | col_axes), kept by |eigenvalue| with a global
    cross-sector cut (the C4v corner decomposition).

    Charge conservation pairs row sector ``q`` with column sector
    ``-q``; hermiticity then makes the (q, -q) block the adjoint of the
    (-q, q) block, so the decomposition needs one eigh for the
    self-paired sector and ONE svd per +-q pair (the partner sector's
    isometry is the right-singular basis of the same block, and both
    sectors keep identical counts — exactly the +- degeneracy structure
    of a C4v corner).  ~2-4x cheaper than blockwise SVD of every sector.

    :return: ``(U, W_dict)`` — isometry with a new last leg and kept
        value magnitudes (signed for the self-paired sector).
    """
    tp, nrow, sector_mats = _sector_matrices(t, row_axes, col_axes)

    all_vals = []
    sector_data = {}
    done = set()
    for qsec in sector_mats:
        if qsec in done:
            continue
        row_keys, _ck, row_dims, _cd, row_off, _co, M = sector_mats[qsec]
        xp = np if isinstance(M, np.ndarray) else jnp
        qneg = _qscale(t.sym, -1, qsec)
        if qneg == qsec:
            assert M.shape[0] == M.shape[1]
            H = 0.5 * (M + M.conj().T)
            W, U = xp.linalg.eigh(H)
            order = np.argsort(-np.abs(np.asarray(W)))
            W, U = W[np.asarray(order)], U[:, np.asarray(order)]
            sector_data[qsec] = (row_keys, row_dims, row_off, W, U)
            all_vals.extend(
                [(abs(float(w)), qsec, i) for i, w in enumerate(np.asarray(W))]
            )
            done.add(qsec)
        else:
            U, S, Vh = xp.linalg.svd(M, full_matrices=False)
            sector_data[qsec] = (row_keys, row_dims, row_off, S, U)
            all_vals.extend([(float(x), qsec, i) for i, x in enumerate(np.asarray(S))])
            done.add(qsec)
            if qneg in sector_mats:
                # hermitian partner: B_{-q} = B_q^dagger, left vectors = V
                rk2, _c2, rd2, _cd2, ro2, _co2, M2 = sector_mats[qneg]
                V = Vh.conj().T
                sector_data[qneg] = (rk2, rd2, ro2, S, V)
                all_vals.extend(
                    [(float(x), qneg, i) for i, x in enumerate(np.asarray(S))]
                )
                done.add(qneg)

    keep = _global_cut(all_vals, chi, reltol, eps_multiplet)

    U_blocks, W_out = {}, {}
    new_leg_dims = {}
    for qsec, idxs in keep.items():
        row_keys, row_dims, row_off, W, U = sector_data[qsec]
        idxs = sorted(idxs)
        ii = np.asarray(idxs)
        k = len(idxs)
        new_leg_dims[qsec] = k
        W_out[qsec] = W[ii]
        Usec = U[:, ii]
        for rk in row_keys:
            blk = Usec[row_off[rk] : row_off[rk] + row_dims[rk], :]
            shape = tuple(tp.legs[i].dims[rk[i]] for i in range(nrow)) + (k,)
            U_blocks[rk + (qsec,)] = blk.reshape(shape)

    rows_pshift = sum(l.pshift for l in tp.legs[:nrow]) % 2
    new_leg = leg(new_leg_dims, rows_pshift)
    U_t = AbelianTensor(
        t.sym, tp.signature[:nrow] + (-1,), tp.legs[:nrow] + (new_leg,), 0,
        U_blocks, t.dtype, t.fermionic,
    )
    return U_t, W_out


def svd_blockwise(t: AbelianTensor, row_axes, col_axes, chi=None,
                  reltol: float = 0.0, eps_multiplet: float = 0.0):
    """Truncated SVD of an AbelianTensor viewed as a matrix over
    (row_axes | col_axes), preserving charges.

    Per charge-sector SVD + a global cut across sectors by singular
    value (the reference's abelian projector construction,
    ctm/generic_abelian/ctm_projectors.py:159-294).

    :param reltol: drop singular values below ``reltol * s_max``
        (reference ``projector_svd_reltol``).
    :param eps_multiplet: multiplet-safe cut — if the last kept and the
        first dropped value differ by less than ``eps_multiplet * s_max``
        the cut would split a degenerate multiplet; walk the cut back
        until it falls in a gap (reference ``_keep_multiplets``,
        linalg/custom_svd.py:8, applied as drop-the-split-tail so the
        result never exceeds ``chi``).
    :return: ``(U, S_dict, V)`` where U/V are AbelianTensors with a new
        internal leg and ``S_dict`` maps sector charge -> kept singular
        values.
    """
    tp, nrow, sector_mats = _sector_matrices(t, row_axes, col_axes)

    all_svals = []
    sector_data = {}
    for qsec, (row_keys, col_keys, row_dims, col_dims, row_off, col_off, M) in sector_mats.items():
        xp = np if isinstance(M, np.ndarray) else jnp
        U, S, Vh = xp.linalg.svd(M, full_matrices=False)
        sector_data[qsec] = (row_keys, col_keys, row_dims, col_dims, row_off, col_off, U, S, Vh)
        all_svals.extend([(float(s), qsec, i) for i, s in enumerate(np.asarray(S))])

    keep = _global_cut(all_svals, chi, reltol, eps_multiplet)

    U_blocks, V_blocks, S_out = {}, {}, {}
    new_leg_dims_U = {}
    for qsec, idxs in keep.items():
        idxs = sorted(idxs)
        row_keys, col_keys, row_dims, col_dims, row_off, col_off, U, S, Vh = sector_data[qsec]
        k = len(idxs)
        new_leg_dims_U[qsec] = k
        ii = np.asarray(idxs)
        S_out[qsec] = S[ii]
        Usec = U[:, ii]
        Vsec = Vh[ii, :]
        for rk in row_keys:
            blk = Usec[row_off[rk] : row_off[rk] + row_dims[rk], :]
            shape = tuple(tp.legs[i].dims[rk[i]] for i in range(nrow)) + (k,)
            U_blocks[rk + (qsec,)] = blk.reshape(shape)
        for ck in col_keys:
            blk = Vsec[:, col_off[ck] : col_off[ck] + col_dims[ck]]
            shape = (k,) + tuple(tp.legs[nrow + i].dims[ck[i]] for i in range(len(ck)))
            V_blocks[(qsec,) + ck] = blk.reshape(shape)

    rows_pshift = sum(l.pshift for l in tp.legs[:nrow]) % 2
    if t.fermionic:
        # graded reconstruction tensordot(U*S, V, ((-1,), (0,))) sees U's
        # internal leg on the dual (-1) side and costs (-1)^{p(qsec)};
        # absorb the compensating sign into V so U.S.V == T under the
        # graded contraction (validated in tests/test_fermionic.py).
        V_blocks = {
            q: (-b if (_parity(t.sym, q[0]) + rows_pshift) % 2 else b)
            for q, b in V_blocks.items()
        }

    new_leg = leg(new_leg_dims_U, rows_pshift)
    # U carries the original row legs + new leg with signature -1 carrying qsec
    U_t = AbelianTensor(
        t.sym, tp.signature[:nrow] + (-1,), tp.legs[:nrow] + (new_leg,), 0,
        U_blocks, t.dtype, t.fermionic,
    )
    V_t = AbelianTensor(
        t.sym, (1,) + tp.signature[nrow:], (new_leg,) + tp.legs[nrow:], t.n,
        V_blocks, t.dtype, t.fermionic,
    )
    return U_t, S_out, V_t


# ---------------------------------------------------------------------------
# JAX pytree registration
# ---------------------------------------------------------------------------


def _at_flatten(t: AbelianTensor):
    keys = tuple(sorted(t.blocks.keys()))
    children = tuple(t.blocks[k] for k in keys)
    aux = (t.sym, t.signature, t.legs, t.n, keys, t.dtype, t.fermionic,
           t.conj_reversal)
    return children, aux


def _at_unflatten(aux, children):
    sym, signature, legs, n, keys, dtype, fermionic, conj_reversal = aux
    t = AbelianTensor(sym, signature, legs, n, dtype=dtype, fermionic=fermionic,
                      conj_reversal=conj_reversal)
    t.blocks = dict(zip(keys, children))
    return t


jax.tree_util.register_pytree_node(AbelianTensor, _at_flatten, _at_unflatten)
"""AbelianTensor is a pytree: blocks (sorted by charge key) are the
dynamic leaves; symmetry/signature/legs/charge/block-key metadata is
static aux data.  This is the static-metadata / dynamic-data split the
reference engineers by hand for torch checkpointing of YASTN tensors
(ctm/generic_abelian/ctmrg.py:130-211) — here it makes AbelianTensors
(and containers of them) directly valid arguments of jax.jit /
jax.grad / lax.while_loop, which is what puts the whole abelian CTMRG
move on the TPU as ONE compiled program (tpeps/ctm/c4v_abelian/frozen.py)."""
