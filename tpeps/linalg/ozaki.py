"""Ozaki-scheme float64 matrix multiplication on the MXU.

TPUs have no native f64 MXU path: XLA lowers f64 ``dot_general`` to
software double-float arithmetic on the vector unit (measured ~0.2
TFLOP/s on the C4v CTMRG move — the bottleneck of every f64-accurate
phase, BENCH_r02).  The Ozaki splitting [Ozaki et al., Numer. Algorithms
59 (2012); the int8 variant popularized for GPU tensor cores] recovers
f64-class matmul from LOW-precision hardware matmuls with EXACT
accumulation:

1. scale rows of A (cols of B) by powers of two so entries are < 1,
2. slice each mantissa into ``s`` chunks of ``w`` bits — each chunk is
   an integer in [-(2^w), 2^w) held as int8 (w <= 7),
3. all pairwise chunk products are EXACT in the int8 x int8 -> int32
   MXU path (products < 2^{2w}, K-sums < 2^31 for K < 2^{31-2w}),
4. recombine the O(s^2) int32 partial products in f64 (elementwise,
   O(N^2) software-f64 work vs the O(N^3) it replaces).

Truncation of chunk pairs with p+q > s+1 bounds the relative error by
~ K * 2^{-s w}: w=7, s=8 gives ~2^{-56+log2 K} — f64-class for the
K ~ 10^4 contractions of a D=7 chi=147 CTMRG move — at the cost of
s(s+1)/2 = 36 int8 MXU passes, each ~6x cheaper than one
HIGHEST-precision f32 matmul pass group.

``ozaki_matmul`` is jit-compatible and differentiable (custom JVP: the
derivative of a matmul is a matmul — tangents run through the same
split path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _split_int8(X, s: int, w: int, axis: int):
    """Slice ``X`` (f64) into ``s`` int8 chunks of ``w`` bits along the
    mantissa, after per-row/col power-of-two scaling on ``axis``.

    Every f64 elementwise op here is software-emulated on the TPU
    vector unit, and the split — not the int8 MXU products — dominates
    ozaki_matmul wall-clock (measured 2026-08-20: 3.2 ms split vs
    <1 ms dots at the D=7 chi=147 move shape).  So the digit extraction
    runs in integer fixed point: pack ``28 // w * w`` mantissa bits at a
    time into an int32 word (one exact f64 multiply + one f64->int32
    truncation per word, i.e. 2 words for the default s=8, w=7 instead
    of 8 sequential f64 rounds), then pull the w-bit digits out with
    int32 shifts/masks at full vector-unit rate.

    :return: ``(chunks [s arrays int8], e exponents (f64 powers of 2))``
    """
    mx = jnp.max(jnp.abs(X), axis=axis, keepdims=True)
    mx = jnp.where(mx == 0.0, 1.0, mx)
    # power-of-two scale with |X * e_inv| < 1; multiply by the exact
    # reciprocal power instead of dividing (emulated-f64 division is
    # many times the cost of a multiply)
    ex = jnp.floor(jnp.log2(mx)) + 1.0
    e = jnp.exp2(ex)
    R = X * jnp.exp2(-ex)
    neg = R < 0.0
    P = jnp.abs(R)
    dpw = max(1, 28 // w)          # digits per int32 word
    wb = dpw * w                   # bits per word (< 31 keeps trunc exact)
    word_scale = float(2.0 ** wb)
    sgn = jnp.where(neg, jnp.int8(-1), jnp.int8(1))
    mask = (1 << w) - 1
    chunks = []
    rem = P
    while len(chunks) < s:
        y = rem * word_scale                 # exact power-of-two shift
        u = y.astype(jnp.int32)              # trunc; y in [0, 2^wb)
        rem = y - u.astype(jnp.float64)      # exact fractional tail
        for j in range(dpw):
            if len(chunks) == s:
                break
            d = (u >> (wb - (j + 1) * w)) & mask
            chunks.append(d.astype(jnp.int8) * sgn)
    return chunks, e


def _check_k(k, w):
    if k >= 1 << (31 - 2 * w):
        raise ValueError(
            f"contraction dim {k} overflows exact int32 "
            f"accumulation for word_bits={w}"
        )


def _accumulate(Ac, ea, Bc, eb, s: int, w: int):
    """int8 chunk products -> f64 result.

    Chunk-pair groups with ``total * w >= 42`` contribute < 2^-28
    relative to the result, so their int32->float conversion and
    scale-combine run in f32 (full vector-unit rate; added error
    ~2^-24 OF a <2^-28-relative term, i.e. < 2^-48 overall — inside
    the s=8 accuracy contract).  Only the leading groups pay the
    emulated-f64 elementwise tax.
    """
    dn = (((1,), (0,)), ((), ()))
    m, n = Ac[0].shape[0], Bc[0].shape[1]
    out = jnp.zeros((m, n), jnp.float64)
    tail32 = None
    t_tail = None
    # accumulate cheapest-first so the final adds land on the big terms
    for total in range(s + 1, 1, -1):
        acc32 = None
        for p in range(1, s + 1):
            q = total - p
            if q < 1 or q > s:
                continue
            prod = jax.lax.dot_general(Ac[p - 1], Bc[q - 1], dn,
                                       preferred_element_type=jnp.int32)
            acc32 = prod if acc32 is None else acc32 + prod
        if acc32 is None:
            continue
        if total * w >= 42:
            if t_tail is None:
                t_tail = total
                tail32 = acc32.astype(jnp.float32)
            else:
                tail32 = tail32 * float(2.0 ** ((total - t_prev) * w)) \
                    + acc32.astype(jnp.float32)
            t_prev = total
        else:
            out = out + acc32.astype(jnp.float64) * float(2.0 ** (-total * w))
    if tail32 is not None:
        out = out + tail32.astype(jnp.float64) * float(2.0 ** (-t_prev * w))
    return out * ea * eb


def ozaki_presplit(A, slices: int = 8, word_bits: int = 7):
    """Split a 2-D left operand once for reuse across many products
    (e.g. the factored-corner operator applied to several subspace
    iterates per CTMRG move — re-splitting the (chi D^2)^2 operand
    each application would dominate).  Returns ``(Ac, ea)`` to pass to
    :func:`ozaki_matmul_presplit`.  Forward-only: the chunk arrays are
    int8 and carry no tangents."""
    _check_k(A.shape[-1], word_bits)
    return _split_int8(A, slices, word_bits, axis=1)


def ozaki_matmul_presplit(Ac, ea, B, slices: int = 8, word_bits: int = 7):
    """``A @ B`` where A was pre-split by :func:`ozaki_presplit`."""
    Bc, eb = _split_int8(B, slices, word_bits, axis=0)
    return _accumulate(Ac, ea, Bc, eb, slices, word_bits)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def ozaki_matmul(A, B, slices: int = 8, word_bits: int = 7):
    """``A @ B`` for f64 matrices via exact int8 MXU products.

    :param A: ``(m, k)`` float64
    :param B: ``(k, n)`` float64
    :param slices: mantissa chunks per operand; relative error
        ~ ``K * 2**(-slices*word_bits)``
    :return: ``(m, n)`` float64
    """
    s, w = slices, word_bits
    _check_k(A.shape[-1], w)
    Ac, ea = _split_int8(A, s, w, axis=1)   # ea: (m, 1)
    Bc, eb = _split_int8(B, s, w, axis=0)   # eb: (1, n)
    return _accumulate(Ac, ea, Bc, eb, s, w)


def _ozaki_matmul_fwd(A, B, slices, word_bits):
    return ozaki_matmul(A, B, slices, word_bits), (A, B)


def _ozaki_matmul_bwd(slices, word_bits, res, dC):
    # the adjoint of a matmul is a matmul: run it through the same
    # exact-split path so gradients keep f64-class accuracy on the MXU
    A, B = res
    dA = ozaki_matmul(dC, B.T, slices, word_bits)
    dB = ozaki_matmul(A.T, dC, slices, word_bits)
    return dA, dB


ozaki_matmul.defvjp(_ozaki_matmul_fwd, _ozaki_matmul_bwd)


def ozaki_dot_general(a, b, dimension_numbers, slices: int = 8,
                      word_bits: int = 7):
    """f64 ``lax.dot_general`` via :func:`ozaki_matmul` — contracting and
    batch dims are collapsed to a single 2D matmul per batch element
    (batch handled by vmap over the leading collapsed axis)."""
    (ca, cb), (ba, bb) = dimension_numbers
    ca, cb, ba, bb = tuple(ca), tuple(cb), tuple(ba), tuple(bb)
    free_a = tuple(i for i in range(a.ndim) if i not in ca + ba)
    free_b = tuple(i for i in range(b.ndim) if i not in cb + bb)
    at = jnp.transpose(a, ba + free_a + ca)
    bt = jnp.transpose(b, bb + cb + free_b)
    bshape = tuple(a.shape[i] for i in ba)
    m = int(np.prod([a.shape[i] for i in free_a], dtype=np.int64) or 1)
    k = int(np.prod([a.shape[i] for i in ca], dtype=np.int64) or 1)
    n = int(np.prod([b.shape[i] for i in free_b], dtype=np.int64) or 1)
    if bshape:
        nb = int(np.prod(bshape, dtype=np.int64))
        a2 = at.reshape((nb, m, k))
        b2 = bt.reshape((nb, k, n))
        mm = jax.vmap(lambda x, y: ozaki_matmul(x, y, slices, word_bits))
        out = mm(a2, b2).reshape(bshape + tuple(a.shape[i] for i in free_a)
                                 + tuple(b.shape[i] for i in free_b))
    else:
        out = ozaki_matmul(at.reshape((m, k)), bt.reshape((k, n)),
                           slices, word_bits)
        out = out.reshape(tuple(a.shape[i] for i in free_a)
                          + tuple(b.shape[i] for i in free_b))
    return out
