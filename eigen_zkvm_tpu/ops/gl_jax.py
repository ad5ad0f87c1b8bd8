"""Goldilocks field arithmetic in JAX on uint32 limb pairs — the TPU path.

TPUs have no native 64-bit integers, so a field element is a pair of uint32
arrays (lo, hi).  Multiplication decomposes 32x32 -> 64 products into 16-bit
halves (u16*u16 fits u32 exactly) and reduces 128-bit results with
2^64 = 2^32 - 1 (mod p), 2^96 = -1 (mod p) — the same reduction as the numpy
engine (fields/gl64.py); both paths are differential-tested bit-exact.

Everything here is pure jnp: it vectorizes on the VPU under jit, shards with
shard_map, and is the building block for the Pallas kernels.
(reference counterpart: fields/src/field_gl.rs + the AVX2/AVX512 packed
implementations in fields/src/arch/x86_64/.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

P_INT = 0xFFFFFFFF00000001
# numpy scalars (not jnp): usable both under jit and inside Pallas kernel
# bodies, where captured traced constants are rejected
P_LO = np.uint32(0x00000001)
P_HI = np.uint32(0xFFFFFFFF)
U16 = np.uint32(16)
MASK16 = np.uint32(0xFFFF)

GL = tuple  # (lo: u32 array, hi: u32 array)


def from_u64(x: np.ndarray) -> GL:
    x = np.asarray(x, dtype=np.uint64)
    return (jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((x >> np.uint64(32)).astype(np.uint32)))


def to_u64(a: GL) -> np.ndarray:
    lo = np.asarray(a[0]).astype(np.uint64)
    hi = np.asarray(a[1]).astype(np.uint64)
    return lo | (hi << np.uint64(32))


def zeros(shape) -> GL:
    return (jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32))


def ones(shape) -> GL:
    return (jnp.ones(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32))


def full(shape, value: int) -> GL:
    return (jnp.full(shape, value & 0xFFFFFFFF, jnp.uint32),
            jnp.full(shape, value >> 32, jnp.uint32))


def _add64(alo, ahi, blo, bhi):
    """64-bit add on u32 pairs -> (lo, hi, carry_out)."""
    lo = alo + blo
    c = (lo < alo).astype(jnp.uint32)
    hi = ahi + bhi
    c2 = (hi < ahi).astype(jnp.uint32)
    hi2 = hi + c
    c3 = (hi2 < hi).astype(jnp.uint32)
    return lo, hi2, c2 + c3


def _sub64(alo, ahi, blo, bhi):
    """64-bit subtract -> (lo, hi, borrow_out)."""
    lo = alo - blo
    b1 = (alo < blo).astype(jnp.uint32)
    hi = ahi - bhi
    b2 = (ahi < bhi).astype(jnp.uint32)
    hi2 = hi - b1
    b3 = (hi < b1).astype(jnp.uint32)
    return lo, hi2, b2 + b3


def _geq_p(lo, hi):
    return (hi == P_HI) & (lo >= P_LO) | (hi > P_HI)


def _canon(lo, hi):
    """Subtract p once if >= p (inputs < 2p)."""
    ge = _geq_p(lo, hi)
    slo, shi, _ = _sub64(lo, hi, P_LO, P_HI)
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


def add(a: GL, b: GL) -> GL:
    lo, hi, c = _add64(a[0], a[1], b[0], b[1])
    # carry means value >= 2^64: add 2^32-1 (mod-p wrap)
    lo2 = lo + jnp.where(c > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    hi2 = hi + (lo2 < lo).astype(jnp.uint32)
    return _canon(lo2, hi2)


def sub(a: GL, b: GL) -> GL:
    lo, hi, brw = _sub64(a[0], a[1], b[0], b[1])
    # borrow: subtract 2^32-1 (i.e. add p mod 2^64)
    lo2 = lo - jnp.where(brw > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    hi2 = hi - (lo < jnp.where(brw > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))).astype(jnp.uint32)
    return lo2, hi2


def neg(a: GL) -> GL:
    is_zero = (a[0] == 0) & (a[1] == 0)
    lo, hi, _ = _sub64(P_LO, P_HI, a[0], a[1])
    return jnp.where(is_zero, jnp.uint32(0), lo), jnp.where(is_zero, jnp.uint32(0), hi)


def _mul32x32(a, b):
    """u32 * u32 -> (lo32, hi32) via 16-bit halves."""
    a0 = a & MASK16
    a1 = a >> U16
    b0 = b & MASK16
    b1 = b >> U16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl
    mid_c = (mid < lh).astype(jnp.uint32) << U16
    lo = ll + (mid << U16)
    lo_c = (lo < ll).astype(jnp.uint32)
    hi = hh + (mid >> U16) + mid_c + lo_c
    return lo, hi


def _mul_wide(a: GL, b: GL):
    """Full 128-bit product -> four u32 limbs (w0..w3, little-endian)."""
    ll_lo, ll_hi = _mul32x32(a[0], b[0])
    lh_lo, lh_hi = _mul32x32(a[0], b[1])
    hl_lo, hl_hi = _mul32x32(a[1], b[0])
    hh_lo, hh_hi = _mul32x32(a[1], b[1])

    w0 = ll_lo
    # w1 = ll_hi + lh_lo + hl_lo (collect carries into w2)
    s1 = ll_hi + lh_lo
    c1 = (s1 < ll_hi).astype(jnp.uint32)
    w1 = s1 + hl_lo
    c1 = c1 + (w1 < s1).astype(jnp.uint32)
    # w2 = lh_hi + hl_hi + hh_lo + c1
    s2 = lh_hi + hl_hi
    c2 = (s2 < lh_hi).astype(jnp.uint32)
    s2b = s2 + hh_lo
    c2 = c2 + (s2b < s2).astype(jnp.uint32)
    w2 = s2b + c1
    c2 = c2 + (w2 < s2b).astype(jnp.uint32)
    w3 = hh_hi + c2
    return w0, w1, w2, w3


def _reduce128(w0, w1, w2, w3) -> GL:
    """(w3,w2,w1,w0) mod p:  n = lo64 + hi_lo*2^64 + hi_hi*2^96,
    2^64 = 2^32-1, 2^96 = -1."""
    # t = lo64 - hi_hi  (borrow -> subtract 2^32-1)
    t_lo, t_hi, brw = _sub64(w0, w1, w3, jnp.uint32(0))
    eps = jnp.where(brw > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    t_lo2 = t_lo - eps
    t_hi2 = t_hi - (t_lo < eps).astype(jnp.uint32)
    # t1 = hi_lo * (2^32 - 1) = (hi_lo << 32) - hi_lo
    t1_lo = jnp.uint32(0) - w2
    t1_hi = w2 - (w2 != 0).astype(jnp.uint32)
    # r = t + t1, overflow -> add 2^32-1
    r_lo, r_hi, c = _add64(t_lo2, t_hi2, t1_lo, t1_hi)
    add_eps = jnp.where(c > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    r_lo2 = r_lo + add_eps
    r_hi2 = r_hi + (r_lo2 < r_lo).astype(jnp.uint32)
    return _canon(r_lo2, r_hi2)


def mul(a: GL, b: GL) -> GL:
    return _reduce128(*_mul_wide(a, b))


def square(a: GL) -> GL:
    return mul(a, a)


def pow7(a: GL) -> GL:
    a2 = mul(a, a)
    a3 = mul(a2, a)
    a6 = mul(a3, a3)
    return mul(a6, a)


def exp_const(a: GL, e: int) -> GL:
    """a ** e for a Python-int exponent.

    Short exponents unroll at trace time; long ones (the Fermat inverse)
    become a fori_loop over the exponent's bits — XLA:CPU compile time is
    superlinear in straight-line graph depth, so a 4000-op unrolled mul
    chain is far slower to build than a 64-iteration loop of one mul+square.
    """
    if e == 0:
        return ones(a[0].shape)
    if e.bit_count() + e.bit_length() <= 16:  # small: unroll
        result = ones(a[0].shape)
        base = a
        while e > 0:
            if e & 1:
                result = mul(result, base)
            base = mul(base, base)
            e >>= 1
        return result
    nbits = e.bit_length()
    bits = jnp.asarray(np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32))

    def body(i, carry):
        result, base = carry
        m = mul(result, base)
        take = bits[i] == 1
        result = select(take, m, result)
        base = mul(base, base)
        return result, base

    result, _ = jax.lax.fori_loop(0, nbits, body, (ones(a[0].shape), a))
    return result


def inv(a: GL) -> GL:
    return exp_const(a, P_INT - 2)


def select(mask, a: GL, b: GL) -> GL:
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


def scalar(value: int) -> GL:
    return (jnp.uint32(value & 0xFFFFFFFF), jnp.uint32(value >> 32))
