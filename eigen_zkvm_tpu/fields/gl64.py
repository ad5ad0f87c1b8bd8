"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1 — vectorized numpy reference path.

This is the host/verifier-side scalar engine of the framework: every op works
elementwise on np.uint64 arrays of any shape (canonical representation, no
Montgomery form).  The TPU path (eigen_zkvm_tpu.ops.gl_jax) mirrors these
semantics on uint32 limb pairs; both are differential-tested against each
other and against the reference implementation's unit-test vectors
(reference: fields/src/field_gl.rs, fields/src/field_gl_test.rs).

Reduction trick: 2^64 = 2^32 - 1 (mod p) and 2^96 = -1 (mod p).
"""
from __future__ import annotations

import numpy as np

P = np.uint64(0xFFFFFFFF00000001)
P_INT = 0xFFFFFFFF00000001
EPSILON = np.uint64(0xFFFFFFFF)  # 2^32 - 1 = 2^64 mod p
MASK32 = np.uint64(0xFFFFFFFF)
U32 = np.uint64(32)

# Two-adic structure: 7 is the generator of the multiplicative group;
# w_32 = 7^((p-1)/2^32) generates the 2^32 torsion (reference: constant.rs MG).
GENERATOR = 7
TWO_ADICITY = 32
SHIFT = 49  # coset shift for the LDE domain (reference: constant.rs SHIFT)

# numpy array integer ops wrap silently (mod 2^64); that is exactly what we want.
np.seterr(over="ignore")

_native_checked = False
_nv = None


def _native():
    """The C++ vector kernel (native/gl_vec.cpp), or None."""
    global _native_checked, _nv
    if not _native_checked:
        from .. import native as _n

        _nv = _n.gl_vec
        _native_checked = True
    return _nv


def asfield(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint64)


def add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a + b) mod p for canonical a, b < p."""
    nv = _native()
    if nv is not None:
        r = nv.try_add(a, b)
        if r is not None:
            return r
    s = a + b
    over = s < a
    s = np.where(over, s + EPSILON, s)
    s = np.where(s >= P, s - P, s)
    return s


def sub(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # Borrow path: (a-b) mod 2^64 = a-b+2^64 > 2^32-1 for canonical a,b, so
    # the EPSILON correction never underflows and lands in (0, p).
    nv = _native()
    if nv is not None:
        r = nv.try_sub(a, b)
        if r is not None:
            return r
    d = a - b
    borrow = a < b
    d = np.where(borrow, d - EPSILON, d)
    return d


def neg(a: np.ndarray) -> np.ndarray:
    nv = _native()
    if nv is not None:
        r = nv.try_neg(a)
        if r is not None:
            return r
    return np.where(a == 0, np.uint64(0), P - a)


def _mul_wide(a: np.ndarray, b: np.ndarray):
    """Full 128-bit product of two u64 arrays -> (hi, lo) u64 arrays."""
    a_lo = a & MASK32
    a_hi = a >> U32
    b_lo = b & MASK32
    b_hi = b >> U32
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    # mid = lh + hl (can carry)
    mid = lh + hl
    mid_carry = (mid < lh).astype(np.uint64) << U32
    lo = ll + (mid << U32)
    lo_carry = (lo < ll).astype(np.uint64)
    hi = hh + (mid >> U32) + mid_carry + lo_carry
    return hi, lo


def _reduce128(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Reduce hi*2^64 + lo mod p."""
    hi_hi = hi >> U32  # * 2^96 = -1
    hi_lo = hi & MASK32  # * 2^64 = 2^32 - 1
    t0 = lo - hi_hi
    borrow = lo < hi_hi
    t0 = np.where(borrow, t0 - EPSILON, t0)
    t1 = hi_lo * EPSILON  # < 2^64, exact
    r = t0 + t1
    over = r < t1
    r = np.where(over, r + EPSILON, r)
    r = np.where(r >= P, r - P, r)
    return r


def mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    nv = _native()
    if nv is not None:
        r = nv.try_mul(a, b)
        if r is not None:
            return r
    hi, lo = _mul_wide(a, b)
    return _reduce128(hi, lo)


def square(a: np.ndarray) -> np.ndarray:
    return mul(a, a)


def pow7(a: np.ndarray) -> np.ndarray:
    a2 = mul(a, a)
    a3 = mul(a2, a)
    a6 = mul(a3, a3)
    return mul(a6, a)


def exp(a: np.ndarray, e: int) -> np.ndarray:
    """a ** e (scalar integer exponent), vectorized square-and-multiply."""
    a = asfield(a)
    if a.ndim == 0:  # scalar: CPython's pow is far faster than numpy loops
        return np.uint64(pow(int(a), e, P_INT))
    result = np.ones_like(a)
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def inv(a: np.ndarray) -> np.ndarray:
    """Inverse: Fermat pow for scalars, Montgomery batch trick for arrays
    (zeros map to zero, matching 0^(p-2))."""
    a = asfield(a)
    if a.ndim == 0:
        return np.uint64(pow(int(a), P_INT - 2, P_INT))
    zero_mask = a == 0
    if zero_mask.any():
        safe = a.copy()
        safe[zero_mask] = 1
        out = batch_inverse(safe)
        out[zero_mask] = 0
        return out
    return batch_inverse(a)


def batch_inverse(a: np.ndarray) -> np.ndarray:
    """Montgomery trick: one Fermat inversion for n elements (all nonzero)."""
    flat = asfield(a).reshape(-1)
    n = flat.shape[0]
    if n == 0:
        return flat.reshape(a.shape)
    pref = prefix_product(flat)              # pref[i] = prod_{k<=i} a[k]
    total_inv = np.uint64(pow(int(pref[-1]), P_INT - 2, P_INT))
    out = np.empty_like(flat)
    # walk back: inv(a[i]) = pref[i-1] * suffix_inv; vectorized form below
    suffix = np.empty_like(flat)
    suffix[-1] = total_inv
    # suffix[i] = total_inv * prod_{k>i} a[k]^... computed by reverse scan
    rev = np.concatenate([np.ones(1, dtype=np.uint64), flat[:0:-1]])
    rev_pref = prefix_product(rev)           # rev_pref[j] = prod of last j elems
    suffix = mul(np.broadcast_to(total_inv, (n,)).copy(), rev_pref[::-1])
    out[0] = suffix[0]
    out[1:] = mul(pref[:-1], suffix[1:])
    return out.reshape(np.asarray(a).shape)


def prefix_product(a: np.ndarray) -> np.ndarray:
    """Inclusive prefix product along axis 0, log-depth doubling."""
    nv = _native()
    if nv is not None and a.ndim == 1:
        return nv.prefix_product(a)
    out = a.copy()
    n = out.shape[0]
    shift = 1
    while shift < n:
        out[shift:] = mul(out[shift:], out[:-shift])
        shift <<= 1
    return out


def from_signed(v: int) -> int:
    v = v % P_INT
    return v


_W = None


def two_adic_roots():
    """w[i] = primitive 2^i-th root, i = 0..32 (matches reference MG table)."""
    global _W
    if _W is None:
        w = [0] * 33
        w[32] = int(exp(np.uint64(GENERATOR), (P_INT - 1) >> 32))
        for i in range(31, -1, -1):
            w[i] = int(mul(np.uint64(w[i + 1]), np.uint64(w[i + 1])))
        _W = w
    return _W


def root_of_unity(nbits: int) -> int:
    return two_adic_roots()[nbits]


def sum_mod(a: np.ndarray, axis: int = 0) -> np.ndarray:
    """Modular sum reduction along an axis (pairwise log-depth folding)."""
    a = np.moveaxis(a, axis, 0)
    while a.shape[0] > 1:
        n = a.shape[0]
        half = n // 2
        folded = add(a[:half], a[half : 2 * half])
        if n % 2:
            folded = np.concatenate([folded, a[-1:]], axis=0)
        a = folded
    return a[0]


def exp_vec(base: np.ndarray, e: np.ndarray) -> np.ndarray:
    """base ** e with per-element integer exponents (uint64 array)."""
    e = np.asarray(e, dtype=np.uint64)
    result = np.ones_like(e)
    b = np.broadcast_to(asfield(base), e.shape).copy()
    e = e.copy()
    while np.any(e):
        odd = (e & np.uint64(1)).astype(bool)
        result = np.where(odd, mul(result, b), result)
        e >>= np.uint64(1)
        b = mul(b, b)
    return result
