"""Cubic extension GF(p^3) of Goldilocks, irreducible x^3 - x - 1.

Vectorized: extension elements are np.uint64 arrays whose LAST axis has size 3
(coefficients c0 + c1*x + c2*x^2).  Base-field values embed as (v, 0, 0).
Semantics mirror the reference's F3G (reference: starky/src/f3g.rs) — the
product/square/inverse formulas give identical canonical outputs.
"""
from __future__ import annotations

import numpy as np

from . import gl64 as gl

DIM = 3


def from_base(a: np.ndarray) -> np.ndarray:
    """Embed base-field array (shape S) as extension array (shape S+(3,))."""
    a = gl.asfield(a)
    out = np.zeros(a.shape + (3,), dtype=np.uint64)
    out[..., 0] = a
    return out


def from_ints(a, b, c) -> np.ndarray:
    return np.array([a % gl.P_INT, b % gl.P_INT, c % gl.P_INT], dtype=np.uint64)


def zeros(shape) -> np.ndarray:
    return np.zeros(tuple(shape) + (3,), dtype=np.uint64)


def ones(shape) -> np.ndarray:
    out = zeros(shape)
    out[..., 0] = 1
    return out


ZERO = np.zeros(3, dtype=np.uint64)
ONE = np.array([1, 0, 0], dtype=np.uint64)


def add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return gl.add(a, b)


def sub(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return gl.sub(a, b)


def neg(a: np.ndarray) -> np.ndarray:
    return gl.neg(a)


def mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    nv = gl._native()
    if nv is not None:
        r = nv.try_f3_mul(a, b)
        if r is not None:
            return r
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    aa = gl.mul(gl.add(a0, a1), gl.add(b0, b1))
    bb = gl.mul(gl.add(a0, a2), gl.add(b0, b2))
    cc = gl.mul(gl.add(a1, a2), gl.add(b1, b2))
    dd = gl.mul(a0, b0)
    ee = gl.mul(a1, b1)
    ff = gl.mul(a2, b2)
    gg = gl.sub(dd, ee)
    c0 = gl.sub(gl.add(cc, gg), ff)
    c1 = gl.sub(gl.add(aa, cc), gl.add(gl.add(ee, ee), dd))
    c2 = gl.sub(bb, gg)
    return np.stack([c0, c1, c2], axis=-1)


def mul_base(a: np.ndarray, s: np.ndarray) -> np.ndarray:
    """Multiply extension array by base-field array (broadcast over last axis)."""
    nv = gl._native()
    if nv is not None and isinstance(s, np.ndarray):
        r = nv.try_f3_mul_base(a, s)
        if r is not None:
            return r
    return gl.mul(a, np.asarray(s, dtype=np.uint64)[..., None])


def square(a: np.ndarray) -> np.ndarray:
    return mul(a, a)


def exp(a: np.ndarray, e: int) -> np.ndarray:
    result = ones(a.shape[:-1])
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def inv(a: np.ndarray) -> np.ndarray:
    """Inverse via the adjugate/norm formula (reference: f3g.rs _inv)."""
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    aa = gl.mul(a0, a0)
    ac = gl.mul(a0, a2)
    ba = gl.mul(a1, a0)
    bb = gl.mul(a1, a1)
    bc = gl.mul(a1, a2)
    cc = gl.mul(a2, a2)
    aaa = gl.mul(aa, a0)
    aac = gl.mul(aa, a2)
    abc = gl.mul(ba, a2)
    abb = gl.mul(ba, a1)
    acc = gl.mul(ac, a2)
    bbb = gl.mul(bb, a1)
    bcc = gl.mul(bc, a2)
    ccc = gl.mul(cc, a2)
    t = gl.neg(aaa)
    t = gl.sub(t, aac)
    t = gl.sub(t, aac)
    t = gl.add(t, abc)
    t = gl.add(t, abc)
    t = gl.add(t, abc)
    t = gl.add(t, abb)
    t = gl.sub(t, acc)
    t = gl.sub(t, bbb)
    t = gl.add(t, bcc)
    t = gl.sub(t, ccc)
    tinv = gl.inv(t)
    # i1 = (-aa - ac - ac + bc + bb - cc) * tinv
    i1 = gl.neg(aa)
    i1 = gl.sub(i1, ac)
    i1 = gl.sub(i1, ac)
    i1 = gl.add(i1, bc)
    i1 = gl.add(i1, bb)
    i1 = gl.sub(i1, cc)
    i1 = gl.mul(i1, tinv)
    i2 = gl.mul(gl.sub(ba, cc), tinv)
    i3 = gl.mul(gl.add(gl.sub(ac, bb), cc), tinv)
    return np.stack([i1, i2, i3], axis=-1)


def batch_inverse(a: np.ndarray) -> np.ndarray:
    return inv(a)


def prefix_product(a: np.ndarray) -> np.ndarray:
    """Inclusive prefix product along axis 0 (log-depth doubling)."""
    out = a.copy()
    n = out.shape[0]
    shift = 1
    while shift < n:
        out[shift:] = mul(out[shift:], out[:-shift])
        shift <<= 1
    return out


def eq(a: np.ndarray, b: np.ndarray):
    return np.all(a == b, axis=-1)


def is_base(a: np.ndarray):
    return np.all(a[..., 1:] == 0)
