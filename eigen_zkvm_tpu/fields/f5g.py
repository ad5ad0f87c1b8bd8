"""GF(p^5) quintic extension of Goldilocks, x^5 = 3.

Counterpart of the reference's f5g (starky/src/f5g.rs: irreducible x^5 - 3,
f5g.rs:11-18).  Unlike the reference — which declares the type but never
wires it through the fold ("TODO: Support F5G", fri.rs:309,319-331) — this
field IS wired through the FRI commit/fold/query/verify chain via
`stark.fri.FRI(..., dim=5)` (tests/test_fri_f5g.py).
Values are [..., 5] uint64 arrays; ops are batched numpy like fields/f3g.py.
"""
from __future__ import annotations

import numpy as np

from . import gl64 as gl

DIM = 5
ZERO = np.zeros(DIM, dtype=np.uint64)
ONE = np.array([1, 0, 0, 0, 0], dtype=np.uint64)
_THREE = np.uint64(3)


def from_base(x) -> np.ndarray:
    out = np.zeros(np.shape(x) + (DIM,), dtype=np.uint64)
    out[..., 0] = x
    return out


def add(a, b):
    return gl.add(a, b)


def sub(a, b):
    return gl.sub(a, b)


def neg(a):
    return gl.neg(a)


def mul(a, b):
    """Schoolbook product with x^5 = 3 wrap-around."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    out = np.zeros(np.broadcast_shapes(a.shape, b.shape), dtype=np.uint64)
    for i in range(DIM):
        for j in range(DIM):
            t = gl.mul(a[..., i], b[..., j])
            k = i + j
            if k >= DIM:
                k -= DIM
                t = gl.mul(t, _THREE)
            out[..., k] = gl.add(out[..., k], t)
    return out


def mul_base(a, k):
    return gl.mul(np.asarray(a, dtype=np.uint64), np.uint64(k))


def square(a):
    return mul(a, a)


def exp(a, e: int):
    result = np.broadcast_to(ONE, np.shape(a)).copy()
    base = np.asarray(a, dtype=np.uint64).copy()
    e = int(e)
    while e:
        if e & 1:
            result = mul(result, base)
        base = square(base)
        e >>= 1
    return result


def inv(a):
    """a^(p^5 - 2) — one multiplicative inverse in the extension field."""
    return exp(a, gl.P_INT ** 5 - 2)


def eq(a, b) -> bool:
    return bool(np.array_equal(np.asarray(a, np.uint64),
                               np.asarray(b, np.uint64)))
