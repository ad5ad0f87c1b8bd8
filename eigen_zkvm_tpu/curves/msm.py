"""Multi-scalar multiplication (Pippenger bucket method).

Curve-generic over the add/double/zero ops passed in; instantiated for
BN254/BLS12-381 G1 and G2.  This is the correctness engine; production
MSMs run through native/ec_curves.cpp (batch-affine counting-sort
Pippenger) or the TPU path in ops/ec_jax.py (vectorized Jacobian bucket
accumulation) — reference analog: bellperson's GPU multiexp
(groth16/src/groth16.rs cuda/opencl features).
"""
from __future__ import annotations


def _pippenger(points, scalars, zero, add, double, window: int | None = None):
    n = len(points)
    assert n == len(scalars)
    if n == 0:
        return zero
    nbits = max((int(s).bit_length() for s in scalars), default=1) or 1
    if window is None:
        window = 3 if n < 32 else max(3, n.bit_length() - 2)
        window = min(window, 16)
    n_windows = (nbits + window - 1) // window
    result = zero
    for w in range(n_windows - 1, -1, -1):
        if w != n_windows - 1:
            for _ in range(window):
                result = double(result)
        buckets = [zero] * ((1 << window) - 1)
        shift = w * window
        mask = (1 << window) - 1
        for p, s in zip(points, scalars):
            idx = (int(s) >> shift) & mask
            if idx:
                buckets[idx - 1] = add(buckets[idx - 1], p)
        running = zero
        acc = zero
        for b in range(len(buckets) - 1, -1, -1):
            running = add(running, buckets[b])
            acc = add(acc, running)
        result = add(result, acc)
    return result


class FixedBase:
    """Windowed fixed-base scalar multiplication (precomputed table)."""

    def __init__(self, zero, add, double, base, nbits: int, window: int = 8):
        self.zero = zero
        self.add = add
        self.window = window
        n_windows = (nbits + window - 1) // window
        self.tables = []
        cur = base  # base * 2^(window*t)
        for _ in range(n_windows):
            row = [zero]
            for _i in range(1, 1 << window):
                row.append(add(row[-1], cur))
            self.tables.append(row)
            # next window base: 2^window * cur = row[-1] + cur
            cur = add(row[-1], cur)

    def mul(self, k: int):
        res = self.zero
        for t, row in enumerate(self.tables):
            idx = (k >> (t * self.window)) & ((1 << self.window) - 1)
            if idx:
                res = self.add(res, row[idx])
        return res


def g1_fixed_base(curve, window: int = 8) -> FixedBase:
    return FixedBase(curve.G1_ZERO, curve.g1_add, curve.g1_double,
                     curve.g1_from_affine(curve.G1_GEN),
                     curve.R.bit_length(), window)


def g2_fixed_base(curve, window: int = 8) -> FixedBase:
    return FixedBase(curve.G2_ZERO, curve.g2_add, curve.g2_double,
                     curve.g2_from_affine(curve.G2_GEN),
                     curve.R.bit_length(), window)


def msm_g1(curve, points_affine, scalars):
    """points: affine pairs (or None); returns affine."""
    pts = [curve.g1_from_affine(p) for p in points_affine]
    res = _pippenger(pts, scalars, curve.G1_ZERO, curve.g1_add,
                     curve.g1_double)
    return curve.g1_to_affine(res)


def msm_g2(curve, points_affine, scalars):
    pts = [curve.g2_from_affine(p) for p in points_affine]
    res = _pippenger(pts, scalars, curve.G2_ZERO, curve.g2_add,
                     curve.g2_double)
    return curve.g2_to_affine(res)
