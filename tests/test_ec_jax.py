"""Differential tests: ops/bigint_jax + ops/ec_jax vs pure-python BN254.

Covers the role of bellperson's GPU multiexp tests in the reference
(groth16/src/groth16.rs) — here the device path is JAX/TPU.
"""
import random

import numpy as np
import pytest

from eigen_zkvm_tpu.curves import bn254
from eigen_zkvm_tpu.ops import bigint_jax as bi


def test_field_ops_differential():
    import jax.numpy as jnp

    rng = random.Random(11)
    P = bi.P_INT
    xs = [rng.randrange(P) for _ in range(64)] + [0, 1, P - 1, P - 2]
    ys = [rng.randrange(P) for _ in range(64)] + [P - 1, 0, P - 1, 1]
    a = jnp.asarray(bi.pack(xs))
    b = jnp.asarray(bi.pack(ys))
    assert bi.unpack(bi.add(a, b)) == [(x + y) % P for x, y in zip(xs, ys)]
    assert bi.unpack(bi.sub(a, b)) == [(x - y) % P for x, y in zip(xs, ys)]
    am, bm = bi.to_mont(a), bi.to_mont(b)
    got = bi.unpack(bi.from_mont(bi.mont_mul(am, bm)))
    assert got == [x * y % P for x, y in zip(xs, ys)]
    got_sq = bi.unpack(bi.from_mont(bi.mont_sq(am)))
    assert got_sq == [x * x % P for x in xs]


@pytest.mark.slow
def test_msm_differential():
    from eigen_zkvm_tpu.ops import ec_jax

    rng = random.Random(7)
    R = bn254.R

    def rand_pt():
        k = rng.randrange(1, R)
        return bn254.g1_to_affine(
            bn254.g1_mul(bn254.g1_from_affine(bn254.G1_GEN), k))

    n = 33
    pts = [rand_pt() for _ in range(n)]
    pts[3] = None            # infinity input
    pts[7] = pts[5]          # duplicate point (exercises doubling case)
    scalars = [rng.randrange(0, R) for _ in range(n)]
    scalars[11] = 0
    scalars[12] = 1
    scalars[13] = R - 1

    got = ec_jax.msm(pts, scalars)

    acc = bn254.G1_ZERO
    for p, s in zip(pts, scalars):
        if p is None or s == 0:
            continue
        acc = bn254.g1_add(acc, bn254.g1_mul(bn254.g1_from_affine(p), s))
    want = None if bn254.g1_is_zero(acc) else bn254.g1_to_affine(acc)
    assert got == want

    assert ec_jax.msm(pts[:4], [0, 0, 0, 0]) is None
