"""Differential tests: JAX u32-pair engine vs the numpy u64 engine."""
import numpy as np

from eigen_zkvm_tpu.fields import gl64 as gl
from eigen_zkvm_tpu.hash import poseidon_gl as pnp
from eigen_zkvm_tpu.hash.merkle_gl import MerkleTreeGL
from eigen_zkvm_tpu.ops import gl_jax as g
from eigen_zkvm_tpu.ops import ntt_jax
from eigen_zkvm_tpu.ops import poseidon_jax as pj
from eigen_zkvm_tpu.poly import ntt as ntt_np

import jax


def test_gl_jax_field_ops_differential():
    rng = np.random.default_rng(0)
    a = rng.integers(0, gl.P_INT, 5000, dtype=np.uint64)
    b = rng.integers(0, gl.P_INT, 5000, dtype=np.uint64)
    ja, jb = g.from_u64(a), g.from_u64(b)
    fns = {
        "mul": (jax.jit(g.mul), gl.mul),
        "add": (jax.jit(g.add), gl.add),
        "sub": (jax.jit(g.sub), gl.sub),
    }
    for name, (jf, nf) in fns.items():
        assert np.array_equal(g.to_u64(jf(ja, jb)), nf(a, b)), name
    assert np.array_equal(g.to_u64(jax.jit(g.neg)(ja)), gl.neg(a))


def test_gl_jax_edge_cases():
    edge = np.array([0, 1, 2, gl.P_INT - 1, gl.P_INT - 2, 0xFFFFFFFF,
                     0x100000000, 0xFFFFFFFF00000000], dtype=np.uint64)
    A, B = np.meshgrid(edge, edge)
    A, B = A.ravel(), B.ravel()
    ja, jb = g.from_u64(A), g.from_u64(B)
    assert np.array_equal(g.to_u64(jax.jit(g.mul)(ja, jb)), gl.mul(A, B))
    assert np.array_equal(g.to_u64(jax.jit(g.add)(ja, jb)), gl.add(A, B))
    assert np.array_equal(g.to_u64(jax.jit(g.sub)(ja, jb)), gl.sub(A, B))


def test_gl_jax_inverse():
    rng = np.random.default_rng(1)
    a = rng.integers(1, gl.P_INT, 64, dtype=np.uint64)
    got = g.to_u64(jax.jit(g.inv)(g.from_u64(a)))
    assert np.array_equal(got, gl.inv(a))


def test_ntt_jax_differential():
    rng = np.random.default_rng(2)
    x = rng.integers(0, gl.P_INT, (1 << 8, 3), dtype=np.uint64)
    got = g.to_u64(jax.jit(lambda v: ntt_jax.ntt(v, 8))(g.from_u64(x)))
    assert np.array_equal(got, ntt_np.ntt(x))


def test_interpolate_jax_differential():
    rng = np.random.default_rng(3)
    x = rng.integers(0, gl.P_INT, (1 << 8, 2), dtype=np.uint64)
    got = g.to_u64(ntt_jax.interpolate_jit(g.from_u64(x), 8, 10))
    assert np.array_equal(got, ntt_np.interpolate(x, 8, 10))


def test_poseidon_jax_differential():
    rng = np.random.default_rng(4)
    inp = rng.integers(0, gl.P_INT, (17, 8), dtype=np.uint64)
    st = rng.integers(0, gl.P_INT, (17, 4), dtype=np.uint64)
    ref = pnp.hash_n(inp, st)
    f = jax.jit(pj.hash_n)
    jx = f(g.from_u64(inp), g.from_u64(st))
    assert np.array_equal(g.to_u64(jx), ref)


def test_merkle_jax_differential():
    rng = np.random.default_rng(5)
    elems = rng.integers(0, gl.P_INT, (256, 9), dtype=np.uint64)
    tnp = MerkleTreeGL().merkelize(elems, 9, 256)
    levels, stack = pj.merkle_levels(g.from_u64(elems), 9, 256)
    for lv_np, lv_jx in zip(tnp.levels, levels):
        assert np.array_equal(g.to_u64(lv_jx), lv_np)
    # scan-tail levels: step i keeps its T >> (i+1) live nodes in the row
    # prefix of the constant-shape stack buffer (see pj.merkle_levels)
    T = tnp.levels[len(levels) - 1].shape[0]
    tail = tnp.levels[len(levels):]
    assert (stack is None) == (len(tail) == 0)
    for i, lv_np in enumerate(tail):
        n_real = T >> (i + 1)
        pair = (stack[0][i, :n_real], stack[1][i, :n_real])
        assert np.array_equal(g.to_u64(pair), lv_np)
