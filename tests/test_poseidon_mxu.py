"""MXU Poseidon kernel math: bit-exact digests vs the numpy engine
(hash/poseidon_gl.py, golden-tested against starky/src/poseidon_opt.rs
vectors).  The ladder is pure jnp shared verbatim with the Pallas kernel
body (poseidon_mxu._ladder), so this validates the exact arithmetic the
kernel executes — including the bf16-matmul limb convolution and the
relaxed (non-canonical) wrap adds — without the (slow) Pallas
interpreter; the on-TPU engine tests cover the pallas_call layer."""
import numpy as np

import jax.numpy as jnp

from eigen_zkvm_tpu.hash import poseidon_gl as pnp
from eigen_zkvm_tpu.ops import poseidon_mxu as pm

P = 0xFFFFFFFF00000001


def _pair_t(x):
    """[B, 12] u64 -> transposed [12, B] u32 pair."""
    xt = x.T
    return (jnp.asarray((xt & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((xt >> np.uint64(32)).astype(np.uint32)))


def _join_t(p):
    return (np.asarray(p[0]).astype(np.uint64)
            | (np.asarray(p[1]).astype(np.uint64) << np.uint64(32))).T


def test_permute_bit_exact_vs_numpy():
    rng = np.random.default_rng(5)
    B = 64
    st = rng.integers(0, 2**63, size=(B, 12), dtype=np.uint64) % np.uint64(P)
    want = pnp.permute(st[:, :8], st[:, 8:])
    got = _join_t(pm.permute_ref(*_pair_t(st)))
    assert np.array_equal(want, got)


def test_permute_edge_states():
    """All-zero, all-(p-1) and mixed-extreme states (stress the relaxed
    wrap arithmetic's corner cases and the limb-matmul digit bounds)."""
    pm1 = np.uint64(P - 1)
    st = np.zeros((4, 12), dtype=np.uint64)
    st[1, :] = pm1
    st[2, ::2] = pm1
    st[3, :] = np.uint64(0xFFFFFFFF)  # 2^32-1: hi==0 lo==max
    want = pnp.permute(st[:, :8], st[:, 8:])
    got = _join_t(pm.permute_ref(*_pair_t(st)))
    assert np.array_equal(want, got)


def test_weight_matrix_structure():
    """W[(i,c),(j,a)] = byte (c-a) of M[j][i]; every entry <= 255 and
    column sums bound the f32 accumulator below 2^24 (exactness proof)."""
    W = np.asarray(pm._W_M, dtype=np.float64)
    assert W.shape == (12 * 15, 12 * 8)
    assert W.max() <= 255
    # worst-case accumulation: all limbs 255
    assert (W.sum(axis=1) * 255).max() < 2**24
    m = int(pm._M[3][7])
    assert W[7 * 15 + 5, 3 * 8 + 2] == (m >> (8 * 3)) & 0xFF