"""The >=2^23 eager tree builder (ops/commit_tpu._eager_flat_tree) must
produce node-for-node the same flat store as the fused all-levels
program, including the round-5 small-level fusion — exercised here at a
small height with the fusion threshold lowered."""
import numpy as np
import pytest

from eigen_zkvm_tpu.hash.merkle_gl import MerkleTreeGL
from eigen_zkvm_tpu.ops import commit_tpu as ct


@pytest.mark.parametrize("height_bits,width", [(13, 4), (12, 7)])
def test_eager_flat_tree_matches_fused_and_host(monkeypatch,
                                                height_bits, width):
    monkeypatch.setattr(ct, "EAGER_FUSE_NODES", 1 << 9)
    rng = np.random.default_rng(9)
    height = 1 << height_bits
    buf = rng.integers(0, 2**63, size=(height, width),
                       dtype=np.uint64) % np.uint64(0xFFFFFFFF00000001)
    lo, hi = ct._split(buf)
    import jax.numpy as jnp

    pair = (jnp.asarray(lo), jnp.asarray(hi))
    flat_eager = ct._eager_flat_tree(pair, width, height)
    flat_fused = ct._levels_only(pair[0], pair[1], width, height, ma=None)
    assert np.array_equal(np.asarray(flat_eager[0]),
                          np.asarray(flat_fused[0]))
    assert np.array_equal(np.asarray(flat_eager[1]),
                          np.asarray(flat_fused[1]))
    tree = ct.DeviceMerkleTreeGL(flat_eager, *ct._level_meta(height))
    tree.set_device_elements(pair)
    tree.width = width
    tree.height = height
    host = MerkleTreeGL().merkelize(buf, width, height)
    assert np.array_equal(tree.root(), host.root())
    # query paths verify against the host root
    for idx in (0, 1, height // 2, height - 1):
        v, mp = tree.get_group_proof(idx)
        assert MerkleTreeGL.verify_group_proof(host.root(), mp, idx, v)


def test_level_loop_matches_block_dispatch(monkeypatch):
    """EIGEN_ZKVM_MERKLE_LOOP=1 (fori_loop big-level hashing) is
    bit-identical to the python-level block dispatch form."""
    import jax.numpy as jnp

    from eigen_zkvm_tpu.ops import poseidon_jax as pj

    monkeypatch.setattr(pj, "POSEIDON_BLOCK", 1 << 8)
    rng = np.random.default_rng(11)
    n = 1 << 12  # 8 blocks of 2*2^8
    lvl_np = rng.integers(0, 2**63, size=(2, n, 4), dtype=np.uint64) \
        % np.uint64(0xFFFFFFFF00000001)
    lo = jnp.asarray((lvl_np[0] & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((lvl_np[0] >> np.uint64(32)).astype(np.uint32))
    monkeypatch.delenv("EIGEN_ZKVM_MERKLE_LOOP", raising=False)
    a = pj._level_step_jit((lo, hi))
    monkeypatch.setenv("EIGEN_ZKVM_MERKLE_LOOP", "1")
    b = pj._level_step_jit((lo, hi))
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
