"""Multi-chip sharded commit on the 8-device virtual CPU mesh."""
import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eigen_zkvm_tpu.hash.merkle_gl import MerkleTreeGL
from eigen_zkvm_tpu.parallel.sharded import make_sharded_commit
from eigen_zkvm_tpu.poly import ntt as ntt_np

GL_P = np.uint64(0xFFFFFFFF00000001)


def test_sharded_commit_matches_host():
    nbits, nbits_ext = 4, 5
    d, m = 2, 4
    n, n_pols, B = 1 << nbits, 2 * m, 2 * d

    devs = jax.devices("cpu")[: d * m]
    mesh = Mesh(np.asarray(devs).reshape(d, m), ("data", "model"))
    step = make_sharded_commit(mesh, nbits, nbits_ext, n_pols)

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**63, size=(B, n, n_pols), dtype=np.uint64) % GL_P
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    sharding = NamedSharding(mesh, P("data", None, "model"))
    roots = step(jax.device_put(lo, sharding), jax.device_put(hi, sharding))

    got = (np.asarray(roots[0]).astype(np.uint64)
           | (np.asarray(roots[1]).astype(np.uint64) << np.uint64(32)))
    for b in range(B):
        lde = ntt_np.interpolate(vals[b], nbits, nbits_ext)
        ref = MerkleTreeGL().merkelize(lde, n_pols, 1 << nbits_ext).root()
        assert np.array_equal(got[b], np.asarray(ref, dtype=np.uint64))
