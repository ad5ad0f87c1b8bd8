"""Multi-chip scaling-efficiency measurement on the virtual CPU mesh.

Real multi-chip hardware is not attached, so wall-clock scaling cannot be
measured honestly — but the SPMD *program* XLA emits for each mesh size is
the real thing (identical to what would run over ICI), so this script
measures what the partitioner actually did:

  - per-device FLOPs of the sharded commit step (LDE + Merkle root, the
    prover's dominant stage) at mesh sizes 1/2/4/8, from XLA cost analysis
  - compute-scaling efficiency: flops(1) / (m * flops(m)) — how close the
    partition is to a perfect 1/m split of the arithmetic
  - collective traffic per device (the ONE all_to_all reshard between the
    pol-sharded NTT phase and the row-sharded hash phase + the all_gather
    tree top), analytic bytes riding ICI

Prints one JSON line; bench.py embeds it in `extra` via a subprocess (this
must run on the 8-virtual-device CPU backend, not the single TPU chip).
Reference analog: fft_p.rs:226-355 transpose rounds / stark_gen.rs:786
row-chunking, which never leave one host.
"""
from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"  # XLA:CPU must compile locally
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def measure(nbits: int = 12, nbits_ext: int = 13, n_pols: int = 8):
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from eigen_zkvm_tpu.parallel.sharded import make_sharded_commit

    devs = jax.devices("cpu")
    assert len(devs) >= 8, "needs xla_force_host_platform_device_count=8"
    n = 1 << nbits
    n_ext = 1 << nbits_ext
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 2**63, size=(1, n, n_pols), dtype=np.uint64)
    vals %= np.uint64(0xFFFFFFFF00000001)
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)

    out = {"nbits": nbits, "n_pols": n_pols}
    flops = {}
    for m in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(devs[:m]).reshape(1, m), ("data", "model"))
        step = make_sharded_commit(mesh, nbits, nbits_ext, n_pols)
        sh = NamedSharding(mesh, P("data", None, "model"))
        args = (jax.device_put(lo, sh), jax.device_put(hi, sh))
        compiled = step.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns one dict per device
            cost = cost[0]
        flops[m] = float(cost.get("flops", 0.0))
        # sanity: the sharded program still computes the right root
        root = step(*args)
        jax.block_until_ready(root)
        if m == 1:
            want = np.asarray(root[0]), np.asarray(root[1])
        else:
            got = np.asarray(root[0]), np.asarray(root[1])
            assert np.array_equal(want[0], got[0]) and \
                np.array_equal(want[1], got[1]), f"root mismatch at m={m}"

    out["flops_per_device"] = {str(m): v for m, v in flops.items()}
    out["compute_scaling_efficiency"] = {
        str(m): round(flops[1] / (m * flops[m]), 4) if flops[m] else None
        for m in (2, 4, 8)}
    # analytic ICI bytes per device: all_to_all sends (m-1)/m of the local
    # [n_ext, n_pols/m] x2 u32 LDE block; all_gather replicates (m-1) roots
    ici = {}
    for m in (2, 4, 8):
        a2a = 2 * 4 * n_ext * (n_pols // m) * (m - 1) / m
        ag = (m - 1) * 4 * 2 * 4  # (m-1) roots x 4 lanes x 2 limbs x u32
        ici[str(m)] = int(a2a + ag)
    out["ici_bytes_per_device"] = ici
    return out


if __name__ == "__main__":
    print(json.dumps(measure()))
