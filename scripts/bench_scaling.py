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


def measure_full_prove(nbits: int = 12, width: int = 8,
                       cost_nbits: int = 16):
    """FULL sharded prove per mesh size (round-2 verdict #3: not just the
    commit step): every mesh size must produce a proof byte-identical to
    the single-device one (run at 2^nbits — a full CPU prove), and the
    dominant stage is cost-analyzed per device at 2^cost_nbits
    (compile-only: the SPMD program is the real thing; running it on
    shared virtual cores would measure nothing), with analytic per-stage
    collective bytes."""
    import jax
    from jax.sharding import Mesh

    from eigen_zkvm_tpu.parallel import meshctx
    from eigen_zkvm_tpu.parallel.sharded_prove import sharded_prove
    from eigen_zkvm_tpu.stark.serializer import stark_proof_to_json
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.types import StarkStruct, Step

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_big import build_chain_air

    devs = jax.devices("cpu")
    pil, const_pols, cm = build_chain_air(nbits, width)
    steps = []
    cur = nbits + 1
    while cur > 4:
        steps.append(Step(cur))
        cur -= 5
    steps.append(Step(cur))
    ss = StarkStruct(nBits=nbits, nBitsExt=nbits + 1, nQueries=4,
                     verificationHashType="GL", steps=steps)
    setup = StarkSetup(const_pols, pil, ss)

    out = {"nbits": nbits, "n_pols": width}
    import time

    ref_json = None
    walls = {}
    commit_flops = {}
    for m in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(devs[:m]), ("model",))
        t0 = time.perf_counter()
        proof = sharded_prove(cm, const_pols, setup, ss, mesh)
        walls[str(m)] = round(time.perf_counter() - t0, 2)
        pj = stark_proof_to_json(proof)
        if ref_json is None:
            ref_json = pj
        else:
            assert pj == ref_json, f"proof differs at mesh size {m}"
        # per-device cost of the dominant jitted stage (commit: LDE +
        # Merkle levels) at 2^cost_nbits on this mesh size
        from eigen_zkvm_tpu.ops import commit_tpu

        with meshctx.activate(mesh, "model"):
            ma = meshctx.active()
            rng = np.random.default_rng(2)
            big = rng.integers(0, 2**63, size=(1 << cost_nbits, width),
                               dtype=np.uint64)
            lo = (big & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            hi = (big >> np.uint64(32)).astype(np.uint32)
            lowered = commit_tpu._lde_and_levels.lower(
                lo, hi, cost_nbits, cost_nbits + 1, width, ma=ma)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            commit_flops[str(m)] = float(cost.get("flops", 0.0))
    out["proofs_byte_identical"] = True
    out["wall_s_virtual_cpu"] = walls  # NOT a scaling claim: cores shared
    out["commit_flops_per_device"] = commit_flops
    f1 = commit_flops["1"]
    out["full_prove_commit_scaling_efficiency"] = {
        str(m): round(f1 / (m * commit_flops[str(m)]), 4)
        for m in (2, 4, 8) if commit_flops[str(m)]}
    # analytic per-stage collective bytes per device at mesh size m:
    #   commit  — all_to_all of the pol-sharded LDE into row sharding
    #   vm      — collective-permute halo (one +next row per neighbor)
    #   evals   — psum of the [3] eval accumulators per eval point
    #   fri     — all_gather of the <=MERKLE_TAIL replicated tree tail
    out["cost_nbits"] = cost_nbits
    n_ext = 1 << (cost_nbits + 1)
    per_stage = {}
    for m in (2, 4, 8):
        a2a = 2 * 4 * n_ext * (width // m) * (m - 1) / m if width >= m else 0
        halo = 2 * 4 * width  # one boundary row x width x u32 pair
        evals = 3 * 8 * 2     # [3] GL-pair accumulators, psum
        tail = 2 * 4 * 4 * 2048 * (m - 1) / m  # replicate the scan tail
        per_stage[str(m)] = {"commit_all_to_all": int(a2a),
                             "vm_halo_permute": int(halo),
                             "evals_psum": int(evals),
                             "merkle_tail_all_gather": int(tail)}
    out["ici_bytes_per_device_per_stage"] = per_stage
    return out


if __name__ == "__main__":
    res = measure()
    try:
        # full prove per mesh size: 2^10 by default — the byte-identity
        # and per-stage collective accounting are domain-independent, and
        # 4 single-core proves of the 8-way SPMD program at 2^12 cost
        # ~25 wall minutes (the dominant stage is separately
        # cost-analyzed at 2^cost_nbits, compile-only, below)
        res["full_prove"] = measure_full_prove(
            int(os.environ.get("EIGEN_SCALING_FULL_NBITS", "10")),
            cost_nbits=int(os.environ.get(
                "EIGEN_SCALING_COST_NBITS", "16")))
    except Exception as e:  # record, never break the commit-step metrics
        res["full_prove_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(res))
