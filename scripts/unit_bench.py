"""Per-chip unit metrics (BASELINE.md north star): NTT butterflies/s,
Poseidon hashes/s, and MSM points/s on the default device.

Usage: python3 scripts/unit_bench.py [--quick]
Prints one JSON line per metric (unlike bench.py, which prints the single
driver-tracked headline)."""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def bench_ntt(nbits: int, n_pols: int, reps: int) -> dict:
    import jax

    from eigen_zkvm_tpu.ops import ntt_jax

    rng = np.random.default_rng(1)
    P = 0xFFFFFFFF00000001
    vals = rng.integers(0, 2**63, size=(1 << nbits, n_pols),
                        dtype=np.uint64) % np.uint64(P)
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    out = ntt_jax.interpolate_jit((lo, hi), nbits, nbits + 1)  # compile
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = ntt_jax.interpolate_jit((lo, hi), nbits, nbits + 1)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    n, ne = 1 << nbits, 1 << (nbits + 1)
    butterflies = (n // 2 * nbits + ne // 2 * (nbits + 1)) * n_pols
    return {"metric": "ntt_butterflies_per_s", "value": round(butterflies / dt),
            "unit": f"butterflies/s (2^{nbits}x{n_pols} LDE)", "secs": round(dt, 4)}


def bench_poseidon(height: int, width: int, reps: int) -> dict:
    import jax

    from eigen_zkvm_tpu.ops import poseidon_jax as pj
    import jax.numpy as jnp
    from functools import partial

    rng = np.random.default_rng(2)
    P = 0xFFFFFFFF00000001
    vals = rng.integers(0, 2**63, size=(height, width),
                        dtype=np.uint64) % np.uint64(P)
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))

    @partial(jax.jit, static_argnums=(2, 3))
    def tree(l, h, w, n):
        levels, stack = pj.merkle_levels((l, h), w, n)
        if stack is None:
            return levels[-1]
        return (stack[0][-1, :1], stack[1][-1, :1])

    out = tree(lo, hi, width, height)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = tree(lo, hi, width, height)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    hashes = 2 * height  # leaves + internal nodes (approx, pow2 tree)
    return {"metric": "poseidon_hashes_per_s", "value": round(hashes / dt),
            "unit": f"hashes/s (2^{height.bit_length()-1} tree)",
            "secs": round(dt, 4)}


def bench_msm(n: int) -> dict:
    import random

    from eigen_zkvm_tpu.curves import bn254
    from eigen_zkvm_tpu.ops import ec_jax

    rng = random.Random(5)
    pts = []
    acc = bn254.g1_from_affine(bn254.G1_GEN)
    for _ in range(n):
        pts.append(acc)
        acc = bn254.g1_add(acc, bn254.g1_from_affine(bn254.G1_GEN))
    pts = [bn254.g1_to_affine(p) for p in pts]
    scalars = [rng.randrange(bn254.R) for _ in range(n)]
    ec_jax.msm(pts, scalars)  # compile
    t0 = time.time()
    ec_jax.msm(pts, scalars)
    dt = time.time() - t0
    return {"metric": "msm_points_per_s", "value": round(n / dt),
            "unit": f"points/s (n=2^{n.bit_length()-1}, BN254 G1)",
            "secs": round(dt, 3)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        jobs = [lambda: bench_ntt(14, 4, 3),
                lambda: bench_poseidon(1 << 14, 4, 3),
                lambda: bench_msm(1 << 10)]
    else:
        jobs = [lambda: bench_ntt(20, 8, 3),
                lambda: bench_poseidon(1 << 20, 8, 3),
                lambda: bench_msm(1 << 14)]
    for job in jobs:
        print(json.dumps(job()), flush=True)
