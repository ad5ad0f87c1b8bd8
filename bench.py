"""Headline benchmark — ONE JSON line for the driver.

Primary metric: the reference's only published number — the bottom-layer GL
eSTARK prove of the fibonacci fixture at 2^10 (starkjs/README.md:63, 0.34 s
on an i9-11900; vs_baseline = baseline / ours, >1 means faster).

`extra` carries the TPU evidence (BASELINE.md north-star unit metrics):
  - chain_gl_2e20x8_tpu_prove_s: a 2^20-row x 8-col eSTARK prove with the
    device-resident engine (auto-dispatched: commit+VM+FRI on the TPU,
    nothing large crosses the host link), self-verified
  - poseidon_gl_hashes_per_s / ntt_butterflies_per_s: per-chip device rates
When no accelerator is attached the extra TPU metrics are skipped.
"""
from __future__ import annotations

import json
import time

BASELINE_S = 0.34  # reference bottom-layer GL eSTARK prove, 2^10 (starkjs/README.md:63)
FIXTURES = "/root/reference/starky/data/"


def bench_fib():
    from eigen_zkvm_tpu.stark.polsarray import PolsArray
    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.stark_verify import stark_verify
    from eigen_zkvm_tpu.stark.types import load_pil, load_starkstruct

    pil = load_pil(FIXTURES + "fib.pil.json.gl")
    ss = load_starkstruct(FIXTURES + "starkStruct.json.gl")
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(FIXTURES + "fib.const.gl")
    cm_pols = PolsArray(pil, PolsArray.COMMIT).load(FIXTURES + "fib.cm.gl")
    setup = StarkSetup(const_pols, pil, ss)

    # warm-up once (trace/compile caches), then report the best of three
    # timed proves — the box is shared, so min-of-reps is the stable metric
    stark_gen(cm_pols, const_pols, setup.const_tree, setup.starkinfo, setup.program, ss)
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        proof = stark_gen(cm_pols, const_pols, setup.const_tree,
                          setup.starkinfo, setup.program, ss)
        elapsed = min(elapsed, time.perf_counter() - t0)

    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program), \
        "benchmark proof failed verification"
    return elapsed


def bench_tpu_prove(nbits: int = 20, width: int = 8, reps: int = 2,
                    deadline: float | None = None):
    """Device-resident large-N prove (best of up to `reps` warm runs; the
    first run warms cold compiles/tunnel transfers and extra reps are
    skipped once `deadline` — an absolute time.monotonic() stamp — has
    passed, so a slow tunnel degrades the sample count, not the bench)."""
    import sys

    sys.path.insert(0, ".")
    from scripts.bench_big import build_chain_air

    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.stark_verify import stark_verify
    from eigen_zkvm_tpu.stark.types import StarkStruct, Step

    pil, const_pols, cm = build_chain_air(nbits, width)
    steps = []
    cur = nbits + 1
    while cur > 4:
        steps.append(Step(cur))
        cur -= 5
    steps.append(Step(cur))
    ss = StarkStruct(nBits=nbits, nBitsExt=nbits + 1, nQueries=8,
                     verificationHashType="GL", steps=steps)
    setup = StarkSetup(const_pols, pil, ss)
    best = float("inf")
    for k in range(reps + 1):  # first run warms any cold compiles
        t0 = time.perf_counter()
        proof = stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                          setup.program, ss)
        best = min(best, time.perf_counter() - t0)
        if k >= 1 and deadline is not None and time.monotonic() > deadline:
            break
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                        setup.program), "TPU proof failed verification"
    return best


def bench_unit_rates():
    """Per-chip Poseidon hashes/s and NTT butterflies/s (BASELINE.md)."""
    import jax
    import numpy as np
    from functools import partial
    import jax.numpy as jnp

    from eigen_zkvm_tpu.ops import ntt_jax
    from eigen_zkvm_tpu.ops import poseidon_jax as pj

    rng = np.random.default_rng(7)
    P = 0xFFFFFFFF00000001
    out = {}

    nbits, npols = 20, 8
    vals = rng.integers(0, 2**63, size=(1 << nbits, npols),
                        dtype=np.uint64) % np.uint64(P)
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    r = ntt_jax.interpolate_jit((lo, hi), nbits, nbits + 1)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = ntt_jax.interpolate_jit((lo, hi), nbits, nbits + 1)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    n, ne = 1 << nbits, 1 << (nbits + 1)
    out["ntt_butterflies_per_s"] = round(
        (n // 2 * nbits + ne // 2 * (nbits + 1)) * npols / dt)

    height, width = 1 << 21, 8
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

    r = tree(lo, hi, width, height)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = tree(lo, hi, width, height)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    out["poseidon_gl_hashes_per_s"] = round(2 * height / dt)  # leaves+nodes
    return out


def start_scaling():
    """SPMD scaling measurement on the 8-virtual-device CPU mesh, launched
    as a CONCURRENT subprocess: it burns CPU while the parent's TPU phases
    mostly wait on the device/tunnel, so the two overlap almost freely."""
    import os
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               PALLAS_AXON_REMOTE_COMPILE="0")
    return subprocess.Popen([sys.executable, "scripts/bench_scaling.py"],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, env=env, cwd=here)


def main():
    import os

    t_start = time.monotonic()
    budget = float(os.environ.get("EIGEN_BENCH_BUDGET_S", "2400"))
    deadline = t_start + budget
    try:
        scaling_proc = start_scaling()
    except Exception:
        scaling_proc = None
    fib = bench_fib()
    extra = {}
    try:
        from eigen_zkvm_tpu.stark.engine import _device_present

        if _device_present():
            from eigen_zkvm_tpu.stark.engine import Engine

            t = bench_tpu_prove(deadline=deadline)
            extra["chain_gl_2e20x8_tpu_prove_s"] = round(t, 2)
            extra["tpu_engine"] = repr(Engine(21))
            if time.monotonic() < deadline:
                extra.update(bench_unit_rates())
    except Exception as e:  # record, never break the primary metric
        extra["tpu_error"] = f"{type(e).__name__}: {e}"
    if scaling_proc is not None:
        try:
            left = max(60.0, deadline - time.monotonic())
            out, _err = scaling_proc.communicate(timeout=left)
            extra["multichip_scaling"] = json.loads(
                out.strip().splitlines()[-1])
        except Exception as e:
            scaling_proc.kill()
            extra["scaling_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps({
        "metric": "fib_gl_2e10_estark_prove",
        "value": round(fib, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / fib, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
