"""Headline benchmark — ONE JSON line for the driver.

Primary metric: the reference's only published number — the bottom-layer GL
eSTARK prove of the fibonacci fixture at 2^10 (starkjs/README.md:63, 0.34 s
on an i9-11900; vs_baseline = baseline / ours, >1 means faster).

Measurement discipline (round-2 verdict items):
  - NOTHING else runs while the fib prove is timed: the CPU-burning
    multichip-scaling subprocess launches only after the primary metric is
    recorded.
  - every unit-rate bench feeds the kernel DEVICE-RESIDENT arrays
    (jnp.asarray + block_until_ready before t0), so the rates measure the
    chip, not the host link/tunnel.
  - rates come with a stated %-of-peak (MFU-style) against an explicit
    VPU peak model, so regressions are legible as utilization.

`extra` carries the TPU evidence (BASELINE.md north-star unit metrics):
  - chain_gl_2e23x8_tpu_prove_s: the north-star-scale device-resident
    eSTARK prove (2^23 rows x 8 cols), self-verified
  - chain_gl_2e20x8_tpu_prove_s: the round-2 point, kept for continuity
  - ntt_butterflies_per_s / poseidon_gl_hashes_per_s / msm_points_per_s
When no accelerator is attached the extra TPU metrics are skipped.
"""
from __future__ import annotations

import json
import os
import tempfile
import time

BASELINE_S = 0.34  # reference bottom-layer GL eSTARK prove, 2^10 (starkjs/README.md:63)
FIXTURES = "/root/reference/starky/data/"

# Roofline models for %-of-peak lines (TPU v5e / "v5 lite"):
#  - the fused Pallas NTT is HBM-BOUND (one read + one write per pass):
#    report achieved bytes/s against the 819 GB/s HBM peak
#  - Poseidon is VPU-compute-bound: report u32-op throughput against a
#    MEASURED-CALIBRATED VPU model (the raw radix-8 NTT kernel sustains
#    ~1.05e13 u32 ops/s while also saturating ~50% of HBM, so the pure
#    -compute ceiling is at least ~1.3e13; 8x128 lanes x ~8 issue/cycle
#    at ~1.3 GHz).  A GL mul in u32-pair form costs ~64 VPU ops, a
#    radix-2 butterfly ~90, a Poseidon-GL hash ~660 GL muls.
HBM_PEAK_GBPS = 819.0
VPU_PEAK_U32_OPS = 1.3e13
OPS_PER_GL_MUL = 64.0
OPS_PER_BUTTERFLY = 90.0
GL_MULS_PER_POSEIDON = 660.0


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

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
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
    cold = None
    for k in range(reps + 1):  # first run warms any cold compiles
        t0 = time.perf_counter()
        proof = stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                          setup.program, ss)
        dt = time.perf_counter() - t0
        if k == 0:
            cold = dt
        else:
            best = min(best, dt)
        if k >= 1 and deadline is not None and time.monotonic() > deadline:
            break
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                        setup.program), "TPU proof failed verification"
    # (warm_or_None, cold): with reps=0 only the cold number exists —
    # callers must record it under a *_cold_s key, never as warm (ADVICE r4)
    return (None if best == float("inf") else best), cold


def _device_pair(arr_u64):
    """Split a u64 numpy array into a DEVICE-RESIDENT u32 pair."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    lo = jnp.asarray((arr_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((arr_u64 >> np.uint64(32)).astype(np.uint32))
    jax.block_until_ready((lo, hi))
    return lo, hi


def _timed_chain(build_fn, reps: int = 3):
    """Time `reps` DEPENDENCY-CHAINED applications of a device program.

    block_until_ready through the remote (axon) tunnel does not reliably
    block (round-2 verdict: the recorded unit rates measured the link,
    not the chip), so each rep feeds the previous rep's output and ONE
    tiny element is read back at the end — laziness cannot cheat, and
    the constant readback RTT cancels in the (reps+1 vs 1) difference."""
    import jax
    import numpy as np
    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def chained(x, k):
        for _ in range(k):
            x = build_fn(x)
        return x

    def run(k, x0):
        r = chained(x0, k)
        leaf = jax.tree.leaves(r)[0]
        np.asarray(leaf[tuple([slice(0, 1)] * leaf.ndim)])
        return r

    return run


def _chain_delta(run, x0, reps: int, tries: int = 3) -> float:
    """Per-op seconds from chained runs: min over `tries` of each length
    (shared-box noise), difference-of-chains to cancel the readback RTT,
    with a fallback to the long chain's average if noise still wins."""
    best = {}
    for k in (1, 1 + reps):
        run(k, x0)  # warm the compile
        best[k] = min(_t_once(run, k, x0) for _ in range(tries))
    dt = (best[1 + reps] - best[1]) / reps
    if dt <= 0:
        dt = best[1 + reps] / (1 + reps)
    return dt


def _t_once(run, k, x0):
    t0 = time.perf_counter()
    run(k, x0)
    return time.perf_counter() - t0


def bench_unit_rates():
    """Per-chip Poseidon hashes/s and NTT butterflies/s (BASELINE.md),
    measured device-resident with dependency-chained reps."""
    import jax
    import numpy as np

    from eigen_zkvm_tpu.ops import ntt_jax

    rng = np.random.default_rng(7)
    P = 0xFFFFFFFF00000001
    out = {}
    reps = 3

    nbits, npols = 20, 8
    vals = rng.integers(0, 2**63, size=(1 << nbits, npols),
                        dtype=np.uint64) % np.uint64(P)
    pair = _device_pair(vals)  # device-resident BEFORE the timed loop

    def one_interp(pr):
        r = ntt_jax.interpolate(pr, nbits, nbits + 1)
        return (r[0][: 1 << nbits], r[1][: 1 << nbits])

    run = _timed_chain(one_interp)
    dt = _chain_delta(run, pair, reps)
    n, ne = 1 << nbits, 1 << (nbits + 1)
    butterflies = (n // 2 * nbits + ne // 2 * (nbits + 1)) * npols
    out["ntt_butterflies_per_s"] = round(butterflies / dt)
    # interpolate = ~7 full HBM passes (3 fused kernels + transposes +
    # scale/pad) over the [n..n_ext, P] pair arrays
    traffic = 7 * 2 * (ne * npols * 8)
    out["ntt_pct_of_hbm_roofline"] = round(
        100 * traffic / dt / (HBM_PEAK_GBPS * 1e9), 1)

    from eigen_zkvm_tpu.ops import poseidon_jax as pj

    height = 1 << 20
    vals = rng.integers(0, 2**63, size=(12, height),
                        dtype=np.uint64) % np.uint64(P)
    lo, hi = _device_pair(vals)

    def one_perm(pr):
        from eigen_zkvm_tpu.ops import poseidon_mxu as pm

        if jax.default_backend() == "tpu":
            return pm.permute_t(pr[0], pr[1], block=1024)
        st = pj.permute((pr[0].T, pr[1].T))
        return (st[0].T, st[1].T)

    run = _timed_chain(one_perm)
    dt = _chain_delta(run, (lo, hi), reps)
    out["poseidon_gl_perms_per_s"] = round(height / dt)
    out["poseidon_gl_hashes_per_s"] = out["poseidon_gl_perms_per_s"]
    out["poseidon_pct_of_vpu_peak"] = round(
        100 * height * GL_MULS_PER_POSEIDON * OPS_PER_GL_MUL / dt
        / VPU_PEAK_U32_OPS, 1)
    return out


def bench_msm_rates(device: bool):
    """BN254 G1 MSM points/s: host (AVX-512/IFMA C++ Pippenger) at 2^17
    and the TPU double-and-add path at 2^14 (bounded probe; promoted to
    2^17 only if it already beats the host rate).  The recorded winner is
    groth16's default engine (host today — ops/ec_jax.py stays opt-in via
    EIGEN_ZKVM_TPU_MSM=1, see groth16/groth16.py _msm)."""
    import random

    from eigen_zkvm_tpu.curves import bn254

    out = {}
    n_host = 1 << 17
    n_tpu = 1 << 14
    rng = random.Random(11)
    # distinct doubling chain of 4096 points, tiled (MSM cost does not
    # depend on point distinctness; building 2^17 distinct points in
    # python bigints would dominate the bench)
    base = []
    acc = bn254.g1_from_affine(bn254.G1_GEN)
    for _ in range(4096):
        base.append(bn254.g1_to_affine(acc))
        acc = bn254.g1_double(acc)
    points = (base * ((n_host + 4095) // 4096))[:n_host]
    scalars = [rng.randrange(bn254.R) for _ in range(n_host)]
    try:
        from eigen_zkvm_tpu import native

        nat = native.ec_bn254
    except Exception:
        nat = None
    if nat is not None:
        try:
            raw = nat.prep_g1(points)  # key marshalling is prove-time-amortized
            t0 = time.perf_counter()
            nat.g1_msm(points, scalars, pts=raw)
            dt = time.perf_counter() - t0
            out["msm_points_per_s_host"] = round(n_host / dt)
            out["msm_host_n"] = n_host
        except Exception as e:
            out["msm_host_error"] = f"{type(e).__name__}: {e}"
    if device:
        try:
            from eigen_zkvm_tpu.ops import ec_jax

            pts_t, sc_t = points[:n_tpu], scalars[:n_tpu]
            ec_jax.msm(pts_t, sc_t)  # compile + transfer warm-up
            t0 = time.perf_counter()
            ec_jax.msm(pts_t, sc_t)
            dt = time.perf_counter() - t0
            out["msm_points_per_s_tpu"] = round(n_tpu / dt)
            out["msm_tpu_n"] = n_tpu
            if out["msm_points_per_s_tpu"] > out.get(
                    "msm_points_per_s_host", 0):
                t0 = time.perf_counter()
                ec_jax.msm(points, scalars)
                dt = time.perf_counter() - t0
                out["msm_points_per_s_tpu"] = round(n_host / dt)
                out["msm_tpu_n"] = n_host
        except Exception as e:
            out["msm_tpu_error"] = f"{type(e).__name__}: {e}"
    rates = [v for k, v in out.items() if k.startswith("msm_points")]
    if rates:
        out["msm_points_per_s"] = max(rates)
        out["msm_default_engine"] = (
            "host" if out.get("msm_points_per_s_host", 0)
            >= out.get("msm_points_per_s_tpu", 0) else "tpu")
    return out


def start_scaling():
    """SPMD scaling measurement on the 8-virtual-device CPU mesh as a
    subprocess, launched after ALL timed sections (single host core);
    output goes to temp files, not pipes, so a chatty child can never
    block on a full pipe buffer mid-benchmark."""
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               PALLAS_AXON_REMOTE_COMPILE="0")
    fout = tempfile.NamedTemporaryFile(mode="w+", suffix=".out", delete=False)
    ferr = tempfile.NamedTemporaryFile(mode="w+", suffix=".err", delete=False)
    proc = subprocess.Popen([sys.executable, "scripts/bench_scaling.py"],
                            stdout=fout, stderr=ferr, text=True, env=env,
                            cwd=here)
    return proc, fout.name, ferr.name


_EMITTED = False
_STATE = {"value": None, "extra": {}}


def _emit():
    """Print the one JSON line exactly once (main path OR watchdog)."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    fib = _STATE["value"]
    print(json.dumps({
        "metric": "fib_gl_2e10_estark_prove",
        "value": round(fib, 4) if fib else None,
        "unit": "s",
        "vs_baseline": round(BASELINE_S / fib, 4) if fib else None,
        "extra": _STATE["extra"],
    }), flush=True)


def _arm_watchdog(deadline: float):
    """The round-3 bench ran past the driver's timeout and recorded
    NOTHING (BENCH_r03 rc=124, no JSON line).  A daemon thread now
    guarantees the line is printed with whatever has been measured so
    far, then hard-exits — a wedged device call cannot eat the round's
    evidence again."""
    import threading

    def guard():
        while time.monotonic() < deadline:
            time.sleep(2.0)
        _STATE["extra"]["bench_watchdog_fired"] = True
        _emit()
        os._exit(0)

    threading.Thread(target=guard, daemon=True).start()


def main():
    t_start = time.monotonic()
    budget = float(os.environ.get("EIGEN_BENCH_BUDGET_S", "1500"))
    deadline = t_start + budget
    _arm_watchdog(deadline)
    extra = _STATE["extra"]
    stage_s = extra.setdefault("bench_stage_s", {})

    def stamp(name, t0):
        stage_s[name] = round(time.monotonic() - t0, 1)
        return time.monotonic()

    # ---- primary metric first, with nothing else running on the box
    t0 = time.monotonic()
    _STATE["value"] = bench_fib()
    t0 = stamp("fib", t0)

    # ---- budget plan (round-4 verdict #3): cheap tracked metrics FIRST
    # (unit rates ~seconds, MSM ~seconds), committed big-prove artifacts
    # embedded unconditionally, and live device-prove attempts LAST with
    # whatever budget remains — a 20-minute cold compile can no longer
    # starve the artifact of the BASELINE-tracked numbers.
    here = os.path.dirname(os.path.abspath(__file__))
    for key, fname in (("chain_gl_2e23x8_tpu_prove_precomputed",
                        "BENCH_2E23.json"),
                       ("zkvm_e2e_precomputed", "BENCH_ZKVM_E2E.json"),
                       ("rv32_machine_tpu_chunk_precomputed",
                        "BENCH_RV32_TPU.json")):
        try:
            with open(os.path.join(here, fname)) as f:
                extra[key] = json.load(f)
        except Exception:
            pass
    try:
        from eigen_zkvm_tpu.stark.engine import _device_present

        device = _device_present()
    except Exception:
        device = False
    if device:
        try:
            from eigen_zkvm_tpu.stark.engine import Engine

            extra["tpu_engine"] = repr(Engine(21))
            extra.update(bench_unit_rates())
            t0 = stamp("unit_rates", t0)
        except Exception as e:  # record, never break the primary metric
            extra["tpu_error"] = f"{type(e).__name__}: {e}"
    try:
        if time.monotonic() < deadline - 120:
            extra.update(bench_msm_rates(device))
            t0 = stamp("msm", t0)
    except Exception as e:
        extra["msm_error"] = f"{type(e).__name__}: {e}"
    if device:
        try:
            if time.monotonic() < deadline - 300:
                # r02 recorded 14.86 s / r04 23.21 s for this same AIR: the
                # r04 number was ONE warm rep right after 1383 s of cold
                # compiles (deadline pressure, tunnel variance) and sits on
                # the Pallas auto-route added in r03 (a7c98f3).  A/B with
                # EIGEN_ZKVM_NTT=ladder when investigating; r05 also
                # removed two warm-path transfers (cm4_2ns download,
                # domain-vector uploads) that both rounds paid.
                warm, cold = bench_tpu_prove(nbits=20, reps=1,
                                             deadline=deadline)
                if warm is not None:
                    extra["chain_gl_2e20x8_tpu_prove_s"] = round(warm, 2)
                extra["chain_gl_2e20x8_tpu_prove_cold_s"] = round(cold, 2)
                t0 = stamp("tpu_2e20", t0)
            # the live 2^23 attempt only with enough budget for warm+cold
            # (cold compiles alone took 1383 s in r04); the committed
            # BENCH_2E23.json above is the evidence either way
            if time.monotonic() < deadline - 1300:
                warm, cold = bench_tpu_prove(nbits=23, reps=1,
                                             deadline=deadline)
                if warm is not None:
                    extra["chain_gl_2e23x8_tpu_prove_s"] = round(warm, 2)
                extra["chain_gl_2e23x8_tpu_prove_cold_s"] = round(cold, 2)
                t0 = stamp("tpu_2e23", t0)
        except Exception as e:
            extra["tpu_prove_error"] = f"{type(e).__name__}: {e}"
    # the SPMD scaling measurement runs LAST and alone: this box has ONE
    # host core, so "concurrent" subprocesses corrupt every host-side
    # timing (round-2 verdict weak #1, generalized).  If the remaining
    # budget cannot cover a fresh run, embed the committed artifact
    # (scripts/bench_scaling.py output — XLA cost analysis, deterministic
    # per program) clearly labeled as precomputed.
    scaling = None
    try:
        scaling = start_scaling()
    except Exception:
        pass
    if scaling is not None:
        proc, out_path, err_path = scaling
        try:
            left = deadline - time.monotonic() - 30.0
            if left < 30.0:
                raise TimeoutError("no budget left for a fresh scaling run")
            proc.wait(timeout=left)
            with open(out_path) as f:
                lines = [ln for ln in f.read().strip().splitlines() if ln]
            extra["multichip_scaling"] = json.loads(lines[-1])
        except Exception as e:
            proc.kill()
            extra["scaling_error"] = f"{type(e).__name__}: {e}"
            try:
                here = os.path.dirname(os.path.abspath(__file__))
                with open(os.path.join(here, "BENCH_SCALING.json")) as f:
                    extra["multichip_scaling"] = json.load(f)
                extra["multichip_scaling"]["source"] = (
                    "precomputed committed artifact (BENCH_SCALING.json; "
                    "XLA cost analysis, deterministic per program)")
            except Exception:
                pass
        finally:
            for p in (out_path, err_path):
                try:
                    os.unlink(p)
                except OSError:
                    pass

    _emit()


if __name__ == "__main__":
    main()
