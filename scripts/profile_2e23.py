"""Warm-stage profile + utilization accounting for the north-star device
prove (round-4 verdict #2: "nobody can say where the 546 s go").

Runs the 2^nbits x width chain-AIR prove on the device engine twice
(cold, then warm) with per-stage sync ticks, then writes BENCH_2E23.json
with BOTH stage tables and an explicit utilization section: counted NTT
butterflies and Poseidon permutations for the whole prove, the implied
end-to-end rates, and the %-of-own-kernel-peak (the raw Pallas kernels
sustain ~117 G butterflies/s and ~12.2 M perm/s on this chip — the gap
between those and the prove-wide rates IS the overhead budget:
dispatch/tunnel RTT, non-NTT stages, gathers).

Usage: python scripts/profile_2e23.py [--nbits 23] [--width 8] [--reps 1]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

os.environ.setdefault("EIGEN_ZKVM_PROFILE", "1")
os.environ.setdefault("EIGEN_ZKVM_SYNC", "1")

KERNEL_NTT_BPS = 117e9     # measured raw radix-8 Pallas rate (README)
KERNEL_POS_PPS = 12.2e6    # measured MXU Poseidon rate (README)


def counted_work(si, ss, width: int):
    """(butterflies, poseidon perms) for one whole prove of the chain AIR."""
    nb, ne = ss.nBits, ss.nBitsExt
    N, Next = 1 << nb, 1 << ne

    def interp_b(w):
        return (nb * (N // 2) + ne * (Next // 2)) * w

    def ntt_b(nbits, w):
        return nbits * ((1 << nbits) // 2) * w

    total_b = 0
    # stage1 commit (cm1) — cm2/cm3 are empty for the chain AIR
    total_b += interp_b(width)
    # q split: iNTT over ext + NTT back, q_dim/q_deg columns
    total_b += ntt_b(ne, si.q_dim) + ntt_b(ne, si.q_dim * si.q_deg)
    # LEv/LpEv (2 iNTTs of size N over 3 coords)
    total_b += 2 * ntt_b(nb, 3)
    # FRI folds: step si folds 2^pol_bits -> 2^step.nBits (batched group
    # iNTT over 3 coords)
    pol_bits = ne
    for st in ss.steps[1:]:
        red = pol_bits - st.nBits
        total_b += red * ((1 << pol_bits) // 2) * 3
        pol_bits = st.nBits

    def tree_perms(height, w):
        return height * ((w + 7) // 8) + height  # leaves + internal

    total_p = tree_perms(Next, width)                       # tree1
    total_p += tree_perms(Next, si.q_dim * si.q_deg)        # tree4
    pol_bits = ne
    for i, st in enumerate(ss.steps[1:], 1):
        gsz = (1 << ss.steps[i - 1].nBits) // (1 << st.nBits)
        total_p += tree_perms(1 << st.nBits, gsz * 3)
        pol_bits = st.nBits
    return total_b, total_p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nbits", type=int, default=23)
    ap.add_argument("--width", type=int, default=8)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("-o", default=os.path.join(os.path.dirname(HERE),
                                               "BENCH_2E23.json"))
    args = ap.parse_args()
    log_path = f"/tmp/profile_2e{args.nbits}.jsonl"
    if os.path.exists(log_path):
        os.unlink(log_path)
    os.environ["EIGEN_ZKVM_LOG"] = log_path

    from bench_big import build_chain_air

    from eigen_zkvm_tpu.stark.engine import Engine
    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.stark_verify import stark_verify
    from eigen_zkvm_tpu.stark.types import StarkStruct, Step

    nb, w = args.nbits, args.width
    pil, const_pols, cm = build_chain_air(nb, w)
    steps = []
    cur = nb + 1
    while cur > 4:
        steps.append(Step(cur))
        cur -= 5
    steps.append(Step(cur))
    ss = StarkStruct(nBits=nb, nBitsExt=nb + 1, nQueries=8,
                     verificationHashType="GL", steps=steps)
    t0 = time.perf_counter()
    setup = StarkSetup(const_pols, pil, ss)
    print(f"setup: {time.perf_counter() - t0:.1f}s", flush=True)

    walls = []
    for rep in range(args.reps + 1):
        t0 = time.perf_counter()
        proof = stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                          setup.program, ss)
        walls.append(time.perf_counter() - t0)
        print(f"prove[{rep}]: {walls[-1]:.1f}s", flush=True)
    ok = stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                      setup.program)
    assert ok, "proof failed verification"

    # parse per-rep stage tables from the structured log
    stage_runs = []
    cur_run: dict = {}
    with open(log_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("event") == "stark_gen.start":
                cur_run = {}
                stage_runs.append(cur_run)
            elif rec.get("event") == "stark_gen.stage":
                cur_run[rec["stage"]] = rec["wall"]
    cold = stage_runs[0] if stage_runs else {}
    warm = stage_runs[-1] if len(stage_runs) > 1 else {}

    total_b, total_p = counted_work(setup.starkinfo, ss, w)
    warm_total = min(walls[1:]) if len(walls) > 1 else walls[0]
    sol_s = total_b / KERNEL_NTT_BPS + total_p / KERNEL_POS_PPS
    res = {
        "metric": f"chain_gl_2e{nb}x{w}_tpu_prove",
        "value": round(warm_total, 2),
        "unit": "s",
        "cold_s": round(walls[0], 2),
        "verified": True,
        "device": "TPU v5e (1 chip, remote tunnel)",
        "engine": repr(Engine(nb + 1)),
        "stages_cold_s": {k: round(v, 1) for k, v in cold.items()},
        "stages_warm_s": {k: round(v, 1) for k, v in warm.items()},
        "utilization": {
            "ntt_butterflies_total": int(total_b),
            "poseidon_perms_total": int(total_p),
            "ntt_b_per_s_e2e": round(total_b / warm_total),
            "poseidon_perm_per_s_e2e": round(total_p / warm_total),
            "kernel_ntt_b_per_s": KERNEL_NTT_BPS,
            "kernel_poseidon_perm_per_s": KERNEL_POS_PPS,
            "speed_of_light_s": round(sol_s, 2),
            "pct_of_speed_of_light": round(100 * sol_s / warm_total, 1),
            "note": "speed_of_light = counted NTT butterflies at the raw "
                    "Pallas kernel rate + counted Poseidon perms at the "
                    "MXU kernel rate; the gap to the warm wall is "
                    "dispatch/tunnel RTT + VM/eval/gather stages",
        },
        "note": "cold run includes one-time XLA compiles through the "
                "remote tunnel; warm is the steady-state number "
                "(scripts/profile_2e23.py)",
    }
    with open(args.o, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
