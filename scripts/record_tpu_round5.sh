#!/bin/bash
# One-shot recorder for the round-5 device evidence, in priority order.
# Run with the TPU tunnel alive and NOTHING else on the box:
#   bash scripts/record_tpu_round5.sh
# Each step is independently resumable; compiles persist in the jax cache.
#
# Measured reality (2026-08-21, tunnel restored): step 2 is the long pole
# on a cold cache — the real RV32 machine PIL's stage-1 commit alone is
# ~1549 s cold (dozens of remote XLA compiles for the sliced VM + commit
# programs at 2^16/2^17), so the first pass exists mostly to FILL the
# persistent compile cache; a second pass re-runs warm and is the one
# whose stage split lands in BENCH_RV32_TPU.json.  Budget step 2 at
# >=2x its timeout when the cache is empty, or run it twice.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site

# 1. North-star warm profile + utilization accounting -> BENCH_2E23.json
timeout 7000 python scripts/profile_2e23.py --nbits 23 --width 8 --reps 1 \
    2>&1 | tail -20

# 2. Real zkVM machine chunk on the device engine -> BENCH_RV32_TPU.json
EIGEN_ZKVM_ENGINE=tpu EIGEN_ZKVM_PROFILE=1 EIGEN_ZKVM_SYNC=1 \
EIGEN_ZKVM_LOG=/tmp/rv32_tpu.jsonl \
timeout 10000 python scripts/prove_ecrecover.py --nbits 16 --chunks 0 \
    -o BENCH_RV32_TPU.json 2>&1 | tail -20

# 3. 2^20 regression A/B: pallas route vs XLA ladder (warm reps)
EIGEN_ZKVM_NTT=pallas timeout 3000 python scripts/bench_big.py \
    --nbits 20 --width 8 --reps 2 2>&1 | tail -4
EIGEN_ZKVM_NTT=ladder timeout 3000 python scripts/bench_big.py \
    --nbits 20 --width 8 --reps 2 2>&1 | tail -4

# 4. Unit kernel rates -> committed artifact for the README citations
timeout 1800 python scripts/unit_bench.py 2>/dev/null \
    | grep '^{' > BENCH_UNITS.jsonl && cat BENCH_UNITS.jsonl
