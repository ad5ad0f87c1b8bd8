"""North-star benchmark (BASELINE.md): a 2^23-row GL eSTARK prove.

The reference publishes no number for this size (its GPU prover is closed
source), so this script IS the record: it proves a W-column multiplicative-
chain AIR over 2^nbits rows (blowup x2, GL Merkle), verifies the proof, and
prints a per-stage breakdown plus one JSON line per configuration.

The trace is vectorizable on purpose (c_j[i] = k_j^i, one native prefix
product per column) so trace generation never dominates what we are actually
measuring — commitment + quotient + openings + FRI.

Usage:
  python3 scripts/bench_big.py --nbits 23 --width 8          # host kernels
  EIGEN_ZKVM_TPU_COMMIT=1 EIGEN_ZKVM_TPU_VM=1 \
  python3 scripts/bench_big.py --nbits 23 --width 8          # device path
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def build_chain_air(nbits: int, width: int):
    """W commit pols with c_j' = k_j * c_j off the last row (k_j = j + 2),
    pinned by public inputs c_j(0) = 1."""
    from eigen_zkvm_tpu.fields import gl64 as gl
    from eigen_zkvm_tpu.stark.pil_builder import PilBuilder
    from eigen_zkvm_tpu.stark.polsarray import PolsArray

    p = PilBuilder(nbits)
    islast = p.const_pol("Chain.ISLAST")
    cols = [p.cm_pol(f"Chain.c{j}") for j in range(width)]
    N = 1 << nbits

    one_m = p.sub(p.num(1), p.const(islast))
    for j, c in enumerate(cols):
        end = p.public_input(f"end{j}", p.cm(c), N - 1)
        p.identity(p.sub(p.mul(one_m,
                               p.sub(p.cm(c, True),
                                     p.mul(p.num(j + 2), p.cm(c)))),
                         p.num(0)), "chain.pil", j)
        p.identity(p.sub(p.mul(p.const(islast), p.sub(p.cm(c), end)),
                         p.num(0)), "chain.pil", width + j)
    pil = p.build()

    const_pols = PolsArray(pil, PolsArray.CONSTANT)
    const_pols.buffer[N - 1, islast] = 1

    cm = PolsArray(pil, PolsArray.COMMIT)
    for j, c in enumerate(cols):
        ks = np.full(N, j + 2, dtype=np.uint64)
        ks[0] = 1
        cm.buffer[:, c] = gl.prefix_product(ks)  # k^0, k^1, ..., k^(N-1)
    return pil, const_pols, cm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nbits", type=int, default=23)
    ap.add_argument("--width", type=int, default=8)
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--skip-verify", action="store_true")
    ap.add_argument("--reps", type=int, default=1,
                    help="prove N times; report the LAST run (steady-state: "
                         "device-path compiles are cached per process)")
    args = ap.parse_args()

    from eigen_zkvm_tpu.stark.types import StarkStruct, Step
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_verify import stark_verify

    nb, w = args.nbits, args.width
    t0 = time.perf_counter()
    pil, const_pols, cm = build_chain_air(nb, w)
    t_trace = time.perf_counter() - t0
    print(f"trace gen (2^{nb} x {w}): {t_trace:.2f}s", flush=True)

    steps = []
    cur = nb + 1
    while cur > 4:
        steps.append(Step(cur))
        cur -= 5
    steps.append(Step(cur))
    ss = StarkStruct(nBits=nb, nBitsExt=nb + 1, nQueries=args.queries,
                     verificationHashType="GL", steps=steps)

    t0 = time.perf_counter()
    setup = StarkSetup(const_pols, pil, ss)
    t_setup = time.perf_counter() - t0
    print(f"setup (const tree 2^{nb + 1}): {t_setup:.2f}s", flush=True)

    for rep in range(args.reps):
        t0 = time.perf_counter()
        proof = stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                          setup.program, ss)
        t_prove = time.perf_counter() - t0
        print(f"prove[{rep}]: {t_prove:.2f}s", flush=True)

    ok = True
    if not args.skip_verify:
        t0 = time.perf_counter()
        ok = stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                          setup.program)
        print(f"verify: {time.perf_counter() - t0:.2f}s ok={ok}", flush=True)

    from eigen_zkvm_tpu.stark.engine import Engine

    print(json.dumps({
        "metric": f"chain_gl_2e{nb}x{w}_estark_prove",
        "value": round(t_prove, 2),
        "unit": "s",
        "trace_s": round(t_trace, 2),
        "setup_s": round(t_setup, 2),
        "verified": bool(ok),
        "engine": repr(Engine(nb + 1)),
    }))


if __name__ == "__main__":
    main()
