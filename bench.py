"""Headline benchmark: full eSTARK prove of the fibonacci fixture (2^10 rows).

Matches the reference's published bottom-layer number (starkjs/README.md:63,
0.34 s GL eSTARK prove at 2^10 on an i9-11900).  Prints ONE JSON line:
vs_baseline = baseline_seconds / our_seconds (>1 means faster than reference).
"""
from __future__ import annotations

import json
import time

BASELINE_S = 0.34  # reference bottom-layer GL eSTARK prove, 2^10 (starkjs/README.md:63)
FIXTURES = "/root/reference/starky/data/"


def main():
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

    print(json.dumps({
        "metric": "fib_gl_2e10_estark_prove",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / elapsed, 4),
    }))


if __name__ == "__main__":
    main()
