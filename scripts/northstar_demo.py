"""North-star end-to-end (BASELINE.md): prove a 2^23-row x 8-column AIR
with the GL eSTARK, then compress it through the full recursion chain to a
constant-size Groth16 proof — the complete "big computation to on-chain
proof" pipeline on one host.

Usage: python scripts/northstar_demo.py [out_dir] [--nbits N] [--width W]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.bench_big import build_chain_air  # noqa: E402
from scripts.full_chain_demo import N_QUERIES, log, main, mk_ss  # noqa: E402

from eigen_zkvm_tpu.stark.serializer import stark_proof_to_dict  # noqa: E402
from eigen_zkvm_tpu.stark.stark_gen import stark_gen  # noqa: E402
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup  # noqa: E402
from eigen_zkvm_tpu.stark.stark_verify import stark_verify  # noqa: E402


def run(out_dir="/tmp/northstar", nbits=23, width=8):
    t0 = time.time()
    pil, const_pols, cm = build_chain_air(nbits, width)
    log("northstar trace gen", t0)
    t0 = time.time()
    ss = mk_ss(nbits, "GL", q=N_QUERIES)
    setup = StarkSetup(const_pols, pil, ss)
    log("northstar setup", t0, n_bits=nbits)
    t0 = time.time()
    proof = stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, ss)
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                        setup.program)
    log(f"northstar L0 eSTARK 2^{nbits}x{width}", t0)
    zkin0 = stark_proof_to_dict(proof, "GL")
    main(out_dir, base=(zkin0, setup, ss))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kw = {}
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--nbits":
            kw["nbits"] = int(argv[i + 1])
        if a == "--width":
            kw["width"] = int(argv[i + 1])
    args = [a for a in args if not a.isdigit()]
    run(*(args or ["/tmp/northstar"]), **kw)
