"""Complete mixed-proof-system chain, end to end, natively:

  fib trace (GL eSTARK)                                  [L0]
   -> c12 compressor proof                               [L1]
   -> recursive1 (normalization) proof                   [L2]
   -> join_zkin(a, b) -> recursive2 (aggregation) proof  [L3]
   -> final GL compressor of the recursive2 proof        [L4]
   -> BN128-transcript eSTARK                            [L5]
   -> on-chain BN254 circuit -> Groth16 proof + verify   [L6]
   -> Solidity verifier render

This is the reference's test/stark_aggregation.sh pipeline (both curves'
headline flow) with every circom/WASM/bellman step replaced by the native
equivalents.  Sized down (2 queries) so it completes in tens of minutes in
pure Python; the TPU/native kernels accelerate the same code paths.

Usage: python scripts/full_chain_demo.py [out_dir] [--curve bn128|bls12381]

`--curve bls12381` runs the reference's simple_bls.sh variant: the final
eSTARK uses the BLS12-381 transcript and the wrap is a BLS12-381 Groth16.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from eigen_zkvm_tpu.curves import bn254  # noqa: E402
from eigen_zkvm_tpu.groth16 import api as g16api  # noqa: E402
from eigen_zkvm_tpu.groth16 import groth16 as g16  # noqa: E402
from eigen_zkvm_tpu.hash import poseidon_bn128  # noqa: E402
from eigen_zkvm_tpu.recursion.compressor12 import (  # noqa: E402
    StarkOption, prove_compressed)
from eigen_zkvm_tpu.recursion.stark_verifier_circuit_bn import (  # noqa: E402
    build_final_main)
from eigen_zkvm_tpu.stark.polsarray import PolsArray  # noqa: E402
from eigen_zkvm_tpu.stark.serializer import (  # noqa: E402
    join_zkin, stark_proof_to_dict)
from eigen_zkvm_tpu.stark.stark_gen import stark_gen  # noqa: E402
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup  # noqa: E402
from eigen_zkvm_tpu.stark.stark_verify import stark_verify  # noqa: E402
from eigen_zkvm_tpu.stark.types import (  # noqa: E402
    StarkStruct, Step, load_pil)

D = "/root/reference/starky/data/"
N_QUERIES = 2
PROVER_ADDR = "0x2ab9a8a45559e7bc6e29a1b1af63824b0b6b4d99"


def mk_ss(n_bits, hash_type="GL", q=N_QUERIES):
    steps = []
    nb = n_bits + 1
    while nb > 5:
        steps.append(Step(nb))
        nb -= 4
    steps.append(Step(nb))
    return StarkStruct(nBits=n_bits, nBitsExt=n_bits + 1, nQueries=q,
                       verificationHashType=hash_type, steps=steps)


def log(stage, t0, **kw):
    print(f"[{time.strftime('%H:%M:%S')}] {stage} "
          f"({time.time() - t0:.1f}s) {kw}", flush=True)


def main(out_dir="/tmp/full_chain", curve_name="bn128", base=None):
    """`base`: optional (zkin0, setup0, base_ss) from an externally proven
    L0 (e.g. scripts/northstar_demo.py's 2^23-row AIR); defaults to the
    reference fibonacci fixture."""
    os.makedirs(out_dir, exist_ok=True)
    total0 = time.time()

    # L0: base trace proof
    t0 = time.time()
    if base is not None:
        zkin0, setup0, base_ss = base
        log("L0 base eSTARK (external)", t0, publics=zkin0["publics"])
    else:
        pil = load_pil(D + "fib.pil.json.gl")
        base_ss = StarkStruct(nBits=10, nBitsExt=11, nQueries=N_QUERIES,
                              verificationHashType="GL",
                              steps=[Step(11), Step(5)])
        const_pols = PolsArray(pil, PolsArray.CONSTANT).load(
            D + "fib.const.gl")
        cm_pols = PolsArray(pil, PolsArray.COMMIT).load(D + "fib.cm.gl")
        setup0 = StarkSetup(const_pols, pil, base_ss)
        proof0 = stark_gen(cm_pols, const_pols, setup0.const_tree,
                           setup0.starkinfo, setup0.program, base_ss)
        zkin0 = stark_proof_to_dict(proof0, "GL")
        log("L0 base eSTARK", t0, publics=zkin0["publics"])

    # L1: c12
    t0 = time.time()
    p1, (s1, ss1, ps1) = prove_compressed(
        zkin0, setup0, base_ss, StarkOption(skip_main=True),
        n_queries=N_QUERIES)
    zkin1 = stark_proof_to_dict(p1, "GL")
    log("L1 c12", t0, n_bits=ps1.n_bits)

    # L2: recursive1 (normalization)
    t0 = time.time()
    p2, (s2, ss2, ps2) = prove_compressed(zkin1, s1, ss1, StarkOption(),
                                          n_queries=N_QUERIES)
    zkin2 = stark_proof_to_dict(p2, "GL")
    log("L2 recursive1", t0, n_bits=ps2.n_bits, publics=len(zkin2["publics"]))

    # L3: aggregation of two recursive1 proofs
    t0 = time.time()
    joined = join_zkin(zkin2, zkin2)
    with open(f"{out_dir}/r01_input.zkin.json", "w") as f:
        json.dump(joined, f)
    p3, (s3, ss3, ps3) = prove_compressed(
        joined, s2, ss2, StarkOption(verkey_input=True, agg_stage=True),
        n_queries=N_QUERIES)
    zkin3 = stark_proof_to_dict(p3, "GL")
    log("L3 recursive2 (agg)", t0, n_bits=ps3.n_bits)

    # L4+L5: final GL compressor, proven with the snark curve's transcript
    if curve_name == "bls12381":
        from eigen_zkvm_tpu.curves import bls12_381 as snark_curve
        from eigen_zkvm_tpu.hash import poseidon_bls12381 as pbn_mod
        hash_type = "BLS12381"
    else:
        snark_curve = bn254
        pbn_mod = poseidon_bn128
        hash_type = "BN128"
    t0 = time.time()
    circuit4, ps4 = None, None
    from eigen_zkvm_tpu.recursion.compressor12 import (compressor12_setup,
                                                       exec_witness)
    opt4 = StarkOption(verkey_input=True)
    circuit4, ps4 = compressor12_setup(zkin3, s3, ss3, opt4)
    cm4 = exec_witness(circuit4, ps4)
    final_ss = mk_ss(ps4.n_bits, hash_type)
    setup4 = StarkSetup(ps4.const_pols, ps4.pil, final_ss)
    p4 = stark_gen(cm4, ps4.const_pols, setup4.const_tree, setup4.starkinfo,
                   setup4.program, final_ss, prover_addr=PROVER_ADDR)
    assert stark_verify(p4, setup4.const_root, setup4.starkinfo, final_ss,
                        setup4.program)
    zkin4 = stark_proof_to_dict(p4, hash_type)
    with open(f"{out_dir}/final.zkin.json", "w") as f:
        json.dump(zkin4, f)
    log(f"L4+L5 final {hash_type} eSTARK", t0, n_bits=ps4.n_bits,
        publics=len(zkin4["publics"]))

    # L6: on-chain circuit + Groth16
    t0 = time.time()
    b = build_final_main(zkin4, setup4.starkinfo, setup4.program, final_ss,
                         setup4.const_root, pbn_mod,
                         curve_r=snark_curve.R)
    assert b.check()
    log("L6a on-chain circuit", t0, n_vars=b.n_vars,
        constraints=len(b.constraints))

    t0 = time.time()
    pk, vk = g16.setup(snark_curve, b.constraints, b.n_vars, b.n_publics)
    log("L6b groth16 setup", t0, domain=pk.domain_size)
    t0 = time.time()
    g16_proof, publics = g16.prove(snark_curve, pk, b.constraints, b.w)
    log("L6c groth16 prove", t0)
    t0 = time.time()
    ok = g16.verify(snark_curve, vk, g16_proof, publics)
    assert ok, "groth16 verification failed"
    assert not g16.verify(snark_curve, vk, g16_proof,
                          [(publics[0] + 1) % snark_curve.R])
    log("L6d groth16 verify", t0, ok=ok)

    with open(f"{out_dir}/g16.vk.json", "w") as f:
        f.write(g16api.vk_to_json(vk))
    with open(f"{out_dir}/g16.proof.json", "w") as f:
        f.write(g16api.proof_to_json(g16_proof, curve_name))
    with open(f"{out_dir}/verifier.sol", "w") as f:
        f.write(g16api.generate_verifier_from_vk(vk))
    print(f"TOTAL {time.time() - total0:.1f}s — FULL MIXED CHAIN OK; "
          f"artifacts in {out_dir}", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    curve = "bn128"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--curve":
            curve = sys.argv[1:][i + 1]
        elif a.startswith("--curve="):
            curve = a.split("=", 1)[1]
    args = [a for a in args if a not in ("bn128", "bls12381")]
    main(*(args or ["/tmp/full_chain"]), curve_name=curve)
