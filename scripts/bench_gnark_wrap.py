"""Gnark-bridge wrap at REAL scale (round-2 verdict #7): run the FULL
BN254-Groth16-verifier-in-BLS12-381 circuit — the same ~multi-million-
constraint circuit a production full-chain proof wraps through — end to
end (build, setup, prove, verify) and record the wall times.

The inner proof's size does not change the wrap circuit (the verifier
circuit shape is fixed by the vk layout: one pairing check + MSM over
the publics), so a toy inner exercises the full-scale outer prove.
Prints one JSON line; referenced by BENCH extra / README.

Reference analog: recursion-gnark/ffi/go/eigen/recursion.go:30-82.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from eigen_zkvm_tpu.curves import bls12_381 as bls
    from eigen_zkvm_tpu.curves import bn254 as bn
    from eigen_zkvm_tpu.groth16 import groth16 as core
    from eigen_zkvm_tpu.recursion.circuit import CircuitBuilder
    from eigen_zkvm_tpu.recursion.gnark_bridge import build_verifier_circuit
    from eigen_zkvm_tpu.utils import structlog

    out = {}
    b = CircuitBuilder(prime=bn.R)
    out1 = b.public(35)
    out2 = b.public(12)
    x = b.wire(b.sig(5))
    y = b.wire(b.sig(7))
    b.assert_eq(b.mul(x, y), out1)
    b.assert_eq(x + y, out2)
    pk, vk = core.setup(bn, b.constraints, b.n_vars, b.n_publics)
    proof, pubs = core.prove(bn, pk, b.constraints, b.w)
    assert core.verify(bn, vk, proof, pubs)

    t0 = time.perf_counter()
    with structlog.span("gnark_wrap.build_circuit"):
        bc = build_verifier_circuit(vk, proof, pubs)
    out["constraints"] = len(bc.constraints)
    out["n_vars"] = bc.n_vars
    out["build_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    with structlog.span("gnark_wrap.setup", constraints=len(bc.constraints)):
        opk, ovk = core.setup(bls, bc.constraints, bc.n_vars, bc.n_publics)
    out["setup_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    with structlog.span("gnark_wrap.prove", constraints=len(bc.constraints)):
        oproof, opubs = core.prove(bls, opk, bc.constraints, bc.w)
    out["prove_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    ok = core.verify(bls, ovk, oproof, opubs)
    out["verify_s"] = round(time.perf_counter() - t0, 2)
    out["verified"] = bool(ok)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
