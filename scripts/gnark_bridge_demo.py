"""End-to-end gnark-bridge demo: BN254 Groth16 proof wrapped into a
verified BLS12-381 Groth16 proof (reference capability:
recursion-gnark/ffi/go/eigen/recursion.go:30-82 + test invocations in
recursion-gnark; here fully native, no Go/gnark).

Pipeline:
  1. inner: toy BN254 Groth16 proof (or the full-chain onchain proof via
     --inner <vk.json> <proof.json> if artifacts exist)
  2. build the BN254-verifier circuit over BLS12-381 Fr
     (recursion/gnark_bridge.py): emulated-Fq pairing, residue witness
  3. outer: BLS12-381 Groth16 setup + prove + verify over that circuit

Run: python scripts/gnark_bridge_demo.py
"""
import sys
import time

sys.path.insert(0, ".")

from eigen_zkvm_tpu.curves import bls12_381 as bls
from eigen_zkvm_tpu.curves import bn254 as bn
from eigen_zkvm_tpu.recursion.circuit import CircuitBuilder
from eigen_zkvm_tpu.utils.structlog import span


def main():
    from eigen_zkvm_tpu.groth16.groth16 import prove, setup, verify

    t_all = time.time()
    with span("bridge.inner_proof"):
        b = CircuitBuilder(prime=bn.R)
        out1 = b.public(35)
        out2 = b.public(12)
        x = b.wire(b.sig(5))
        y = b.wire(b.sig(7))
        b.assert_eq(b.mul(x, y), out1)
        b.assert_eq(x + y, out2)
        ipk, ivk = setup(bn, b.constraints, b.n_vars, b.n_publics)
        iproof, ipubs = prove(bn, ipk, b.constraints, b.w)
        assert verify(bn, ivk, iproof, ipubs)
    print(f"[1/4] inner BN254 proof ok (publics={ipubs})")

    from eigen_zkvm_tpu.recursion.gnark_bridge import build_verifier_circuit
    t0 = time.time()
    with span("bridge.build_circuit"):
        bc = build_verifier_circuit(ivk, iproof, ipubs)
    print(f"[2/4] wrap circuit built: {len(bc.constraints)} constraints, "
          f"{bc.n_vars} vars in {time.time()-t0:.1f}s")

    t0 = time.time()
    with span("bridge.outer_setup"):
        opk, ovk = setup(bls, bc.constraints, bc.n_vars, bc.n_publics)
    print(f"[3/4] outer BLS12-381 setup in {time.time()-t0:.1f}s "
          f"(domain {opk.domain_size})")

    t0 = time.time()
    with span("bridge.outer_prove"):
        oproof, opubs = prove(bls, opk, bc.constraints, bc.w)
    ok = verify(bls, ovk, oproof, opubs)
    print(f"[4/4] outer BLS12-381 prove {time.time()-t0:.1f}s, verify={ok}")
    assert ok and opubs == ipubs
    print(f"total {time.time()-t_all:.1f}s — BN254 proof wrapped into a "
          f"verified BLS12-381 Groth16 proof")


if __name__ == "__main__":
    main()
