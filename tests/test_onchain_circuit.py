"""On-chain (BN254) STARK verifier circuit + gl-in-fr gadgets."""
import hashlib
import random

import numpy as np
import pytest

from eigen_zkvm_tpu.curves import bn254
from eigen_zkvm_tpu.fields import f3g
from eigen_zkvm_tpu.hash import poseidon_bn128
from eigen_zkvm_tpu.hash.transcript_bn128 import TranscriptBN128
from eigen_zkvm_tpu.recursion.circuit import CircuitBuilder
from eigen_zkvm_tpu.recursion.gl_in_fr import (GL_P, GlCircuit,
                                               PoseidonFrCircuit,
                                               TranscriptBigCircuit,
                                               _assert_lt_const, sha256_bits)
from eigen_zkvm_tpu.recursion.stark_verifier_circuit_bn import \
    build_final_main
from eigen_zkvm_tpu.stark.polsarray import PolsArray
from eigen_zkvm_tpu.stark.serializer import stark_proof_to_dict
from eigen_zkvm_tpu.stark.stark_gen import stark_gen
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
from eigen_zkvm_tpu.stark.types import StarkStruct, Step, load_pil

from conftest import reference_fixture


def test_gl_in_fr_arithmetic():
    rng = random.Random(11)
    b = CircuitBuilder(prime=bn254.R)
    gl = GlCircuit(b)
    av = np.array([rng.randrange(GL_P) for _ in range(3)], dtype=np.uint64)
    bv = np.array([rng.randrange(GL_P) for _ in range(3)], dtype=np.uint64)
    a3, b3 = gl.f3_input(av), gl.f3_input(bv)
    assert np.array_equal(gl.f3_val(gl.f3_mul(a3, b3)), f3g.mul(av, bv))
    assert np.array_equal(gl.f3_val(gl.f3_inv(a3)), f3g.inv(av))
    x = gl.input64(rng.randrange(GL_P))
    assert gl.mul(x, gl.inv(x)).ival == 1
    assert b.check()


def test_poseidon_fr_and_transcript_match_native():
    rng = random.Random(12)
    b = CircuitBuilder(prime=bn254.R)
    gl = GlCircuit(b)
    pos = PoseidonFrCircuit(b, poseidon_bn128)
    inps = [rng.randrange(bn254.R) for _ in range(16)]
    outs = pos.hash_ex([b.wire(b.sig(v)) for v in inps], b.W(), 17)
    assert [b.val(o) for o in outs] == poseidon_bn128.hash_ex(inps, 0, 17)

    tn = TranscriptBN128()
    vals = [rng.randrange(GL_P) for _ in range(5)]
    tn.put_elements(vals)
    ch = tn.get_field()
    perm = tn.get_permutations(3, 11)
    tc = TranscriptBigCircuit(b, pos, gl)
    for v in vals:
        tc.put(b.wire(b.sig(v)))
    assert [c.ival % GL_P for c in tc.get_field()] == [int(x) for x in ch]
    got = [sum(int(b.val(bit)) << i for i, bit in enumerate(bits))
           for bits in tc.get_permutations(3, 11)]
    assert got == perm
    assert b.check()


def test_sha256_gadget():
    rng = random.Random(13)
    b = CircuitBuilder(prime=bn254.R)
    msg = bytes(rng.randrange(256) for _ in range(52))
    bits = [b.W(k=(byte >> i) & 1) for byte in msg for i in range(7, -1, -1)]
    out = sha256_bits(b, bits)
    digest = 0
    for bit in out:
        digest = (digest << 1) | int(b.val(bit))
    assert digest == int.from_bytes(hashlib.sha256(msg).digest(), "big")
    assert b.check()


def test_compconstant():
    b = CircuitBuilder(prime=bn254.R)
    v = GL_P - 1
    bits = b.bits(b.wire(b.sig(v)), 64, strict=False)
    _assert_lt_const(b, bits, GL_P)  # GL_P - 1 < GL_P holds
    assert b.check()
    with pytest.raises(AssertionError):
        bits2 = b.bits(b.wire(b.sig(GL_P)), 64, strict=False)
        _assert_lt_const(b, bits2, GL_P)


@pytest.mark.slow
def test_final_onchain_circuit_small():
    """BN128-transcript fib proof verified inside the BN254 circuit."""
    pil = load_pil(reference_fixture("fib.pil.json"))
    ss = StarkStruct(nBits=10, nBitsExt=11, nQueries=2,
                     verificationHashType="BN128",
                     steps=[Step(11), Step(5)])
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(
        reference_fixture("fib.const"))
    cm_pols = PolsArray(pil, PolsArray.COMMIT).load(
        reference_fixture("fib.cm"))
    setup = StarkSetup(const_pols, pil, ss)
    proof = stark_gen(cm_pols, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, ss,
                      prover_addr="0x2ab9a8a45559e7bc6e29a1b1af63824b0b6b4d99")
    zkin = stark_proof_to_dict(proof, "BN128")
    b = build_final_main(zkin, setup.starkinfo, setup.program, ss,
                         setup.const_root, poseidon_bn128)
    assert b.check()
    assert b.n_publics == 1
    # public output == sha256(proverAddr || publics) mod r
    addr = int("0x2ab9a8a45559e7bc6e29a1b1af63824b0b6b4d99", 16)
    msg = addr.to_bytes(20, "big")
    for v in zkin["publics"]:
        msg += (int(v) % GL_P).to_bytes(8, "big")
    expect = int.from_bytes(hashlib.sha256(msg).digest(), "big") % bn254.R
    assert b.w[1] == expect
    # tamper: flipped witness bit breaks the system
    b.w[5] = (b.w[5] + 1) % bn254.R
    assert not b.check()


@pytest.mark.slow
def test_final_onchain_circuit_bls12381():
    """BLS12381-transcript proof verified inside the BLS12-381 Fr circuit."""
    from eigen_zkvm_tpu.curves import bls12_381
    from eigen_zkvm_tpu.hash import poseidon_bls12381

    pil = load_pil(reference_fixture("fib.pil.json"))
    ss = StarkStruct(nBits=10, nBitsExt=11, nQueries=2,
                     verificationHashType="BLS12381",
                     steps=[Step(11), Step(5)])
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(
        reference_fixture("fib.const"))
    cm_pols = PolsArray(pil, PolsArray.COMMIT).load(
        reference_fixture("fib.cm"))
    setup = StarkSetup(const_pols, pil, ss)
    proof = stark_gen(cm_pols, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, ss, prover_addr="0xabc")
    zkin = stark_proof_to_dict(proof, "BLS12381")
    b = build_final_main(zkin, setup.starkinfo, setup.program, ss,
                         setup.const_root, poseidon_bls12381,
                         curve_r=bls12_381.R)
    assert b.check()
    assert b.n_publics == 1
