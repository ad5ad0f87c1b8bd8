"""Interop surfaces: BLS12-381 SNARKs, .r1cs/.wtns files, circom rendering."""
import random

import pytest

from eigen_zkvm_tpu.algebraic.r1cs_file import (circuit_to_r1cs, from_bytes,
                                                load_r1cs, to_bytes)
from eigen_zkvm_tpu.algebraic.witness import (witness_from_bytes,
                                              witness_to_bytes)
from eigen_zkvm_tpu.curves import bls12_381, bn254
from eigen_zkvm_tpu.groth16.groth16 import prove, setup, verify
from eigen_zkvm_tpu.recursion.circuit import CircuitBuilder

from conftest import reference_fixture


def test_bls12_381_pairing_bilinear():
    c = bls12_381
    e1 = c.pairing(c.G1_GEN, c.G2_GEN)
    assert e1 != c.F12_ONE
    assert c.f12_pow(e1, c.R) == c.F12_ONE
    a, b = 4219, 7321
    Pa = c.g1_to_affine(c.g1_mul(c.g1_from_affine(c.G1_GEN), a))
    Qb = c.g2_to_affine(c.g2_mul(c.g2_from_affine(c.G2_GEN), b))
    assert c.pairing(Pa, Qb) == c.f12_pow(e1, a * b % c.R)


def test_groth16_bls12_381():
    c = bls12_381
    b = CircuitBuilder(prime=c.R)
    o = b.public(1007)
    x = b.wire(b.sig(19))
    y = b.wire(b.sig(53))
    b.assert_eq(b.mul(x, y), o)
    pk, vk = setup(c, b.constraints, b.n_vars, b.n_publics)
    pf, pubs = prove(c, pk, b.constraints, b.w)
    assert verify(c, vk, pf, pubs)
    assert not verify(c, vk, pf, [1008])


def test_reference_multiplier_r1cs_groth16():
    r = load_r1cs("/root/reference/test/multiplier.r1cs")
    assert r.prime == bn254.R
    assert from_bytes(to_bytes(r)).constraints == r.constraints
    A, B, C = r.constraints[0]
    P = r.prime
    w = [1, 0, 3, 11]

    def ev(lc):
        return sum(w[s] * coef for s, coef in lc.items()) % P

    for cand in (33, P - 33):
        w[1] = cand
        if (ev(A) * ev(B) - ev(C)) % P == 0:
            break
    assert (ev(A) * ev(B) - ev(C)) % P == 0
    pk, vk = setup(bn254, r.constraints, r.n_wires, r.n_publics)
    pf, pubs = prove(bn254, pk, r.constraints, w)
    assert verify(bn254, vk, pf, pubs)


def test_circuit_r1cs_roundtrip_with_custom_gates():
    from eigen_zkvm_tpu.recursion.circuit import P as GLP

    b = CircuitBuilder()
    pub = b.public(7)
    x = b.wire(b.sig(3))
    b.assert_eq(b.mul(x, x + pub), b.W(k=30))
    st = [b.sig(i + 1) for i in range(12)]
    b.poseidon(st)
    r1cs = circuit_to_r1cs(b)
    r2 = from_bytes(to_bytes(r1cs))
    assert r2.prime == GLP
    assert r2.constraints == r1cs.constraints
    assert r2.custom_gates == [("Poseidon12", [])]
    assert r2.custom_gates_uses[0][1] == r1cs.custom_gates_uses[0][1]


def test_wtns_roundtrip():
    rng = random.Random(9)
    vals = [rng.randrange(bn254.R) for _ in range(20)]
    assert witness_from_bytes(witness_to_bytes(vals, bn254.R)) == vals
    gl_vals = [rng.randrange(1 << 64) for _ in range(20)]
    GLP = 0xFFFFFFFF00000001
    assert witness_from_bytes(witness_to_bytes(gl_vals, GLP)) == \
        [v % GLP for v in gl_vals]


def test_pil2circom_renders_all_variants():
    from eigen_zkvm_tpu.stark.pil2circom import StarkOption, pil2circom
    from eigen_zkvm_tpu.stark.polsarray import PolsArray
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.types import load_pil, load_starkstruct

    pil = load_pil(reference_fixture("fib.pil.json.gl"))
    ss = load_starkstruct(reference_fixture("starkStruct.json.gl"))
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(
        reference_fixture("fib.const.gl"))
    s = StarkSetup(const_pols, pil, ss)
    for opt in (StarkOption(skip_main=True), StarkOption(),
                StarkOption(verkey_input=True),
                StarkOption(verkey_input=True, agg_stage=True)):
        txt = pil2circom(pil, s.const_root, ss, s.starkinfo, s.program, opt)
        assert txt.count("{") == txt.count("}")
        assert "template StarkVerifier()" in txt
        assert "component main" in txt
        assert "Poseidon(12)" in txt


def test_pil2circom_onchain_renders():
    from eigen_zkvm_tpu.stark.pil2circom import StarkOption, pil2circom
    from eigen_zkvm_tpu.stark.polsarray import PolsArray
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.types import load_pil, load_starkstruct

    pil = load_pil(reference_fixture("fib.pil.json"))
    ss = load_starkstruct(reference_fixture("starkStruct.json"))  # BN128
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(
        reference_fixture("fib.const"))
    s = StarkSetup(const_pols, pil, ss)
    for opt in (StarkOption(), StarkOption(verkey_input=True),
                StarkOption(skip_main=True)):
        txt = pil2circom(pil, s.const_root, ss, s.starkinfo, s.program, opt)
        assert txt.count("{") == txt.count("}")
        assert txt.count("(") == txt.count(")")
        assert "PoseidonEx(16,17)" in txt and "BN1toGL3" in txt
        assert "MerkleHash(1," in txt
        if not opt.skip_main:
            assert "Sha256(" in txt and "publicsHash" in txt


def test_pil2circom_output_pinned():
    """Golden-hash pin on the rendered verifier.circom (VERDICT r2 #9):
    the emitted circom is a byte-level interop contract (reference
    stark_verifier_circom.rs) consumed by downstream circom/snark
    tooling — a silent render drift must fail HERE, not in a prover."""
    import hashlib

    from eigen_zkvm_tpu.stark.pil2circom import StarkOption, pil2circom
    from eigen_zkvm_tpu.stark.polsarray import PolsArray
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.types import load_pil, load_starkstruct

    GOLDEN_GL = {
        "plain": "ea98722f0c8adbb1437fe753e2b8cee9"
                 "3036c3aac08255da19dd64450a3a4d12",
        "skip_main": "b30702641ad1dda55a2c523eb884d773"
                     "a4c8911e50b66313945b07f968e99561",
        "verkey": "3354c09d56cbf22071afa23a62a8109d"
                  "5a8b5142ab966d0ba01e5d61511667c1",
        "agg": "f1babe50f85ea10b88f94fbb52930a95"
               "737dcac2f92510fb5151964c098f5b3f",
    }
    pil = load_pil(reference_fixture("fib.pil.json.gl"))
    ss = load_starkstruct(reference_fixture("starkStruct.json.gl"))
    cp = PolsArray(pil, PolsArray.CONSTANT).load(
        reference_fixture("fib.const.gl"))
    s = StarkSetup(cp, pil, ss)
    opts = {"plain": StarkOption(),
            "skip_main": StarkOption(skip_main=True),
            "verkey": StarkOption(verkey_input=True),
            "agg": StarkOption(verkey_input=True, agg_stage=True)}
    for name, opt in opts.items():
        txt = pil2circom(pil, s.const_root, ss, s.starkinfo, s.program, opt)
        got = hashlib.sha256(txt.encode()).hexdigest()
        assert got == GOLDEN_GL[name], (
            f"verifier.circom ({name}) drifted: {got} — if the change is "
            "intentional, re-pin after validating against the reference "
            "renderer byte contract")

    # BN128 (on-chain/top layer) variant
    pil = load_pil(reference_fixture("fib.pil.json"))
    ss = load_starkstruct(reference_fixture("starkStruct.json"))
    cp = PolsArray(pil, PolsArray.CONSTANT).load(
        reference_fixture("fib.const"))
    s = StarkSetup(cp, pil, ss)
    txt = pil2circom(pil, s.const_root, ss, s.starkinfo, s.program,
                     StarkOption())
    got = hashlib.sha256(txt.encode()).hexdigest()
    assert got == ("8c7462913ac63291848056fb3a04b429"
                   "ae942b72d8207cc68e4252cbab3f28cc")
