"""Groth16 SNARK layer: BN254 pairing, MSM, prove/verify, JSON, Solidity."""
import random

import pytest

from eigen_zkvm_tpu.curves import bn254
from eigen_zkvm_tpu.curves.msm import msm_g1, msm_g2
from eigen_zkvm_tpu.groth16 import api
from eigen_zkvm_tpu.groth16.groth16 import Proof, prove, setup, verify
from eigen_zkvm_tpu.recursion.circuit import CircuitBuilder


def test_bn254_pairing_bilinear():
    c = bn254
    e1 = c.pairing(c.G1_GEN, c.G2_GEN)
    assert e1 != c.F12_ONE
    assert c.f12_pow(e1, c.R) == c.F12_ONE
    a, b = 9173, 3571
    Pa = c.g1_to_affine(c.g1_mul(c.g1_from_affine(c.G1_GEN), a))
    Qb = c.g2_to_affine(c.g2_mul(c.g2_from_affine(c.G2_GEN), b))
    assert c.pairing(Pa, Qb) == c.f12_pow(e1, a * b % c.R)


def test_msm_matches_naive():
    c = bn254
    rng = random.Random(4)
    g = c.g1_from_affine(c.G1_GEN)
    pts = [c.g1_to_affine(c.g1_mul(g, rng.randrange(c.R))) for _ in range(33)]
    scalars = [rng.randrange(c.R) for _ in range(33)]
    acc = c.G1_ZERO
    for p, s in zip(pts, scalars):
        acc = c.g1_add(acc, c.g1_mul(c.g1_from_affine(p), s))
    assert msm_g1(c, pts, scalars) == c.g1_to_affine(acc)


def _toy_circuit():
    b = CircuitBuilder(prime=bn254.R)
    out1 = b.public(35)
    out2 = b.public(12)
    x = b.wire(b.sig(5))
    y = b.wire(b.sig(7))
    b.assert_eq(b.mul(x, y), out1)
    b.assert_eq(x + y, out2)
    assert b.check()
    return b


@pytest.fixture(scope="module")
def toy_proof():
    b = _toy_circuit()
    pk, vk = setup(bn254, b.constraints, b.n_vars, b.n_publics)
    proof, pubs = prove(bn254, pk, b.constraints, b.w)
    return b, pk, vk, proof, pubs


def test_groth16_prove_verify(toy_proof):
    b, pk, vk, proof, pubs = toy_proof
    assert pubs == [35, 12]
    assert verify(bn254, vk, proof, pubs)


def test_groth16_rejects_wrong_publics(toy_proof):
    _, _, vk, proof, pubs = toy_proof
    assert not verify(bn254, vk, proof, [35, 13])


def test_groth16_rejects_tampered_proof(toy_proof):
    _, _, vk, proof, pubs = toy_proof
    bad = Proof(proof.a, proof.b, (proof.c[0], (-proof.c[1]) % bn254.P))
    assert not verify(bn254, vk, bad, pubs)


def test_json_roundtrip(toy_proof):
    _, _, vk, proof, pubs = toy_proof
    vk2 = api.vk_from_json(api.vk_to_json(vk))
    p2 = api.proof_from_json(api.proof_to_json(proof, "bn128"))
    assert verify(bn254, vk2, p2, api.publics_from_json(
        api.publics_to_json(pubs)))
    # hex mode parses back too
    vk3 = api.vk_from_json(api.vk_to_json(vk, to_hex=True))
    assert vk3.ic == vk.ic


def test_solidity_verifier_render(toy_proof):
    _, _, vk, _, _ = toy_proof
    sol = api.generate_verifier_from_vk(vk)
    assert "library Pairing" in sol and "contract Verifier" in sol
    assert "<%" not in sol
    assert f"new Pairing.G1Point[]({len(vk.ic)})" in sol
    assert str(vk.alpha1[0]) in sol
