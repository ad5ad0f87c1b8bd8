"""Gnark-bridge equivalent: BN254 Groth16 verified inside a BLS12-381
circuit (reference: recursion-gnark/ffi/go/eigen/recursion.go:30-82)."""
import random

import pytest

from eigen_zkvm_tpu.curves import bls12_381 as bls
from eigen_zkvm_tpu.curves import bn254 as bn
from eigen_zkvm_tpu.recursion.circuit import CircuitBuilder
from eigen_zkvm_tpu.recursion.emulated import EmuField
from eigen_zkvm_tpu.recursion.pairing_circuit import (
    FROB1, FROB2, LAMBDA, PairingCircuit, flat12, one_hot_w27,
    residue_witness, unflat12, w27_constant)


def test_emulated_field_ops():
    rng = random.Random(42)
    p = bn.P
    b = CircuitBuilder(prime=bls.R)
    F = EmuField(b, p)
    xs = [rng.randrange(p) for _ in range(8)]
    es = [F.input(v) for v in xs]
    assert F.val(F.mul(es[0], es[1])) == xs[0] * xs[1] % p
    acc = F.new_acc()
    F.acc_mul(acc, es[0], es[1])
    F.acc_mul(acc, es[2], es[3], -1)
    F.acc_elem(acc, es[4], 3)
    assert F.val(F.reduce(acc)) == (xs[0] * xs[1] - xs[2] * xs[3]
                                    + 3 * xs[4]) % p
    assert F.val(F.div(es[5], es[6])) == xs[5] * pow(xs[6], -1, p) % p
    F.assert_eq(F.add(es[0], es[1]), F.add(es[1], es[0]))
    assert b.check()
    # tampering any emulated witness value must break satisfaction
    b.w[5] = (b.w[5] + 1) % bls.R
    assert not b.check()


def test_fq12_tower_and_frobenius():
    rng = random.Random(11)
    a = unflat12([rng.randrange(bn.P) for _ in range(12)])
    c = unflat12([rng.randrange(bn.P) for _ in range(12)])
    b = CircuitBuilder(prime=bls.R)
    pc = PairingCircuit(b)
    ea, ec = pc.f12_input(a), pc.f12_input(c)
    assert pc.f12_val(pc.f12_mul(ea, ec)) == bn.f12_mul(a, c)
    assert pc.f12_val(pc.f12_sq(ea)) == bn.f12_mul(a, a)
    assert pc.f12_val(pc.f12_frobenius(ea, FROB1)) == bn.f12_frobenius(a)
    assert pc.f12_val(pc.f12_frobenius(ea, FROB2)) == \
        bn.f12_frobenius(bn.f12_frobenius(a))
    assert b.check()


def test_point_gadgets_match_value_impl():
    rng = random.Random(7)
    b = CircuitBuilder(prime=bls.R)
    pc = PairingCircuit(b)
    Qa = bn.g2_to_affine(bn.g2_mul(bn.g2_from_affine(bn.G2_GEN),
                                   rng.randrange(bn.R)))
    eq = pc.g2_input(Qa)
    pc.g2_assert_on_curve(eq)
    T2, _, _ = pc.g2_double(eq)
    assert pc.g2_val(T2) == bn.g2_to_affine(
        bn.g2_double(bn.g2_from_affine(Qa)))
    T3, _, _ = pc.g2_add(T2, eq)
    assert pc.g2_val(T3) == bn.g2_to_affine(bn.g2_add(
        bn.g2_from_affine(pc.g2_val(T2)), bn.g2_from_affine(Qa)))
    Pa = bn.g1_to_affine(bn.g1_mul(bn.g1_from_affine(bn.G1_GEN),
                                   rng.randrange(bn.R)))
    Pb = bn.g1_to_affine(bn.g1_mul(bn.g1_from_affine(bn.G1_GEN),
                                   rng.randrange(bn.R)))
    ep, ep2 = pc.g1_input(Pa), pc.g1_input(Pb)
    pc.g1_assert_on_curve(ep)
    assert pc.g1_val(pc.g1_add(ep, ep2)) == bn.g1_to_affine(
        bn.g1_add(bn.g1_from_affine(Pa), bn.g1_from_affine(Pb)))
    ws = one_hot_w27(pc, 5)
    assert [0 if x is None else pc.F.val(x) for x in ws] == \
        flat12(bn.f12_pow(w27_constant(), 5))
    assert b.check()


def test_residue_witness_host_math():
    """Completeness + rejection of the residue construction (the in-circuit
    final-exp replacement; 'On Proving Pairings', Novakovic-Eagen 2024)."""
    rng = random.Random(3)
    a, c = rng.randrange(1, bn.R), rng.randrange(1, bn.R)
    P1 = bn.g1_to_affine(bn.g1_mul(bn.g1_from_affine(bn.G1_GEN), a))
    Q1 = bn.g2_to_affine(bn.g2_mul(bn.g2_from_affine(bn.G2_GEN), c))
    P2 = bn.g1_to_affine(bn.g1_mul(bn.g1_from_affine(bn.G1_GEN),
                                   a * c % bn.R))
    Q2n = bn.g2_to_affine(bn.g2_neg(bn.g2_from_affine(bn.G2_GEN)))
    f = bn.f12_mul(bn.miller_loop(P1, Q1), bn.miller_loop(P2, Q2n))
    cw, j = residue_witness(f)
    w = bn.f12_pow(w27_constant(), j)
    assert bn.f12_mul(f, w) == bn.f12_pow(cw, LAMBDA)
    # an invalid pairing product has no residue witness
    bad = bn.f12_mul(f, bn.pairing(bn.G1_GEN, bn.G2_GEN))
    with pytest.raises(ValueError):
        residue_witness(bad)


def _toy_inner_proof():
    from eigen_zkvm_tpu.groth16.groth16 import prove, setup, verify
    b = CircuitBuilder(prime=bn.R)
    out1 = b.public(35)
    out2 = b.public(12)
    x = b.wire(b.sig(5))
    y = b.wire(b.sig(7))
    b.assert_eq(b.mul(x, y), out1)
    b.assert_eq(x + y, out2)
    pk, vk = setup(bn, b.constraints, b.n_vars, b.n_publics)
    proof, pubs = prove(bn, pk, b.constraints, b.w)
    assert verify(bn, vk, proof, pubs)
    return vk, proof, pubs


@pytest.mark.slow
def test_bridge_circuit_satisfied_and_binding():
    """Full wrap circuit: a real BN254 Groth16 proof satisfies it; a forged
    proof fails witness generation; a tampered witness fails the R1CS."""
    from eigen_zkvm_tpu.recursion.gnark_bridge import build_verifier_circuit
    vk, proof, pubs = _toy_inner_proof()
    bc = build_verifier_circuit(vk, proof, pubs)
    assert bc.n_publics == len(pubs)
    assert bc.check()

    # forged proof: flip C -> witness generation must reject
    from eigen_zkvm_tpu.groth16.groth16 import Proof
    bad = Proof(a=proof.a, b=proof.b,
                c=bn.g1_to_affine(bn.g1_double(bn.g1_from_affine(proof.c))))
    with pytest.raises(ValueError):
        build_verifier_circuit(vk, bad, pubs)

    # forged publics -> reject
    with pytest.raises((ValueError, AssertionError)):
        build_verifier_circuit(vk, proof, [pubs[0], (pubs[1] + 1) % bn.R])
