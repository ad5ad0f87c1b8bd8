"""WASM witness runtime: circom-emitted .wasm modules execute natively
(algebraic/wasmvm.py interpreter + algebraic/witness_calculator.py ABI) and
their witnesses prove — the native replacement for the reference's wasmer
path (algebraic/src/witness/witness_calculator.rs:114)."""
import pytest

from eigen_zkvm_tpu.algebraic.r1cs_file import load_r1cs
from eigen_zkvm_tpu.algebraic.witness import witness_from_bytes
from eigen_zkvm_tpu.algebraic.witness_calculator import (WitnessCalculator,
                                                         fnv64)
from eigen_zkvm_tpu.algebraic.wasmvm import Trap
from eigen_zkvm_tpu.curves import bls12_381, bn254
from eigen_zkvm_tpu.groth16.groth16 import prove, setup, verify

MULT_WASM = "/root/reference/test/multiplier.wasm"
MULT_R1CS = "/root/reference/test/multiplier.r1cs"
BLS_WASM = "/root/reference/groth16/test-vectors/mycircuit_bls12381.wasm"


def test_fnv64_matches_reference():
    # FnvHasher::default() is FNV-1a 64; pin a couple of well-known values
    assert fnv64("") == (0xCBF29CE4, 0x84222325)
    h = (fnv64("a")[0] << 32) | fnv64("a")[1]
    assert h == 0xAF63DC4C8601EC8C


def test_multiplier_witness_satisfies_r1cs_and_proves():
    wc = WitnessCalculator.from_file(MULT_WASM)
    assert wc.prime == bn254.R and wc.n32 == 8
    w = wc.calculate_witness({"a": 3, "b": 11}, sanity_check=True)
    assert w[0] == 1 and w[1] == 33

    r = load_r1cs(MULT_R1CS)
    assert len(w) == r.n_wires
    P = r.prime
    for A, B, C in r.constraints:
        def ev(lc):
            return sum(w[s] * c for s, c in lc.items()) % P
        assert (ev(A) * ev(B) - ev(C)) % P == 0

    pk, vk = setup(bn254, r.constraints, r.n_wires, r.n_publics)
    pf, pubs = prove(bn254, pk, r.constraints, w)
    assert verify(bn254, vk, pf, pubs)
    assert pubs == [33]


def test_wtns_round_trip(tmp_path):
    wc = WitnessCalculator.from_file(MULT_WASM)
    w = wc.calculate_witness({"a": 6, "b": 7})
    path = str(tmp_path / "m.wtns")
    wc.save_wtns(path, w)
    with open(path, "rb") as f:
        assert witness_from_bytes(f.read()) == w


def test_bls12_381_wasm_witness():
    wc = WitnessCalculator.from_file(BLS_WASM)
    assert wc.prime == bls12_381.R and wc.n32 == 8  # 255-bit scalar field
    w = wc.calculate_witness({"a": 1234567, "b": 89}, sanity_check=True)
    assert w[1] == 1234567 * 89


def test_unknown_signal_rejected():
    wc = WitnessCalculator.from_file(MULT_WASM)
    with pytest.raises(Trap):
        wc.calculate_witness({"nope": 1}, sanity_check=True)


def test_big_values_reduce_mod_prime():
    wc = WitnessCalculator.from_file(MULT_WASM)
    a = bn254.R - 1  # -1
    w = wc.calculate_witness({"a": a, "b": 5})
    assert w[1] == bn254.R - 5
