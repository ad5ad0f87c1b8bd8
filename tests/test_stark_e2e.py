"""End-to-end eSTARK prove + verify on the reference's fixture circuits."""
import numpy as np
import pytest

from eigen_zkvm_tpu.stark.polsarray import PolsArray
from eigen_zkvm_tpu.stark.stark_gen import stark_gen
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
from eigen_zkvm_tpu.stark.stark_verify import stark_verify
from eigen_zkvm_tpu.stark.types import load_pil, load_starkstruct

from conftest import reference_fixture


def _prove(pil_file, const_file, cm_file, struct_file="starkStruct.json.gl"):
    pil = load_pil(reference_fixture(pil_file))
    ss = load_starkstruct(reference_fixture(struct_file))
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(reference_fixture(const_file))
    cm_pols = PolsArray(pil, PolsArray.COMMIT).load(reference_fixture(cm_file))
    setup = StarkSetup(const_pols, pil, ss)
    proof = stark_gen(cm_pols, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, ss)
    return proof, setup, ss


def test_fib_gl_prove_verify():
    proof, setup, ss = _prove("fib.pil.json.gl", "fib.const.gl", "fib.cm.gl")
    assert [int(x) for x in proof.rootC] == [
        15302509084042343527, 985081440042889555, 14692153289195851822, 1611894784155222896]
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)


def test_fib_gl_tampered_proof_rejected():
    proof, setup, ss = _prove("fib.pil.json.gl", "fib.const.gl", "fib.cm.gl")
    proof.evals = proof.evals.copy()
    proof.evals[0, 0] = (int(proof.evals[0, 0]) + 1) % (2**64 - 2**32 + 1)
    assert not stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)


def test_fib_gl_tampered_root_rejected():
    proof, setup, ss = _prove("fib.pil.json.gl", "fib.const.gl", "fib.cm.gl")
    proof.root1 = proof.root1.copy()
    proof.root1[0] ^= np.uint64(1)
    assert not stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)


def test_plookup_gl_prove_verify():
    proof, setup, ss = _prove("plookup.pil.json.gl", "plookup.const.gl", "plookup.cm.gl")
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)


def test_permutation_prove_verify():
    # pe fixture ships with the BN128 config in the reference; proving it with
    # the GL transcript exercises the permutation-argument pipeline end to end.
    proof, setup, ss = _prove("pe.pil.json", "pe.const", "pe.cm")
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)


def test_connection_prove_verify():
    proof, setup, ss = _prove("connection.pil.json", "connection.const", "connection.cm")
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)
