"""BLS12-381 Poseidon / linear hash / Merkle golden + e2e tests
(golden values from the reference's Rust unit tests)."""
import numpy as np

from eigen_zkvm_tpu.hash import linearhash_bls12381 as lh
from eigen_zkvm_tpu.hash.merkle_big import MerkleTreeBLS12381
from eigen_zkvm_tpu.hash.poseidon_bls12381 import hash_fr
from eigen_zkvm_tpu.stark.polsarray import PolsArray
from eigen_zkvm_tpu.stark.stark_gen import stark_gen
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
from eigen_zkvm_tpu.stark.stark_verify import stark_verify
from eigen_zkvm_tpu.stark.types import load_pil, load_starkstruct

from conftest import reference_fixture


def test_poseidon_bls12381_golden():
    assert hash_fr([1]) == int(
        "10090463338479474364654416042385169859560025017303585988626920959727361545503")
    assert hash_fr([1, 0]) == int(
        "40315999570263005229566068098191840653718756303362127561954793579940120806360")
    assert hash_fr([1, 2, 0, 0, 0]) == int(
        "25489954628706771422434337159093356230875147553184381182493646336226215511862")
    assert hash_fr([1, 2, 3, 4]) == int(
        "50374862952696036512232585533148559412665642735378685892656796916864806976141")


def test_linearhash_bls12381_matrix_golden():
    cols = [[e, e * 1000, e * 1000000] for e in range(100)]
    st = lh.hash_element_matrix(cols)
    assert st == 0x1aea10165e8c452045633835341291832bf7d46ace4bd6e8b1a2ddb9f257c2be


def test_merklehash_bls12381_golden_root():
    n, n_pols = 4, 3
    cols = np.zeros((n, n_pols), dtype=np.uint64)
    for i in range(n):
        for j in range(n_pols):
            cols[i, j] = i + j * 10 + 1
    tree = MerkleTreeBLS12381().merkelize(cols, n_pols, n)
    assert tree.root() == int(
        "32227206116237215740162377531481191838063909532381497804787245624658969614932")
    v, mp = tree.get_group_proof(1)
    assert MerkleTreeBLS12381.verify_group_proof(tree.root(), mp, 1, v)


def test_fib_bls12381_prove_verify():
    pil = load_pil(reference_fixture("fib.pil.json"))
    ss = load_starkstruct(reference_fixture("starkStruct.json.bls12381"))
    assert ss.verificationHashType == "BLS12381"
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(reference_fixture("fib.const"))
    cm_pols = PolsArray(pil, PolsArray.COMMIT).load(reference_fixture("fib.cm"))
    setup = StarkSetup(const_pols, pil, ss)
    proof = stark_gen(cm_pols, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, ss, prover_addr="0x0")
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)
