"""BN254 Poseidon / linear hash / Merkle / transcript golden + e2e tests.

Golden values come from the reference's Rust unit tests
(poseidon_bn128_opt.rs, linearhash_bn128.rs, merklehash_bn128.rs) which
themselves track circomlibjs / pil-stark.
"""
import numpy as np

from eigen_zkvm_tpu.hash import linearhash_bn128 as lh
from eigen_zkvm_tpu.hash.merkle_bn128 import MerkleTreeBN128
from eigen_zkvm_tpu.hash.poseidon_bn128 import hash_fr
from eigen_zkvm_tpu.stark.polsarray import PolsArray
from eigen_zkvm_tpu.stark.stark_gen import stark_gen
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
from eigen_zkvm_tpu.stark.stark_verify import stark_verify
from eigen_zkvm_tpu.stark.types import load_pil, load_starkstruct

from conftest import reference_fixture


def test_poseidon_bn128_golden():
    assert hash_fr([1]) == int(
        "18586133768512220936620570745912940619677854269274689475585506675881198879027")
    assert hash_fr([1, 2]) == int(
        "7853200120776062878684798364095072458815029376092732009249414926327459813530")
    assert hash_fr([1, 2, 0, 0, 0]) == int(
        "1018317224307729531995786483840663576608797660851238720571059489595066344487")


def test_linearhash_bn128_matrix_golden():
    cols = [[e, e * 1000, e * 1000000] for e in range(100)]
    st = lh.hash_element_matrix(cols)
    assert st == 0x29c2ac38b7b8d18b9c1b575369cb4ab930ef71ebd5e4631b3916360233a29cae


def test_linearhash_bn128_array_corner():
    # reference test_linearhash_corner_case asserts the digest's stored limbs,
    # which are the MONTGOMERY representation (R = 2^256 mod r) of the value
    P = lh.P
    R_inv = pow(1 << 256, P - 2, P)

    def value_of(limbs):
        return sum(x << (64 * i) for i, x in enumerate(limbs)) * R_inv % P

    out = lh.hash_element_array(np.array(
        [6188675464075253840, 2608530331018891925], dtype=np.uint64))
    assert out == value_of([15714769047018385385, 14080511166848616671,
                            11411897157942048316, 1802287360671936077])
    out = lh.hash_element_array(np.array(
        [18440682777423237490, 1156220815552880681], dtype=np.uint64))
    assert out == value_of([12850950522295690944, 15045028186447136619,
                            11701297961637547631, 875058675367281598])


def test_merklehash_bn128_golden_root():
    n, n_pols = 256, 9
    cols = np.zeros((n, n_pols), dtype=np.uint64)
    for i in range(n):
        for j in range(n_pols):
            cols[i, j] = i + j * 1000
    tree = MerkleTreeBN128().merkelize(cols, n_pols, n)
    assert tree.root() == int(
        "2052732265221205192391066587135329070685482706470940527184785165917406935559")
    # query proof roundtrip
    v, mp = tree.get_group_proof(3)
    assert MerkleTreeBN128.verify_group_proof(tree.root(), mp, 3, v)
    v2 = v.copy()
    v2[0] += 1
    assert not MerkleTreeBN128.verify_group_proof(tree.root(), mp, 3, v2)


def test_fib_bn128_prove_verify():
    pil = load_pil(reference_fixture("fib.pil.json"))
    ss = load_starkstruct(reference_fixture("starkStruct.json"))
    assert ss.verificationHashType == "BN128"
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(reference_fixture("fib.const"))
    cm_pols = PolsArray(pil, PolsArray.COMMIT).load(reference_fixture("fib.cm"))
    setup = StarkSetup(const_pols, pil, ss)
    proof = stark_gen(cm_pols, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, ss, prover_addr="0x0")
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)
    # tamper
    proof.evals = proof.evals.copy()
    proof.evals[0, 0] = (int(proof.evals[0, 0]) + 1) % (2**64 - 2**32 + 1)
    assert not stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)
