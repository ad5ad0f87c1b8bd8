import numpy as np

from eigen_zkvm_tpu.fields import gl64 as gl
from eigen_zkvm_tpu.hash import linearhash_gl, poseidon_gl
from eigen_zkvm_tpu.hash.merkle_gl import MerkleTreeGL
from eigen_zkvm_tpu.hash.transcript_gl import TranscriptGL


def test_poseidon_golden_all_zero():
    """Golden vectors from reference poseidon_opt.rs unit tests."""
    r = poseidon_gl.hash_one(np.zeros(8, dtype=np.uint64), np.zeros(4, dtype=np.uint64))
    assert [int(x) for x in r] == [
        0x3C18A9786CB0B359, 0xC4055E3364A246C3, 0x7953DB0AB48808F4, 0xC71603F33A1144CA]


def test_poseidon_golden_1_11():
    r = poseidon_gl.hash_one(np.arange(8, dtype=np.uint64), np.arange(8, 12, dtype=np.uint64))
    assert [int(x) for x in r] == [
        0xD64E1E3EFC5B8E9E, 0x53666633020AAA47, 0xD40285597C6A8825, 0x613A4F81E81231D2]


def test_poseidon_golden_neg1():
    neg1 = gl.P_INT - 1
    r = poseidon_gl.hash_one(np.full(8, neg1, dtype=np.uint64), np.full(4, neg1, dtype=np.uint64))
    assert [int(x) for x in r] == [
        0xBE0085CFC57A8357, 0xD95AF71847D05C09, 0xCF55A13D33C1C953, 0x95803A74F4530E82]


def test_linearhash_golden():
    """Golden vector from reference linearhash.rs unit test (width-27 leaf)."""
    flat = np.arange(1, 28, dtype=np.uint64)[None, :]
    res = linearhash_gl.hash_leaves(flat)[0]
    assert [int(x) for x in res] == [
        17618903473682537397, 11844743283521766961, 185773432536380223, 6083210164459944430]


def test_linearhash_corner_case():
    flat = np.array([[1, 2, 3]], dtype=np.uint64)
    res = linearhash_gl.hash_leaves(flat)[0]
    assert [int(x) for x in res] == [1, 2, 3, 0]


def _grid(n, n_pols):
    cols = np.zeros((n, n_pols), dtype=np.uint64)
    for j in range(n_pols):
        cols[:, j] = np.arange(n, dtype=np.uint64) + j * 1000
    return cols


def test_merkle_golden_256x9():
    t = MerkleTreeGL().merkelize(_grid(256, 9), 9, 256)
    assert [int(x) for x in t.root()] == [
        11508832812350783315, 5044133147279090978, 6335412741057168694, 12530816673814004438]
    v, mp = t.get_group_proof(3)
    assert MerkleTreeGL.verify_group_proof(t.root(), mp, 3, v)


def test_merkle_golden_non_power_of_2():
    t = MerkleTreeGL().merkelize(_grid(33, 6), 6, 33)
    assert [int(x) for x in t.root()] == [
        10952823080416094333, 14127307315435918656, 18155557507084305090, 4650815682547343351]
    v, mp = t.get_group_proof(32)
    assert MerkleTreeGL.verify_group_proof(t.root(), mp, 32, v)


def test_merkle_proof_tamper_detected():
    t = MerkleTreeGL().merkelize(_grid(64, 5), 5, 64)
    v, mp = t.get_group_proof(10)
    v2 = v.copy()
    v2[0] += np.uint64(1)
    assert not MerkleTreeGL.verify_group_proof(t.root(), mp, 10, v2)


def test_transcript_determinism_and_permutations():
    t1 = TranscriptGL()
    t1.put([1, 2, 3])
    c1 = t1.get_field()
    t2 = TranscriptGL()
    t2.put([1, 2, 3])
    c2 = t2.get_field()
    assert np.array_equal(c1, c2)
    perms = t1.get_permutations(8, 11)
    assert len(perms) == 8 and all(0 <= p < 2048 for p in perms)
