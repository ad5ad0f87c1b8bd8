"""FRI over the GF(p^5) quintic extension — BEYOND reference parity.

The reference declares F5G but leaves it unwired through the fold
("TODO: Support F5G", starky/src/fri.rs:309,319-331); here the same FRI
commit/fold/query/verify chain runs end-to-end at dim=5 (stark/fri.py),
with the GF(p^3) path byte-untouched (the golden/e2e suites pin it).
"""
import numpy as np
import pytest

from eigen_zkvm_tpu.fields import gl64 as gl
from eigen_zkvm_tpu.hash.merkle_gl import MerkleTreeGL
from eigen_zkvm_tpu.hash.transcript_gl import TranscriptGL
from eigen_zkvm_tpu.poly import ntt
from eigen_zkvm_tpu.stark.fri import FRI
from eigen_zkvm_tpu.stark.types import StarkStruct, Step

NBITS, NBITS_EXT = 5, 10  # degree < 2^5 committed on a 2^10 shifted coset


def _coset_eval(coeffs: np.ndarray, nbits_ext: int) -> np.ndarray:
    """Evaluate P (extension coeffs, [deg, 5]) at SHIFT * w^i for all i."""
    n = 1 << nbits_ext
    padded = np.zeros((n, coeffs.shape[1]), dtype=np.uint64)
    padded[: coeffs.shape[0]] = coeffs
    scaled = gl.mul(padded, ntt.shift_powers(nbits_ext)[:, None])
    return ntt.ntt(scaled, nbits_ext)


def _struct() -> StarkStruct:
    return StarkStruct(nBits=NBITS, nBitsExt=NBITS_EXT, nQueries=4,
                       verificationHashType="GL",
                       steps=[Step(NBITS_EXT), Step(6), Step(3)])


def _prove(pol: np.ndarray):
    fri = FRI(_struct(), dim=5)
    tree = MerkleTreeGL().merkelize(np.ascontiguousarray(pol), 5, pol.shape[0])
    t = TranscriptGL()
    t.put_root(tree.root())
    proof = fri.prove(t, pol, lambda y: [tree.get_group_proof(y)])
    return fri, tree, proof


def _verify(fri: FRI, root, proof) -> bool:
    tv = TranscriptGL()
    tv.put_root(root)

    def check_query(query, idx):
        vals, mp = query[0]
        if not MerkleTreeGL.verify_group_proof(root, mp, idx, vals):
            return None
        return np.asarray(vals, dtype=np.uint64).reshape(1, 5)

    return fri.verify(tv, proof, check_query)


def test_f5g_fri_roundtrip():
    rng = np.random.default_rng(55)
    coeffs = rng.integers(0, gl.P_INT, size=(1 << NBITS, 5), dtype=np.uint64)
    pol = _coset_eval(coeffs, NBITS_EXT)
    fri, tree, proof = _prove(pol)
    # last layer really is 5-wide extension data folded twice
    assert np.asarray(proof.last).shape == (1 << 3, 5)
    assert _verify(fri, tree.root(), proof)


def test_f5g_fri_rejects_tampered_last_layer():
    rng = np.random.default_rng(56)
    coeffs = rng.integers(0, gl.P_INT, size=(1 << NBITS, 5), dtype=np.uint64)
    pol = _coset_eval(coeffs, NBITS_EXT)
    fri, tree, proof = _prove(pol)
    proof.last = np.array(proof.last, dtype=np.uint64)
    proof.last[0, 2] ^= np.uint64(1)
    assert not _verify(fri, tree.root(), proof)


def test_f5g_fri_rejects_high_degree():
    """A full-degree-2^10 witness folds consistently but must die on the
    final low-degree check (fri.py max_deg gate)."""
    rng = np.random.default_rng(57)
    coeffs = rng.integers(0, gl.P_INT,
                          size=(1 << NBITS_EXT, 5), dtype=np.uint64)
    pol = _coset_eval(coeffs, NBITS_EXT)
    fri, tree, proof = _prove(pol)
    assert not _verify(fri, tree.root(), proof)


def test_fri_rejects_dim_mismatch():
    rng = np.random.default_rng(58)
    pol = rng.integers(0, gl.P_INT, size=(1 << NBITS_EXT, 5), dtype=np.uint64)
    with pytest.raises(AssertionError):
        FRI(_struct(), dim=3).prove(TranscriptGL(), pol, lambda y: [])
    with pytest.raises(AssertionError):
        FRI(_struct(), dim=4)
