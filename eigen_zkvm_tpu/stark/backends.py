"""Hash-backend registry: verificationHashType -> (MerkleTree, Transcript).

GL is the native recursion-layer backend; BN128/BLS12381 give big-field
Merkle roots and transcripts for the on-chain/top layer (reference dispatch:
starky/src/prove.rs:52-90).
"""
from __future__ import annotations


def get_backend(hash_type: str):
    if hash_type == "GL":
        from ..hash.merkle_gl import MerkleTreeGL
        from ..hash.transcript_gl import TranscriptGL

        return MerkleTreeGL, TranscriptGL
    if hash_type == "BN128":
        from ..hash.merkle_big import MerkleTreeBN128
        from ..hash.transcript_big import TranscriptBN128

        return MerkleTreeBN128, TranscriptBN128
    if hash_type == "BLS12381":
        from ..hash.merkle_big import MerkleTreeBLS12381
        from ..hash.transcript_big import TranscriptBLS12381

        return MerkleTreeBLS12381, TranscriptBLS12381
    raise NotImplementedError(f"verificationHashType {hash_type}")
