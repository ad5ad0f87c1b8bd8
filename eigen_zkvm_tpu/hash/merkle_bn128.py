"""BN254 16-ary Merkle tree — see merkle_big.py."""
from .merkle_big import MerkleTreeBN128  # noqa: F401
