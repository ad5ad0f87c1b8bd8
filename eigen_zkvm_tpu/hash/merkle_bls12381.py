"""BLS12-381 16-ary Merkle tree — see merkle_big.py."""
from .merkle_big import MerkleTreeBLS12381  # noqa: F401
