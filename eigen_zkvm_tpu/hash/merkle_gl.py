"""Goldilocks Merkle tree with Poseidon leaf/branch hashing, level-batched.

Tree layout and proof format match the reference (starky/src/merklehash.rs):
 - leaves: linear-hash of each row of the [height, width] element matrix,
 - binary levels: node = Poseidon(child0 || child1, zero-capacity),
 - odd levels are padded with a zero digest sibling,
 - nodes are stored level-contiguously; each level above the leaves reserves
   ceil(n/2)*2 slots so the zero-pad sibling is addressable,
 - proofs are lists of 4-element sibling digests, leaf->root.

Every level is hashed as ONE batched Poseidon call over all node pairs — the
structure a TPU (or any vector unit) wants.
"""
from __future__ import annotations

import numpy as np

from . import linearhash_gl


class MerkleTreeGL:
    def __init__(self):
        self.levels: list[np.ndarray] = []  # each [n_i, 4]; levels[0] = leaves
        self.elements: np.ndarray | None = None  # [height, width]
        self.width = 0
        self.height = 0

    def merkelize(self, elements: np.ndarray, width: int, height: int):
        """elements: [height, width] (row-major leaf groups)."""
        assert elements.shape == (height, width)
        self.elements = elements
        self.width = width
        self.height = height
        nat = linearhash_gl.native_poseidon()
        if nat is not None and width > 0:
            # whole tree in one native call (leaves + every level)
            self.levels = nat.merkle_tree(
                np.ascontiguousarray(elements, dtype=np.uint64))
            return self
        leaves = linearhash_gl.hash_leaves(elements)
        self.levels = [leaves]
        cur = leaves
        n = height
        while n > 1:
            next_n = (n - 1) // 2 + 1
            if n % 2 == 1:
                cur = np.concatenate(
                    [cur, np.zeros((1, 4), dtype=np.uint64)], axis=0
                )
            nodes = linearhash_gl.hash_pair(cur[0::2], cur[1::2])
            self.levels.append(nodes)
            cur = nodes
            n = next_n
        return self

    def root(self) -> np.ndarray:
        return self.levels[-1][0]

    def get_element(self, idx: int, sub_idx: int):
        return self.elements[idx, sub_idx]

    def get_group_proof(self, idx: int):
        """Returns (row values [width], proof [[4 u64], ...])."""
        assert idx < self.height
        v = self.elements[idx].copy()
        mp = []
        i = idx
        for lvl in range(len(self.levels) - 1):
            nodes = self.levels[lvl]
            sib = i ^ 1
            if sib < nodes.shape[0]:
                mp.append(nodes[sib].copy())
            else:
                mp.append(np.zeros(4, dtype=np.uint64))
            i >>= 1
        return v, mp

    @staticmethod
    def calculate_root_from_proof(mp, idx: int, digest: np.ndarray) -> np.ndarray:
        value = digest[None, :]
        i = idx
        for sib in mp:
            sib = np.asarray(sib, dtype=np.uint64)[None, :]
            if i & 1:
                value = linearhash_gl.hash_pair(sib, value)
            else:
                value = linearhash_gl.hash_pair(value, sib)
            i >>= 1
        return value[0]

    @classmethod
    def verify_group_proof(cls, root, mp, idx, group_elements) -> bool:
        vals = np.asarray(group_elements, dtype=np.uint64)[None, :]
        digest = linearhash_gl.hash_leaves(vals)[0]
        c_root = cls.calculate_root_from_proof(mp, idx, digest)
        return bool(np.all(c_root == np.asarray(root, dtype=np.uint64)))

    # --- interop with the prover's section buffers ---
    def element_size(self) -> int:
        return 0 if self.elements is None else int(self.elements.size)

    def to_extend(self) -> np.ndarray:
        """The LDE values this tree committed to, as [height, width]."""
        return self.elements


class ZeroMerkleTreeGL(MerkleTreeGL):
    """Tree over a width-0 element matrix (sections a trace doesn't use,
    e.g. cm2/cm3 without lookups).  Every leaf digest is the zero digest,
    so every node of a level is ONE digest — the whole tree is one Poseidon
    per level instead of 2^height, with identical roots and proofs.
    Power-of-two heights only (odd levels would break uniformity)."""

    _cache: dict = {}

    @classmethod
    def build(cls, height: int) -> "ZeroMerkleTreeGL":
        tree = cls._cache.get(height)
        if tree is None:
            tree = cls._cache[height] = cls(height)
        return tree

    def __init__(self, height: int):
        assert height & (height - 1) == 0, "pow2 heights only"
        super().__init__()
        self.width = 0
        self.height = height
        self.elements = np.zeros((height, 0), dtype=np.uint64)
        d = np.zeros((1, 4), dtype=np.uint64)
        self._lvl = [d[0]]
        n = height
        while n > 1:
            d = linearhash_gl.hash_pair(d, d)
            self._lvl.append(d[0])
            n //= 2

    def root(self) -> np.ndarray:
        return self._lvl[-1]

    def get_group_proof(self, idx: int):
        assert idx < self.height
        return (self.elements[idx].copy(),
                [self._lvl[i].copy() for i in range(len(self._lvl) - 1)])
