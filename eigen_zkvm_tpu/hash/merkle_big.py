"""16-ary Merkle tree over a big-field Poseidon with Goldilocks leaf rows.

Node digests are Python ints (Fr values).  Level layout, zero padding to
multiples of 16, proof format (all 16 siblings per level, own slot included)
and verification replicate the reference (starky/src/merklehash_bn128.rs /
merklehash_bls12381.rs); we additionally check the recomputed leaf digest
against its slot in the first proof level (strictly stronger, accepts every
honest proof).  Subclasses bind PBN to the curve's poseidon module.
"""
from __future__ import annotations

import numpy as np

from . import linearhash_big as lh


class MerkleTreeBig:
    PBN = None  # curve poseidon module; set by subclasses

    def __init__(self):
        self.levels: list[list[int]] = []  # levels[0] = leaf digests (padded to 16k)
        self.elements: np.ndarray | None = None
        self.width = 0
        self.height = 0

    def merkelize(self, elements: np.ndarray, width: int, height: int):
        assert elements.shape == (height, width)
        self.elements = elements
        self.width = width
        self.height = height
        leaves = self._leaves_batch(elements, width, height)
        if leaves is None:  # no native kernel: per-row python path
            leaves = [lh.hash_element_array(self.PBN, elements[i])
                      for i in range(height)]
        n = height
        cur = leaves
        self.levels = []
        while True:
            next_n = (n - 1) // 16 + 1
            cur = cur + [0] * (next_n * 16 - n)
            self.levels.append(cur)
            if n <= 1:
                break
            nxt = self._level_batch(cur, next_n)
            if nxt is None:
                nxt = [lh.hash_node(self.PBN, cur[i * 16 : (i + 1) * 16])
                       for i in range(next_n)]
            cur = nxt
            n = next_n
        return self

    def _leaves_batch(self, elements, width, height):
        """All leaves in one native batch (None -> python fallback)."""
        if width <= 4:
            return None  # direct packing, no permutations: python is fine
        from .poseidon_big import limbs_to_ints

        digs = lh.hash_leaves_batch_limbs(self.PBN, elements)
        return None if digs is None else limbs_to_ints(digs)

    def _level_batch(self, cur, next_n):
        from .poseidon_big import int_to_limbs, limbs_to_ints

        inp = int_to_limbs(cur).reshape(next_n, 16, 4)
        init = np.zeros((next_n, 4), dtype=np.uint64)
        digs = lh.hash_fr_batch_limbs(self.PBN, inp, init)
        return None if digs is None else limbs_to_ints(digs)

    def root(self) -> int:
        return self.levels[-1][0]

    def get_element(self, idx: int, sub_idx: int):
        return self.elements[idx, sub_idx]

    def get_group_proof(self, idx: int):
        """Returns (row values [width], proof [[16 Fr ints], ...])."""
        assert idx < self.height
        v = self.elements[idx].copy()
        mp = []
        i = idx
        n = self.height
        for lvl in self.levels[:-1]:
            si = i & ~0xF
            mp.append([lvl[si + k] for k in range(16)])
            i >>= 4
            n = (n - 1) // 16 + 1
        return v, mp

    @classmethod
    def calculate_root_from_proof(cls, mp, idx: int, digest: int) -> int:
        value = digest
        i = idx
        for level in mp:
            value = lh.hash_node(cls.PBN, list(level))
            i >>= 4
        return value

    @classmethod
    def verify_group_proof(cls, root: int, mp, idx, group_elements) -> bool:
        digest = lh.hash_element_matrix(cls.PBN, [[int(x) for x in group_elements]])
        if mp and int(mp[0][idx & 0xF]) != digest:
            return False  # leaf slot must carry the recomputed digest
        c_root = cls.calculate_root_from_proof([[int(x) for x in lvl] for lvl in mp],
                                               idx, digest)
        if not mp:
            c_root = digest
        return c_root == int(root)

    # --- interop with the prover's section buffers ---
    def element_size(self) -> int:
        return 0 if self.elements is None else int(self.elements.size)

    def to_extend(self) -> np.ndarray:
        return self.elements


class MerkleTreeBN128(MerkleTreeBig):
    from . import poseidon_bn128 as PBN  # noqa: N813


class MerkleTreeBLS12381(MerkleTreeBig):
    from . import poseidon_bls12381 as PBN  # noqa: N813
