"""Fiat-Shamir transcript over a big-field Poseidon
(reference transcript_bn128.rs / transcript_bls12381.rs).

State is one Fr; pending inputs absorb in groups of 16 via hash_ex(.., 17);
GL challenges come from splitting squeezed Fr values into three 64-bit
chunks (each reduced into the Goldilocks field); query indices from 253-bit
chunks of raw squeezed Frs.  Subclasses bind PBN to the curve module.
"""
from __future__ import annotations

from collections import deque

GL_P = 0xFFFFFFFF00000001


class TranscriptBig:
    PBN = None  # curve poseidon module; set by subclasses

    def __init__(self):
        self.state = 0
        self.pending: list[int] = []
        self.out: deque[int] = deque()
        self.out3: deque[int] = deque()

    def _update_state(self):
        pending = self.pending + [0] * (16 - len(self.pending))
        self.out = deque(self.PBN.hash_ex(pending, self.state, 17))
        self.out3 = deque()
        self.pending = []
        self.state = self.out[0]

    def _add_1(self, e: int):
        self.out = deque()
        self.pending.append(e % self.PBN.P)
        if len(self.pending) == 16:
            self._update_state()

    def put_elements(self, values):
        """Absorb GL values (or already-packed Fr ints), one Fr each."""
        for v in values:
            self._add_1(int(v))

    def put_root(self, root):
        """Absorb a Merkle root digest (a single Fr value)."""
        self._add_1(int(root))

    def _get_fields253(self) -> int:
        if self.out:
            return self.out.popleft()
        self._update_state()
        return self._get_fields253()

    def get_fields1(self) -> int:
        if self.out3:
            return self.out3.popleft()
        if self.out:
            v = self.out.popleft()
            mask = (1 << 64) - 1
            self.out3.append((v & mask) % GL_P)
            self.out3.append(((v >> 64) & mask) % GL_P)
            self.out3.append(((v >> 128) & mask) % GL_P)
            return self.get_fields1()
        self._update_state()
        return self.get_fields1()

    def get_field(self):
        import numpy as np

        return np.array([self.get_fields1(), self.get_fields1(),
                         self.get_fields1()], dtype=np.uint64)

    def get_permutations(self, n: int, nbits: int) -> list[int]:
        total_bits = n * nbits
        n_fields = (total_bits - 1) // 253 + 1
        fields = [self._get_fields253() for _ in range(n_fields)]
        res = []
        cur_field = 0
        cur_bit = 0
        for _ in range(n):
            a = 0
            for j in range(nbits):
                if (fields[cur_field] >> cur_bit) & 1:
                    a += 1 << j
                cur_bit += 1
                if cur_bit == 253:
                    cur_bit = 0
                    cur_field += 1
            res.append(a)
        return res


class TranscriptBN128(TranscriptBig):
    from . import poseidon_bn128 as PBN  # noqa: N813


class TranscriptBLS12381(TranscriptBig):
    from . import poseidon_bls12381 as PBN  # noqa: N813
