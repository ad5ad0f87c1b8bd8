"""Fiat-Shamir transcript over Goldilocks: Poseidon sponge, state[4], rate 8.

Semantics match the reference exactly (starky/src/transcript.rs): values are
absorbed 8 at a time (zero-padded on squeeze), challenges are drained from the
12-element permutation output 1 field element at a time, and query indices are
extracted 63 bits per field element, LSB first.
"""
from __future__ import annotations

import numpy as np

from ..fields import gl64 as gl
from . import poseidon_gl


class TranscriptGL:
    def __init__(self):
        self.state = np.zeros(4, dtype=np.uint64)
        self.pending: list[int] = []
        self.out: list[int] = []

    def _update_state(self):
        while len(self.pending) < 8:
            self.pending.append(0)
        inp = np.array(self.pending, dtype=np.uint64)
        full = poseidon_gl.hash_one(inp, self.state, out=12)
        self.out = [int(x) for x in full]
        self.pending = []
        self.state = np.array(self.out[0:4], dtype=np.uint64)

    def put(self, values):
        """Absorb a flat iterable of field elements (ints or np.uint64)."""
        for v in values:
            self.out = []
            self.pending.append(int(v) % gl.P_INT)
            if len(self.pending) == 8:
                self._update_state()

    # uniform transcript interface shared with the big-field transcripts
    put_elements = put

    def put_root(self, root):
        """Absorb a Merkle root digest (4 GL elements, absorbed elementwise)."""
        self.put(root)

    def get_fields1(self) -> int:
        if self.out:
            return self.out.pop(0)
        self._update_state()
        return self.get_fields1()

    def get_field(self) -> np.ndarray:
        """Draw one GF(p^3) challenge as a 3-element array."""
        a = self.get_fields1()
        b = self.get_fields1()
        c = self.get_fields1()
        return np.array([a, b, c], dtype=np.uint64)

    def get_permutations(self, n: int, nbits: int) -> list[int]:
        total_bits = n * nbits
        n_fields = (total_bits - 1) // 63 + 1
        fields = [self.get_fields1() for _ in range(n_fields)]
        res = []
        cur_field = 0
        cur_bit = 0
        for _ in range(n):
            a = 0
            for j in range(nbits):
                bit = (fields[cur_field] >> cur_bit) & 1
                if bit:
                    a += 1 << j
                cur_bit += 1
                if cur_bit == 63:
                    cur_bit = 0
                    cur_field += 1
            res.append(a)
        return res
