"""Linear (leaf) hash for the Goldilocks Merkle tree — batched over all leaves.

A leaf of `width` field elements is folded with the Poseidon sponge in
8-element absorptions with 4-element state carry; wide leaves are first split
into `ceil(width/4)`-sized chunks hashed independently, whose 4-element
digests are then folded (reference semantics: starky/src/linearhash.rs).

The TPU-shaped redesign: instead of hashing one leaf at a time, we hash ALL
leaves of a tree level in lockstep — each sponge step is a [B, 12] batched
Poseidon permutation — so the whole tree maps onto wide vector hardware.
"""
from __future__ import annotations

import numpy as np

from . import poseidon_gl


def _hash_rows(rows: np.ndarray) -> np.ndarray:
    """Sponge-fold rows [B, w] -> digests [B, 4] (reference `_hash`)."""
    B, w = rows.shape
    if w <= 4:
        out = np.zeros((B, 4), dtype=np.uint64)
        out[:, :w] = rows
        return out
    st = np.zeros((B, 4), dtype=np.uint64)
    n_full = w // 8
    for i in range(n_full):
        st = poseidon_gl.hash_n(rows[:, i * 8 : (i + 1) * 8], st)
    rem = w - n_full * 8
    if rem:
        block = np.zeros((B, 8), dtype=np.uint64)
        block[:, :rem] = rows[:, n_full * 8 :]
        st = poseidon_gl.hash_n(block, st)
    return st


def native_poseidon():
    """The C++ Poseidon kernel wrapper, or None (merkle fast paths)."""
    return poseidon_gl._get_native()


def hash_leaves(rows: np.ndarray, batch_size: int = 0) -> np.ndarray:
    """Leaf hash of rows [B, width] -> [B, 4] (reference `LinearHash::hash`)."""
    B, w = rows.shape
    if batch_size == 0:
        nat = poseidon_gl._get_native()
        if nat is not None:
            return nat.hash_leaves(rows)
    if w <= 4:
        out = np.zeros((B, 4), dtype=np.uint64)
        out[:, :w] = rows
        return out
    bs = batch_size if batch_size else max(8, -(-w // 4))
    hsz = -(-w // bs)
    chunks = np.zeros((B, hsz * 4), dtype=np.uint64)
    for c in range(hsz):
        part = rows[:, c * bs : min((c + 1) * bs, w)]
        chunks[:, c * 4 : (c + 1) * 4] = _hash_rows(part)
    if hsz * 4 <= 4:
        return chunks[:, :4]
    return _hash_rows(chunks)


def hash_pair(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Internal node: Poseidon(left||right, zero state) for [B,4] digests."""
    inp = np.concatenate([left, right], axis=1)
    return poseidon_gl.hash_n(inp, np.zeros((left.shape[0], 4), dtype=np.uint64))
