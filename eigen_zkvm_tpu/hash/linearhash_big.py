"""Big-field linear (leaf) hash over Goldilocks rows (BN254 / BLS12-381).

Fr elements are Python ints in value space.  Packing and sponge grouping
replicate the reference (starky/src/linearhash_bn128.rs /
linearhash_bls12381.rs, digest.rs:162): 3 GL values pack into one Fr as
e0 + e1*2^64 + e2*2^128; Fr values hash in groups of 16 with state carry
(Poseidon t=17).  Rows of width <= 4 are NOT hashed: their 4 GL values
pack directly into the digest (mod r).

Functions take the curve's poseidon module (pbn) as first argument;
hash/linearhash_bn128.py and hash/linearhash_bls12381.py bind it.
"""
from __future__ import annotations

import functools

import numpy as np


def pack_gl4(pbn, e) -> int:
    """4 GL u64s -> Fr value: little-endian u64 limbs reduced mod r
    (reference LinearHashBN128::to_bn128_mont / digest::to_bn128)."""
    return (int(e[0]) | int(e[1]) << 64 | int(e[2]) << 128 | int(e[3]) << 192) % pbn.P


def pack_gl3(pbn, e0: int, e1: int, e2: int) -> int:
    return (e0 | e1 << 64 | e2 << 128) % pbn.P


def hash_element_array(pbn, vals: np.ndarray) -> int:
    """One leaf row [w] of GL values -> Fr digest value
    (reference linearhash_bn128.rs hash_element_array)."""
    w = len(vals)
    if w <= 4:
        e = [int(vals[i]) if i < w else 0 for i in range(4)]
        return pack_gl4(pbn, e)
    fr_vals = []
    for i in range(0, w, 3):
        chunk = vals[i : i + 3]
        e = [int(chunk[j]) if j < len(chunk) else 0 for j in range(3)]
        fr_vals.append(pack_gl3(pbn, *e))
    digest = 0
    for i in range(0, len(fr_vals), 16):
        digest = pbn.hash_fr(fr_vals[i : i + 16], digest)
    return digest


def hash_element_matrix(pbn, columns: list[list[int]]) -> int:
    """Flattened column values packed 3-per-Fr then sponge-folded in 16s
    (reference hash_element_matrix — the verifier-side leaf hash)."""
    vals3 = []
    acc = 0
    acc_n = 0
    for col in columns:
        for elem in col:
            e = int(elem) << (64 * acc_n)
            acc = (acc + e) % pbn.P
            acc_n += 1
            if acc_n == 3:
                vals3.append(acc)
                acc = 0
                acc_n = 0
    if acc_n > 0:
        vals3.append(acc)
    if not vals3:
        return 0
    if len(vals3) == 1:
        return vals3[0]
    st = 0
    for i in range(0, len(vals3), 16):
        st = pbn.hash_fr(vals3[i : i + 16], st)
    return st


def hash_node(pbn, children: list[int]) -> int:
    """Internal 16-ary node: Poseidon(children, 0)."""
    assert len(children) == 16
    return pbn.hash_fr(children, 0)


def hash_fr_batch_limbs(pbn, inp: np.ndarray, init: np.ndarray):
    """Batched hash_fr on 4x64 limb arrays: [B, c, 4] x [B, 4] -> [B, 4]
    (honors the curve's HASH_FR_INDEX output convention), or None when the
    native kernel is unavailable."""
    idx = pbn.HASH_FR_INDEX
    res = pbn.POSEIDON.hash_batch_limbs(inp.shape[1] + 1, inp, init,
                                        n_out=idx + 1)
    return None if res is None else np.ascontiguousarray(res[:, idx, :])


def hash_leaves_batch_limbs(pbn, elements: np.ndarray):
    """All leaf rows at once: [H, w] GL values -> [H, 4] Fr digests, or
    None without the native kernel.  w > 4 only (narrow rows pack
    directly).  Packing is pure numpy: 3 GL values per Fr occupy limbs
    0..2 exactly (3*64 bits < p), zero top limb."""
    H, w = elements.shape
    assert w > 4
    n3 = (w + 2) // 3
    fr = np.zeros((H, n3, 4), dtype=np.uint64)
    for j in range(n3):
        for k in range(3):
            col = 3 * j + k
            if col < w:
                fr[:, j, k] = elements[:, col]
    digest = np.zeros((H, 4), dtype=np.uint64)
    for i in range(0, n3, 16):
        chunk = np.ascontiguousarray(fr[:, i : i + 16])
        digest = hash_fr_batch_limbs(pbn, chunk, digest)
        if digest is None:
            return None
    return digest
