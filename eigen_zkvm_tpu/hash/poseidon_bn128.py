"""Poseidon over the BN254 (a.k.a. BN128) scalar field — see poseidon_big.py.

(reference: starky/src/poseidon_bn128_opt.rs + generated constants)
"""
from __future__ import annotations

from .poseidon_big import PoseidonBig

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
N_ROUNDS_P = [56, 57, 56, 60, 60, 63, 64, 63, 60, 66, 60, 65, 70, 60, 64, 68]

_inst = PoseidonBig(P, "poseidon_bn128_opt.npz", N_ROUNDS_P)

HASH_FR_INDEX = 0  # which permutation output is the hash
POSEIDON = _inst
tables = _inst.tables
hash_ex = _inst.hash_ex
hash_fr = _inst.hash_fr
