"""Poseidon over the BLS12-381 scalar field — see poseidon_big.py.

(reference: starky/src/poseidon_bls12381_opt.rs + generated constants)
"""
from __future__ import annotations

from .poseidon_big import PoseidonBig

P = 52435875175126190479447740508185965837690552500527637822603658699938581184513
N_ROUNDS_P = [55, 55, 56, 56, 56, 56, 57, 57, 57, 57, 57, 57, 57, 57, 59, 59]

_inst = PoseidonBig(P, "poseidon_bls12381_opt.npz", N_ROUNDS_P)

HASH_FR_INDEX = 1  # which permutation output is the hash
POSEIDON = _inst
tables = _inst.tables
hash_ex = _inst.hash_ex


def hash_fr(inp, init_state: int = 0) -> int:
    """BLS12-381 takes the SECOND permutation output as the hash (Neptune
    convention, reference poseidon_bls12381_opt.rs hash)."""
    return _inst.hash_ex(inp, init_state, 2)[1]
