"""Single-chip TPU commit backend: LDE + full Merkle tree on device.

The prover's dominant stage (extend_and_merkelize, reference
stark_gen.rs:710) executed on the TPU: one jitted program does the coset
LDE of all columns and hashes every tree level (Pallas Poseidon when
available, fused-XLA otherwise); only the final level list is pulled back.
Enabled with EIGEN_ZKVM_TPU_COMMIT=1 (stark/stark_gen.py checks it), or
used directly.  The multi-chip variant is parallel/sharded.py.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hash.merkle_gl import MerkleTreeGL
from . import gl_jax as g
from . import ntt_jax
from . import poseidon_jax as pj


def _split(buf: np.ndarray):
    lo = (buf & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (buf >> np.uint64(32)).astype(np.uint32)
    return lo, hi


def _join(lo, hi) -> np.ndarray:
    return (np.asarray(lo).astype(np.uint64)
            | (np.asarray(hi).astype(np.uint64) << np.uint64(32)))


@partial(jax.jit, static_argnames=("nbits", "nbits_ext", "n_pols"))
def _lde_and_levels(lo, hi, nbits: int, nbits_ext: int, n_pols: int):
    lde = ntt_jax.interpolate((lo, hi), nbits, nbits_ext)
    levels = pj.merkle_levels(lde, n_pols, 1 << nbits_ext)
    return lde, levels


def tpu_extend_and_merkelize(buf: np.ndarray, nbits: int,
                             nbits_ext: int) -> MerkleTreeGL:
    """buf: [N, n_pols] u64 trace section -> MerkleTreeGL over its LDE,
    computed on the default (TPU) device."""
    n_pols = buf.shape[1]
    if n_pols == 0:
        return MerkleTreeGL().merkelize(
            np.zeros((1 << nbits_ext, 0), dtype=np.uint64), 0, 1 << nbits_ext)
    lo, hi = _split(np.ascontiguousarray(buf))
    lde, levels = _lde_and_levels(lo, hi, nbits, nbits_ext, n_pols)
    tree = MerkleTreeGL()
    tree.elements = _join(*lde)
    tree.width = n_pols
    tree.height = 1 << nbits_ext
    tree.levels = [_join(*lvl) for lvl in levels]
    return tree


def tpu_merkelize(buf: np.ndarray) -> MerkleTreeGL:
    """Merkle tree over an already-extended [N_ext, w] section on device."""
    height, width = buf.shape
    lo, hi = _split(np.ascontiguousarray(buf))
    levels = _levels_only(lo, hi, width, height)
    tree = MerkleTreeGL()
    tree.elements = buf
    tree.width = width
    tree.height = height
    tree.levels = [_join(*lvl) for lvl in levels]
    return tree


@partial(jax.jit, static_argnames=("width", "height"))
def _levels_only(lo, hi, width: int, height: int):
    return pj.merkle_levels((lo, hi), width, height)


def enabled() -> bool:
    if not os.environ.get("EIGEN_ZKVM_TPU_COMMIT"):
        return False
    try:
        return any(d.platform in ("tpu", "axon") for d in jax.devices())
    except Exception:
        return False
