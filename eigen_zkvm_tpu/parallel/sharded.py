"""Multi-chip sharded commit stage: LDE -> all_to_all reshard -> Merkle.

This is the TPU-native scale-out of the prover's dominant stage
(extend_and_merkelize, reference starky/src/stark_gen.rs:710 +
stark_setup.rs:27): where the reference rayon-parallelizes rows within one
host, here the work is laid out over a 2-D `jax.sharding.Mesh`:

  axis "data"   data-parallel over independent proofs (the reference's
                shell-level per-proof parallelism / zkVM chunk proving)
  axis "model"  intra-proof sharding: the NTT/LDE phase is sharded over
                POLYNOMIALS (each radix-2 stage is then communication-free),
                and the Merkle phase over ROWS (each leaf hash needs every
                polynomial at its row) — the phase switch is ONE all_to_all
                riding ICI, the analog of the reference's fft_p.rs transpose
                rounds.

Merkle reduction: each chip owns a contiguous power-of-two row block, so its
digests form an exact subtree; chips fold their subtrees locally, all_gather
the tiny per-chip roots, and every chip folds the replicated top of the tree
(log2(m) hashes) — the tree-reduce analog of merklehash.rs's per-level rayon.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops import gl_jax as g
from ..ops import ntt_jax
from ..ops import poseidon_jax as pj


def make_sharded_commit(mesh: Mesh, nbits: int, nbits_ext: int, n_pols: int,
                        data_axis: str = "data", model_axis: str = "model"):
    """Build a jitted sharded commit: traces pair [B, N, n_pols] -> roots pair [B, 4].

    Inputs are sharded P(data, None, model); outputs P(data, None).
    """
    m = mesh.shape[model_axis]
    n_ext = 1 << nbits_ext
    if n_pols % m or n_ext % m:
        raise ValueError(f"n_pols={n_pols} and 2^{nbits_ext} must divide by model={m}")

    def local_step(lo, hi):
        # local [B_l, N, P_l]: LDE along rows, pol-sharded => no communication
        lde = jax.vmap(lambda l, h: ntt_jax.interpolate((l, h), nbits, nbits_ext))(lo, hi)
        # phase switch: rows split / pols gathered — ONE all_to_all on ICI
        rlo = jax.lax.all_to_all(lde[0], model_axis, split_axis=1, concat_axis=2, tiled=True)
        rhi = jax.lax.all_to_all(lde[1], model_axis, split_axis=1, concat_axis=2, tiled=True)
        # leaf hash every local row: [B_l, R_l, n_pols] -> [B_l, R_l, 4]
        digs = jax.vmap(lambda l, h: pj.hash_leaves((l, h), n_pols))(rlo, rhi)
        # local contiguous subtree root per batch element: [B_l, 4]
        sub = pj.fold_root_pow2(digs)
        # replicate the m per-chip roots and fold the top of the tree
        alo = jax.lax.all_gather(sub[0], model_axis, axis=1)  # [B_l, m, 4]
        ahi = jax.lax.all_gather(sub[1], model_axis, axis=1)
        root = pj.fold_root_pow2((alo, ahi))
        return root

    shmapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(data_axis, None, model_axis), P(data_axis, None, model_axis)),
        out_specs=(P(data_axis, None), P(data_axis, None)),
        # the all_gather+fold tail is replicated over "model" by construction,
        # which the static varying-manual-axes check cannot infer
        check_vma=False)
    return jax.jit(shmapped)
