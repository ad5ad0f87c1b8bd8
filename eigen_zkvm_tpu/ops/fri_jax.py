"""Device FRI: special-point folds + fold-tree commits, device-resident.

Host counterpart: stark/fri.py (protocol semantics match starky/src/fri.rs).
The fold of step si is ONE jitted program: batched iNTT over the group axis
(transform size 2^reduction_bits, batched over all 2^step.nBits groups x 3
extension coords), then a Horner ladder at the per-group point
y_g = special_x * shift_inv * w^{-g} — no [n_x, G] power matrix is ever
materialized.  The fold commitment reuses the Poseidon Merkle level builder
(ops/poseidon_jax.py); nodes stay on device (ops/commit_tpu.py), so the only
host traffic per step is the 32-byte root and the tiny special_x upload.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import gl64 as gl
from ..parallel import meshctx
from . import gl_jax as g
from . import ntt_jax
from . import poseidon_jax as pj
from .commit_tpu import DeviceMerkleTreeGL, _flatten_levels, _level_meta


def _f3_mul(a, b):
    """F3G product over GL pairs, last axis 3 (same as vm_jax)."""
    def c(x, i):
        return (x[0][..., i : i + 1], x[1][..., i : i + 1])
    a0, a1, a2 = c(a, 0), c(a, 1), c(a, 2)
    b0, b1, b2 = c(b, 0), c(b, 1), c(b, 2)
    aa = g.mul(g.add(a0, a1), g.add(b0, b1))
    bb = g.mul(g.add(a0, a2), g.add(b0, b2))
    cc = g.mul(g.add(a1, a2), g.add(b1, b2))
    dd = g.mul(a0, b0)
    ee = g.mul(a1, b1)
    ff = g.mul(a2, b2)
    gg = g.sub(dd, ee)
    c0 = g.sub(g.add(cc, gg), ff)
    c1 = g.sub(g.add(aa, cc), g.add(g.add(ee, ee), dd))
    c2 = g.sub(bb, gg)
    return (jnp.concatenate([c0[0], c1[0], c2[0]], axis=-1),
            jnp.concatenate([c0[1], c1[1], c2[1]], axis=-1))


@partial(jax.jit, static_argnames=("pol_bits", "step_nbits", "ma"))
def _fold(lo, hi, sx_lo, sx_hi, sinv_lo, sinv_hi,
          pol_bits: int, step_nbits: int, ma=None):
    """pol pair [2^pol_bits, 3] -> folded [2^step_nbits, 3].

    sinv_*: [2^step_nbits] base-field per-group scale shift_inv * w^{-g}
    (host-precomputed: one exp_vec, static per (in_nbits, si)).
    Under a mesh the GROUP axis is sharded — the small group-axis iNTT and
    the Horner ladder are then communication-free per device.
    """
    n_x = 1 << (pol_bits - step_nbits)
    pol2_n = 1 << step_nbits
    ppar = meshctx._constrain(
        (lo.reshape(n_x, pol2_n, 3), hi.reshape(n_x, pol2_n, 3)), ma, 1)
    coeffs = ntt_jax.intt(ppar, pol_bits - step_nbits)
    # y_g = special_x * sinv_g : [pol2_n, 3]
    y = g.mul((jnp.broadcast_to(sx_lo[None, :], (pol2_n, 3)),
               jnp.broadcast_to(sx_hi[None, :], (pol2_n, 3))),
              (sinv_lo[:, None], sinv_hi[:, None]))
    res = (coeffs[0][n_x - 1], coeffs[1][n_x - 1])
    for j in range(n_x - 2, -1, -1):
        res = g.add(_f3_mul(res, y), (coeffs[0][j], coeffs[1][j]))
    return res


@partial(jax.jit, static_argnames=("step_nbits", "next_nbits", "ma"))
def _leaves_and_levels(lo, hi, step_nbits: int, next_nbits: int, ma=None):
    """Group a folded pol into next-step leaves and hash the tree levels.

    leaf i = [pol[j * n_groups + i] for j] flattened x3 (fri.rs layout)."""
    n_groups = 1 << next_nbits
    group_size = (1 << step_nbits) // n_groups
    etb = meshctx.rows(
        (lo.reshape(group_size, n_groups, 3).transpose(1, 0, 2)
           .reshape(n_groups, group_size * 3),
         hi.reshape(group_size, n_groups, 3).transpose(1, 0, 2)
           .reshape(n_groups, group_size * 3)), ma)
    levels, stack = pj.merkle_levels(etb, group_size * 3, n_groups, ma=ma)
    return etb, _flatten_levels(levels, stack)


_SINV_CACHE: dict = {}


def _sinv_pair(pol_bits: int, step_nbits: int, shift_inv: int):
    """Device [2^step_nbits] pair of shift_inv * w(pol_bits)^{-g}."""
    key = (pol_bits, step_nbits, int(shift_inv))
    hit = _SINV_CACHE.get(key)
    if hit is not None:
        return hit
    wi = gl.inv(np.uint64(gl.root_of_unity(pol_bits)))
    gidx = np.arange(1 << step_nbits, dtype=np.uint64)
    sinv = gl.mul(np.uint64(shift_inv), gl.exp_vec(wi, gidx))
    pair = (jnp.asarray((sinv & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((sinv >> np.uint64(32)).astype(np.uint32)))
    _SINV_CACHE[key] = pair
    return pair


def fold(pair, special_x: np.ndarray, pol_bits: int, step_nbits: int,
         shift_inv: int):
    """One FRI fold on device.  special_x: host [3] u64."""
    sx = np.asarray(special_x, dtype=np.uint64)
    sx_lo = jnp.asarray((sx & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    sx_hi = jnp.asarray((sx >> np.uint64(32)).astype(np.uint32))
    sinv_lo, sinv_hi = _sinv_pair(pol_bits, step_nbits, shift_inv)
    return _fold(pair[0], pair[1], sx_lo, sx_hi, sinv_lo, sinv_hi,
                 pol_bits, step_nbits, ma=meshctx.active())


def fold_tree(pair, step_nbits: int, next_nbits: int) -> DeviceMerkleTreeGL:
    """Commit a folded pol for the next step; nodes stay on device."""
    n_groups = 1 << next_nbits
    group_size = (1 << step_nbits) // n_groups
    etb, flat = _leaves_and_levels(pair[0], pair[1], step_nbits, next_nbits,
                                   ma=meshctx.active())
    tree = DeviceMerkleTreeGL(flat, *_level_meta(n_groups))
    tree.set_device_elements(etb)
    tree.width = group_size * 3
    tree.height = n_groups
    return tree
