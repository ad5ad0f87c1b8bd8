"""Batched Goldilocks NTT / iNTT / coset-LDE in JAX (jit/TPU path).

Same math as poly/ntt.py (differential-tested bit-exact), expressed as a
static radix-2 butterfly ladder over [N, n_pols] u32-pair arrays: each stage
is one whole-array VPU op; XLA fuses the mul/add/sub chains.  Twiddle tables
are embedded as constants at trace time (static nbits).

TPU-first notes: the transform runs over the ROW axis while the polynomial
axis stays untouched, so sharding n_pols across a mesh makes every stage
communication-free; only the (row-)transposed four-step variant (for very
large N) needs an all-to-all.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import gl64 as gl
from ..poly import ntt as ntt_np
from . import gl_jax as g


def _twiddles(nbits: int):
    """Per-stage twiddle tables (numpy u64), stage s has 2^(s-1) entries."""
    pows = ntt_np.root_powers(nbits)
    n = 1 << nbits
    out = []
    for s in range(1, nbits + 1):
        m = 1 << s
        half = m >> 1
        out.append(pows[np.arange(half) * (n // m)])
    return out


def _bitrev(nbits: int):
    return ntt_np._bit_reverse_indices(nbits)


def ntt(values: g.GL, nbits: int) -> g.GL:
    """Forward NTT along axis 0 of [N, ...] u32-pair arrays."""
    n = 1 << nbits
    if n == 1:
        return values
    rev = jnp.asarray(_bitrev(nbits))
    lo = values[0][rev]
    hi = values[1][rev]
    tws = _twiddles(nbits)
    tail_shape = values[0].shape[1:]
    for s in range(1, nbits + 1):
        m = 1 << s
        half = m >> 1
        tw = g.from_u64(tws[s - 1])
        tw = (tw[0].reshape((1, half) + (1,) * len(tail_shape)),
              tw[1].reshape((1, half) + (1,) * len(tail_shape)))
        bl = lo.reshape((n // m, m) + tail_shape)
        bh = hi.reshape((n // m, m) + tail_shape)
        lo_pair = (bl[:, :half], bh[:, :half])
        hi_pair = (bl[:, half:], bh[:, half:])
        t = g.mul(hi_pair, tw)
        new_lo = g.add(lo_pair, t)
        new_hi = g.sub(lo_pair, t)
        lo = jnp.concatenate([new_lo[0], new_hi[0]], axis=1).reshape((n,) + tail_shape)
        hi = jnp.concatenate([new_lo[1], new_hi[1]], axis=1).reshape((n,) + tail_shape)
    return lo, hi


def intt(values: g.GL, nbits: int) -> g.GL:
    n = 1 << nbits
    qlo, qhi = ntt(values, nbits)
    n_inv = g.from_u64(np.uint64(gl.inv(np.uint64(n))))
    idx = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.arange(n - 1, 0, -1, dtype=jnp.int32)])
    return g.mul((qlo[idx], qhi[idx]), (n_inv[0], n_inv[1]))


def interpolate(values: g.GL, nbits: int, nbits_ext: int) -> g.GL:
    """Coset LDE [N, P] -> [N_ext, P]: NTT_ext(zero-pad(n_inv*SHIFT^j * iNTT))."""
    n = 1 << nbits
    n_ext = 1 << nbits_ext
    qlo, qhi = ntt(values, nbits)
    idx = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.arange(n - 1, 0, -1, dtype=jnp.int32)])
    coeffs = (qlo[idx], qhi[idx])
    scale_np = gl.mul(ntt_np.shift_powers(nbits), gl.inv(np.uint64(n)))
    scale = g.from_u64(scale_np)
    tail = (1,) * (values[0].ndim - 1)
    scale = (scale[0].reshape((n,) + tail), scale[1].reshape((n,) + tail))
    coeffs = g.mul(coeffs, scale)
    pad = [(0, n_ext - n)] + [(0, 0)] * (values[0].ndim - 1)
    padded = (jnp.pad(coeffs[0], pad), jnp.pad(coeffs[1], pad))
    return ntt(padded, nbits_ext)


@partial(jax.jit, static_argnums=(1, 2))
def interpolate_jit(values: g.GL, nbits: int, nbits_ext: int) -> g.GL:
    return interpolate(values, nbits, nbits_ext)
