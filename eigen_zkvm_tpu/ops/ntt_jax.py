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


def _bitrev_idx(nbits: int):
    """Bit-reversal permutation as arithmetic over an iota — NO embedded
    index table.  (A [2^21] constant array costs ~8 MB of serialized
    program; through a remote-TPU tunnel every first execution pays the
    program-transfer, so all big tables are computed on device.)"""
    v = jax.lax.iota(jnp.uint32, 1 << nbits)
    v = ((v >> 1) & jnp.uint32(0x55555555)) | ((v & jnp.uint32(0x55555555)) << 1)
    v = ((v >> 2) & jnp.uint32(0x33333333)) | ((v & jnp.uint32(0x33333333)) << 2)
    v = ((v >> 4) & jnp.uint32(0x0F0F0F0F)) | ((v & jnp.uint32(0x0F0F0F0F)) << 4)
    v = ((v >> 8) & jnp.uint32(0x00FF00FF)) | ((v & jnp.uint32(0x00FF00FF)) << 8)
    v = (v >> 16) | (v << 16)
    return (v >> (32 - nbits)).astype(jnp.int32)


def _geo_device(base: int, nbits: int) -> g.GL:
    """[2^nbits] powers base^i on device by doubling-concat (log-depth,
    scalar seeds only — replaces host-embedded power tables)."""
    lo = jnp.ones((1,), jnp.uint32)
    hi = jnp.zeros((1,), jnp.uint32)
    cur = int(base)
    for _ in range(nbits):
        s = g.mul((lo, hi), (jnp.full((1,), cur & 0xFFFFFFFF, jnp.uint32),
                             jnp.full((1,), cur >> 32, jnp.uint32)))
        lo = jnp.concatenate([lo, s[0]])
        hi = jnp.concatenate([hi, s[1]])
        cur = int(gl.mul(np.uint64(cur), np.uint64(cur)))
    return lo, hi


_PALLAS_MIN_NBITS = 10


def _use_pallas(nbits: int) -> bool:
    """Route big transforms through the fused Pallas kernel on TPU.
    EIGEN_ZKVM_NTT=ladder forces the XLA stage ladder (A/B debugging).

    `jax.default_backend()` alone is NOT sufficient: with a TPU plugin
    attached, a CPU-device mesh (tests, the driver's virtual-device
    dryrun) still reports "tpu" as the default backend, and a Pallas
    kernel lowered for those CPU devices either errors or falls into
    glacial interpret mode (the round-3 MULTICHIP/BENCH timeout).  So
    when a mesh is active, dispatch on the MESH's device platform."""
    import os

    mode = os.environ.get("EIGEN_ZKVM_NTT", "auto")
    if mode == "ladder":
        return False
    if mode == "pallas":
        return True
    if nbits < _PALLAS_MIN_NBITS:
        return False
    from ..parallel import meshctx

    ma = meshctx.active()
    if ma is not None:
        return ma[0].devices.flat[0].platform == "tpu"
    return jax.default_backend() == "tpu"


def ntt(values: g.GL, nbits: int) -> g.GL:
    """Forward NTT along axis 0 of [N, ...] u32-pair arrays."""
    n = 1 << nbits
    if n == 1:
        return values
    if _use_pallas(nbits):
        from . import ntt_pallas

        return ntt_pallas.ntt(values, nbits)
    rev = _bitrev_idx(nbits)
    lo = values[0][rev]
    hi = values[1][rev]
    pows = _geo_device(int(gl.root_of_unity(nbits)), nbits)  # [n] w^i
    tail_shape = values[0].shape[1:]
    for s in range(1, nbits + 1):
        m = 1 << s
        half = m >> 1
        step = n // m
        tw = (pows[0][: half * step : step], pows[1][: half * step : step])
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


def _rev_order_idx(n: int):
    """[0, n-1, n-2, ..., 1] on device (the iNTT output reversal)."""
    i = jax.lax.iota(jnp.int32, n)
    return jnp.where(i == 0, 0, n - i)


def intt(values: g.GL, nbits: int) -> g.GL:
    n = 1 << nbits
    if _use_pallas(nbits):
        from . import ntt_pallas

        return ntt_pallas.intt(values, nbits)
    qlo, qhi = ntt(values, nbits)
    n_inv = g.from_u64(np.uint64(gl.inv(np.uint64(n))))
    idx = _rev_order_idx(n)
    return g.mul((qlo[idx], qhi[idx]), (n_inv[0], n_inv[1]))


def interpolate(values: g.GL, nbits: int, nbits_ext: int) -> g.GL:
    """Coset LDE [N, P] -> [N_ext, P]: NTT_ext(zero-pad(n_inv*SHIFT^j * iNTT))."""
    n = 1 << nbits
    n_ext = 1 << nbits_ext
    if _use_pallas(nbits):
        from . import ntt_pallas

        return ntt_pallas.interpolate(values, nbits, nbits_ext)
    qlo, qhi = ntt(values, nbits)
    idx = _rev_order_idx(n)
    coeffs = (qlo[idx], qhi[idx])
    # SHIFT^j * n^-1 computed on device from scalar seeds (bit-exact with
    # gl.mul(shift_powers, inv(n)): both are canonical products mod p)
    spow = _geo_device(int(gl.SHIFT), nbits)
    n_inv = g.from_u64(np.uint64(gl.inv(np.uint64(n))))
    scale = g.mul(spow, (n_inv[0], n_inv[1]))
    tail = (1,) * (values[0].ndim - 1)
    scale = (scale[0].reshape((n,) + tail), scale[1].reshape((n,) + tail))
    coeffs = g.mul(coeffs, scale)
    pad = [(0, n_ext - n)] + [(0, 0)] * (values[0].ndim - 1)
    padded = (jnp.pad(coeffs[0], pad), jnp.pad(coeffs[1], pad))
    return ntt(padded, nbits_ext)


@partial(jax.jit, static_argnums=(1, 2))
def interpolate_jit(values: g.GL, nbits: int, nbits_ext: int) -> g.GL:
    return interpolate(values, nbits, nbits_ext)
