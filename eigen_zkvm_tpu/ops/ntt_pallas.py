"""Goldilocks NTT as a Pallas TPU kernel — the fused butterfly ladder.

The XLA ladder (ops/ntt_jax.py) materializes every radix-2 stage to HBM:
2*log2(N) full passes over the data.  This kernel runs ALL stages of a
length-2^a transform with the tile resident in VMEM — one HBM read and one
write per tile — using the Stockham autosort formulation (natural order in
AND out, no bit-reversal gather; reference hot loop: starky/src/fft_p.rs:
242-355, the blocked butterflies + transpose rounds).

Large transforms use the classic four-step decomposition N = N1*N2:

    A[k1, i2]  = NTT_N1 over i1 of x[i1*N2 + i2]      (Pallas kernel)
    B[k1, i2]  = A * w_N^(k1*i2)                      (XLA elementwise)
    C          = B transposed to [i2, k1]             (XLA copy)
    X[k1+N1*k2]= NTT_N2 over i2 of C                  (Pallas kernel)

so a 2^24 LDE touches HBM ~6x instead of ~48x.  Sub-transforms longer
than the VMEM budget recurse.  Everything is differential-tested
bit-exact against poly/ntt.py (tests/test_ntt_pallas.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import gl64 as gl
from . import gl_jax as g

# largest in-kernel transform.  VMEM would allow 2^12, but Mosaic compile
# time is superlinear in the unrolled stage-ladder DEPTH — 9 stages keeps
# the (persistent-cached, but first-time) kernel compile in tens of
# seconds while the four-step recursion supplies arbitrary sizes
KMAX = 9
LANES = 128


def _stage_twiddles(nbits: int, root: int):
    """[t, n/2] u32-pair: row q holds w^((i >> q) << q) — the Stockham
    stage-q twiddle for output slot i (w^(j*m) repeated m=2^q times).
    Built on device from scalar seeds (nothing big crosses the link)."""
    n = 1 << nbits
    half = n // 2
    # pows[i] = root^i, i < n/2, by log-depth doubling
    lo = jnp.ones((1,), jnp.uint32)
    hi = jnp.zeros((1,), jnp.uint32)
    cur = int(root)
    for _ in range(nbits - 1):
        s = g.mul((lo, hi), (jnp.full((1,), cur & 0xFFFFFFFF, jnp.uint32),
                             jnp.full((1,), cur >> 32, jnp.uint32)))
        lo = jnp.concatenate([lo, s[0]])
        hi = jnp.concatenate([hi, s[1]])
        cur = int(gl.mul(np.uint64(cur), np.uint64(cur)))
    idx = jax.lax.iota(jnp.int32, half)
    rows_lo, rows_hi = [], []
    for q in range(nbits):
        sel = (idx >> q) << q
        rows_lo.append(lo[sel])
        rows_hi.append(hi[sel])
    return jnp.stack(rows_lo), jnp.stack(rows_hi)


def _kernel(tw_lo_ref, tw_hi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref,
            *, nbits: int):
    n = 1 << nbits
    half = n // 2
    T = lo_ref.shape[1]
    X = (lo_ref[...], hi_ref[...])
    l, m = half, 1
    for q in range(nbits):
        x0 = (X[0][:half], X[1][:half])
        x1 = (X[0][half:], X[1][half:])
        s = g.add(x0, x1)
        tw = (tw_lo_ref[q].reshape(half, 1), tw_hi_ref[q].reshape(half, 1))
        d = g.mul(g.sub(x0, x1), tw)
        # autosort scatter: out[j*2m + k] = s, out[j*2m + m + k] = d
        slo = s[0].reshape(l, 1, m, T)
        shi = s[1].reshape(l, 1, m, T)
        dlo = d[0].reshape(l, 1, m, T)
        dhi = d[1].reshape(l, 1, m, T)
        X = (jnp.concatenate([slo, dlo], axis=1).reshape(n, T),
             jnp.concatenate([shi, dhi], axis=1).reshape(n, T))
        l //= 2
        m *= 2
    out_lo_ref[...] = X[0]
    out_hi_ref[...] = X[1]


@partial(jax.jit, static_argnames=("nbits", "interpret"))
def _ntt_axis0_call(lo, hi, tw_lo, tw_hi, nbits: int,
                    interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 1 << nbits
    M = lo.shape[1]
    assert M % LANES == 0, (M, LANES)
    grid = (M // LANES,)
    half = n // 2
    tw_spec = pl.BlockSpec((nbits, half), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((n, LANES), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n, M), jnp.uint32)] * 2
    # the unrolled stage ladder allocates per-stage temporaries on the
    # Mosaic scoped-vmem stack; the default 16 MB limit trips at 2^10+,
    # so raise it toward the physical VMEM (v5e: 128 MB)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        partial(_kernel, nbits=nbits), grid=grid,
        in_specs=[tw_spec, tw_spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=out_shape, interpret=interpret,
        compiler_params=params,
    )(tw_lo, tw_hi, lo, hi)


def ntt_axis0(pair, nbits: int, root: int | None = None,
              interpret: bool = False):
    """Length-2^nbits NTT along axis 0 of [n, M] u32-pair arrays, fully
    in VMEM (natural order in and out).  nbits must be <= KMAX."""
    assert nbits <= KMAX
    n = 1 << nbits
    lo, hi = pair
    assert lo.shape[0] == n
    if root is None:
        root = int(gl.root_of_unity(nbits))
    M = lo.shape[1]
    pad = (-M) % LANES
    if pad:
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
        hi = jnp.pad(hi, ((0, 0), (0, pad)))
    tw_lo, tw_hi = _stage_twiddles(nbits, root)
    olo, ohi = _ntt_axis0_call(lo, hi, tw_lo, tw_hi, nbits,
                               interpret=interpret)
    if pad:
        olo, ohi = olo[:, :M], ohi[:, :M]
    return olo, ohi


def _four_step_twiddle(nbits: int, a: int, root: int):
    """[N1, N2] u32-pair table w_N^(k1*i2), built on device in O(N) muls:
    with k1 = h*64 + l,  w^(k1*i2) = (w^(64*i2))^h * (w^(i2))^l — two
    [64, N2] geometric ladders and one broadcast product."""
    n = 1 << nbits
    b = nbits - a
    N1, N2 = 1 << a, 1 << b
    w = int(root)

    def geo_rows(base_pow):  # [rows, N2]: base^(r*i2) for r < rows
        # row r+1 = row r * row 1; log-depth doubling over rows
        i2 = _geo_cols(base_pow, b)  # [N2] = base^i2
        rows = (i2[0][None, :], i2[1][None, :])
        one = g.ones((1, N2))
        rows = (jnp.concatenate([one[0], rows[0]]),
                jnp.concatenate([one[1], rows[1]]))
        while rows[0].shape[0] < 64:
            k = rows[0].shape[0]
            top = (rows[0][k - 1 : k], rows[1][k - 1 : k])
            nxt = g.mul(rows, (jnp.broadcast_to(top[0], rows[0].shape),
                               jnp.broadcast_to(top[1], rows[1].shape)))
            nxt = g.mul(nxt, (i2[0][None, :], i2[1][None, :]))
            # rows_{k..2k-1} = rows_j * rows_{k-1} * base^{i2}
            rows = (jnp.concatenate([rows[0], nxt[0]]),
                    jnp.concatenate([rows[1], nxt[1]]))
        return rows

    def _geo_cols(base: int, bits: int):
        lo = jnp.ones((1,), jnp.uint32)
        hi = jnp.zeros((1,), jnp.uint32)
        cur = base
        for _ in range(bits):
            s = g.mul((lo, hi),
                      (jnp.full((1,), cur & 0xFFFFFFFF, jnp.uint32),
                       jnp.full((1,), cur >> 32, jnp.uint32)))
            lo = jnp.concatenate([lo, s[0]])
            hi = jnp.concatenate([hi, s[1]])
            cur = int(gl.mul(np.uint64(cur), np.uint64(cur)))
        return lo, hi

    if N1 <= 64:
        low = geo_rows(w)  # [64, N2] = w^(l*i2)
        return (low[0][:N1], low[1][:N1])
    w64 = int(gl.exp(np.uint64(w), 64))
    low = geo_rows(w)        # [64, N2]  w^(l*i2)
    high = geo_rows(w64)     # [64, N2]  w^(64*h*i2)
    hrows = N1 // 64
    tw = g.mul((high[0][:hrows, None, :], high[1][:hrows, None, :]),
               (low[0][None, :, :], low[1][None, :, :]))  # [h, 64, N2]
    return (tw[0].reshape(N1, N2), tw[1].reshape(N1, N2))


def _split_for(nbits: int) -> int:
    """First-factor log-size for the four-step split (balanced, capped)."""
    a = (nbits + 1) // 2
    return min(a, KMAX)


def ntt(pair, nbits: int, interpret: bool = False, root: int | None = None):
    """NTT along axis 0 of [N, P] u32 pairs (natural order in and out).
    `root` is any principal 2^nbits-th root (default: forward transform);
    the inverse transform passes the inverse root (+ 1/n scale outside)."""
    lo, hi = pair
    tail = lo.shape[1:]
    P = int(np.prod(tail)) if tail else 1
    n = 1 << nbits
    if root is None:
        root = int(gl.root_of_unity(nbits))
    if nbits <= KMAX:
        r = ntt_axis0((lo.reshape(n, P), hi.reshape(n, P)), nbits,
                      root=root, interpret=interpret)
        return r[0].reshape((n,) + tail), r[1].reshape((n,) + tail)
    a = _split_for(nbits)
    b = nbits - a
    N1, N2 = 1 << a, 1 << b
    root_a = int(gl.exp(np.uint64(root), N2))   # order-N1 root
    root_b = int(gl.exp(np.uint64(root), N1))   # order-N2 root
    x = (lo.reshape(N1, N2 * P), hi.reshape(N1, N2 * P))
    A = ntt(x, a, interpret=interpret, root=root_a)
    # inlined into the caller's trace: the enclosing jit caches the graph,
    # so the O(N)-mul table build amortizes like everything else
    tw = _four_step_twiddle(nbits, a, root)
    A3 = (A[0].reshape(N1, N2, P), A[1].reshape(N1, N2, P))
    B = g.mul(A3, (tw[0][:, :, None], tw[1][:, :, None]))
    C = (B[0].transpose(1, 0, 2).reshape(N2, N1 * P),
         B[1].transpose(1, 0, 2).reshape(N2, N1 * P))
    D = ntt(C, b, interpret=interpret, root=root_b)
    return (D[0].reshape((n,) + tail), D[1].reshape((n,) + tail))


def intt(pair, nbits: int, interpret: bool = False):
    """Inverse NTT (natural order): forward ladder with the inverse root,
    scaled by 1/n — bit-exact with poly/ntt.py intt."""
    n = 1 << nbits
    root_inv = int(gl.inv(np.uint64(gl.root_of_unity(nbits))))
    q = ntt(pair, nbits, interpret=interpret, root=root_inv)
    n_inv = g.from_u64(np.uint64(gl.inv(np.uint64(n))))
    return g.mul(q, (n_inv[0], n_inv[1]))


def interpolate(pair, nbits: int, nbits_ext: int, interpret: bool = False):
    """Coset LDE [N, P] -> [N_ext, P] (fft_p.rs interpolate): iNTT, scale
    coefficients by SHIFT^j (the 1/n fold rides the same multiply), zero-
    pad, forward NTT on the extended domain."""
    from . import ntt_jax

    n = 1 << nbits
    n_ext = 1 << nbits_ext
    root_inv = int(gl.inv(np.uint64(gl.root_of_unity(nbits))))
    coeffs = ntt(pair, nbits, interpret=interpret, root=root_inv)
    spow = ntt_jax._geo_device(int(gl.SHIFT), nbits)
    n_inv = g.from_u64(np.uint64(gl.inv(np.uint64(n))))
    scale = g.mul(spow, (n_inv[0], n_inv[1]))
    tail = (1,) * (pair[0].ndim - 1)
    scale = (scale[0].reshape((n,) + tail), scale[1].reshape((n,) + tail))
    coeffs = g.mul(coeffs, scale)
    padc = [(0, n_ext - n)] + [(0, 0)] * (pair[0].ndim - 1)
    padded = (jnp.pad(coeffs[0], padc), jnp.pad(coeffs[1], padc))
    return ntt(padded, nbits_ext, interpret=interpret)
