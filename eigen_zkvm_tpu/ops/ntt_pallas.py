"""Goldilocks NTT as a Pallas TPU kernel — the fused butterfly ladder.

The XLA ladder (ops/ntt_jax.py) materializes every radix-2 stage to HBM:
2*log2(N) full passes over the data.  This kernel runs ALL stages of a
length-2^a transform with the tile resident in VMEM — one HBM read and one
write per tile (reference hot loop: starky/src/fft_p.rs:242-355).

In-kernel structure: recursive four-step with N1 = 8, i.e. radix-8
decimation.  At every level the array is viewed as [8, q, ...tail, LANES]
and ALL data movement (Stockham stage interleaves, the [8, q] -> [q, 8]
axis swap) happens on LEADING axes whose unit is a whole lane-row — the
naive radix-2 formulation interleaves at sub-sublane granularity for its
first three stages, which Mosaic lowers to shuffles ~30x slower than
streaming.  The 8-point sub-NTT twiddles are compile-time scalars; the
cross-level twiddle tables w^(k1*i2) ([8, q] per level) are built on
device and passed as kernel inputs.

Large transforms use the same four-step decomposition at the XLA level
(sub-NTT kernel, twiddle multiply, transpose, sub-NTT kernel), so a 2^24
LDE touches HBM ~6x instead of ~48x.  Everything is differential-tested
bit-exact against poly/ntt.py (tests/test_ntt_pallas.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import gl64 as gl
from . import gl_jax as g

# largest in-kernel transform: block [2^KMAX, lanes] u32-pairs (in + out +
# per-level temporaries on the Mosaic scoped-vmem stack); compile time is
# superlinear in the level count, so bigger KMAX trades one-time compile
# for fewer HBM passes
KMAX = 9
LANES = 128


def _lane_tile(nbits: int, M: int) -> int:
    """Lane-tile width per grid step: target ~256 KB blocks — small
    transforms (the four-step's inner factors) must not dissolve into
    thousands of tiny grid steps, but bigger blocks choke the VMEM
    double-buffering (measured: [512, 512] blocks run 9x slower than
    [512, 128])."""
    target = max((256 * 1024) // ((1 << nbits) * 8), 1)
    t = LANES
    while t * 2 <= min(target, M) and t < 4096:
        t *= 2
    return t


def _c32(x: int):
    return (np.uint32(x & 0xFFFFFFFF), np.uint32(x >> 32))


def _stockham_axis0(X, nbits: int, root: int):
    """<= 8-point Stockham DIF over axis 0 (natural in/out).  Twiddles are
    compile-time scalars; every slice/concat moves whole axis-0 blocks."""
    n = 1 << nbits
    assert X[0].shape[0] == n
    tail = X[0].shape[1:]
    pows = [1] * max(n // 2, 1)
    for i in range(1, n // 2):
        pows[i] = int(gl.mul(np.uint64(pows[i - 1]), np.uint64(root)))
    l, m = n // 2, 1
    for _ in range(nbits):
        x0 = (X[0][: n // 2], X[1][: n // 2])
        x1 = (X[0][n // 2 :], X[1][n // 2 :])
        s = g.add(x0, x1)
        d = g.sub(x0, x1)
        # per-j scalar twiddle on the j-th m-block (j < l)
        if l > 1:
            dl, dh = [], []
            for j in range(l):
                blk = (d[0][j * m : (j + 1) * m], d[1][j * m : (j + 1) * m])
                w = pows[j * m]
                if w != 1:
                    blk = g.mul(blk, _c32(w))
                dl.append(blk[0])
                dh.append(blk[1])
            d = (jnp.concatenate(dl, axis=0), jnp.concatenate(dh, axis=0))
        # interleave: out[j*2m + k] = s_jk, out[j*2m + m + k] = d_jk
        slo = s[0].reshape((l, 1, m) + tail)
        shi = s[1].reshape((l, 1, m) + tail)
        dlo = d[0].reshape((l, 1, m) + tail)
        dhi = d[1].reshape((l, 1, m) + tail)
        X = (jnp.concatenate([slo, dlo], axis=1).reshape((n,) + tail),
             jnp.concatenate([shi, dhi], axis=1).reshape((n,) + tail))
        l //= 2
        m *= 2
    return X


def _rec_ntt(X, nbits: int, root: int, tables: list):
    """Recursive in-VMEM four-step over axis 0 (N1 = 8 per level).
    `tables` is a list of ([8, q] lo, hi) twiddle pairs, one per level,
    consumed outer-to-inner."""
    if nbits <= 3:
        return _stockham_axis0(X, nbits, root)
    n = 1 << nbits
    q = n >> 3
    tail = X[0].shape[1:]
    X3 = (X[0].reshape((8, q) + tail), X[1].reshape((8, q) + tail))
    root8 = int(gl.exp(np.uint64(root), q))        # order-8 root
    A = _stockham_axis0(X3, 3, root8)
    # tables arrive pre-shaped (8, q, 1, ..., 1) so the multiply is a pure
    # broadcast — Mosaic cannot reshape trailing dims past the lane axis
    B = g.mul(A, tables[0])
    C = (jnp.moveaxis(B[0], 0, 1), jnp.moveaxis(B[1], 0, 1))  # [q, 8, ...]
    root_q = int(gl.exp(np.uint64(root), 8))       # order-q root
    D = _rec_ntt(C, nbits - 3, root_q, tables[1:])
    return (D[0].reshape((n,) + tail), D[1].reshape((n,) + tail))


def _level_shapes(nbits: int):
    """Twiddle-table block shapes per radix-8 level: (8, q) plus one
    trailing broadcast dim per enclosing level + one for the lane axis."""
    shapes = []
    nb, level = nbits, 0
    while nb > 3:
        shapes.append((8, 1 << (nb - 3)) + (1,) * (level + 1))
        nb -= 3
        level += 1
    return shapes


def _level_tables(nbits: int, root: int):
    """Device-built [8, q] w^(k1*i2) twiddle pairs per level."""
    out = []
    nb, rt = nbits, int(root)
    while nb > 3:
        q = 1 << (nb - 3)
        # geo ladder base^i2 then 8 rows by repeated mul
        base = (jnp.ones((1,), jnp.uint32), jnp.zeros((1,), jnp.uint32))
        lo, hi = base
        cur = rt
        for _ in range(nb - 3):
            s = g.mul((lo, hi), (jnp.full((1,), cur & 0xFFFFFFFF, jnp.uint32),
                                 jnp.full((1,), cur >> 32, jnp.uint32)))
            lo = jnp.concatenate([lo, s[0]])
            hi = jnp.concatenate([hi, s[1]])
            cur = int(gl.mul(np.uint64(cur), np.uint64(cur)))
        # rows: w^(k1*i2) = (w^i2)^k1, k1 < 8 — 3 squarings/muls of [q]
        rows_lo, rows_hi = [jnp.ones((q,), jnp.uint32)], [jnp.zeros((q,), jnp.uint32)]
        for k in range(1, 8):
            r = g.mul((rows_lo[-1], rows_hi[-1]), (lo, hi))
            rows_lo.append(r[0])
            rows_hi.append(r[1])
        out.append((jnp.stack(rows_lo), jnp.stack(rows_hi)))
        rt = int(gl.exp(np.uint64(rt), 8))
        nb -= 3
    return out


def _kernel(*refs, nbits: int, nlevels: int, root: int):
    tables = [(refs[2 * i][...], refs[2 * i + 1][...])
              for i in range(nlevels)]
    lo_ref, hi_ref = refs[2 * nlevels], refs[2 * nlevels + 1]
    out_lo, out_hi = refs[2 * nlevels + 2], refs[2 * nlevels + 3]
    X = _rec_ntt((lo_ref[...], hi_ref[...]), nbits, root, tables)
    out_lo[...] = X[0]
    out_hi[...] = X[1]


@partial(jax.jit, static_argnames=("nbits", "root", "interpret"))
def _ntt_axis0_call(lo, hi, tables_flat, nbits: int, root: int,
                    interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 1 << nbits
    M = lo.shape[1]
    lanes = _lane_tile(nbits, M)
    assert M % lanes == 0, (M, lanes)
    grid = (M // lanes,)
    shapes = _level_shapes(nbits)
    tw_specs = []
    for shp in shapes:
        spec = pl.BlockSpec(shp, (lambda rank: (lambda i: (0,) * rank))(
            len(shp)), memory_space=pltpu.VMEM)
        tw_specs += [spec, spec]
    spec = pl.BlockSpec((n, lanes), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n, M), jnp.uint32)] * 2
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        partial(_kernel, nbits=nbits, nlevels=len(shapes), root=root),
        grid=grid,
        in_specs=tw_specs + [spec, spec],
        out_specs=[spec, spec],
        out_shape=out_shape, interpret=interpret,
        compiler_params=params,
    )(*tables_flat, lo, hi)


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
    pad = (-M) % _lane_tile(nbits, max(M, LANES))
    if pad:
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
        hi = jnp.pad(hi, ((0, 0), (0, pad)))
    tables_flat = []
    for shp, (tl, th) in zip(_level_shapes(nbits),
                             _level_tables(nbits, root)):
        tables_flat += [tl.reshape(shp), th.reshape(shp)]
    olo, ohi = _ntt_axis0_call(lo, hi, tuple(tables_flat), nbits, root,
                               interpret=interpret)
    if pad:
        olo, ohi = olo[:, :M], ohi[:, :M]
    return olo, ohi


def _four_step_twiddle(nbits: int, a: int, root: int):
    """[N1, N2] u32-pair table w_N^(k1*i2), built on device in O(N) muls:
    with k1 = h*64 + l,  w^(k1*i2) = (w^(64*i2))^h * (w^(i2))^l — two
    [64, N2] geometric ladders and one broadcast product."""
    b = nbits - a
    N1, N2 = 1 << a, 1 << b
    w = int(root)

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

    def geo_rows(base_pow):  # [64, N2]: base^(r*i2) for r < 64
        i2 = _geo_cols(base_pow, b)  # [N2] = base^i2
        one = g.ones((1, N2))
        rows = (jnp.concatenate([one[0], i2[0][None, :]]),
                jnp.concatenate([one[1], i2[1][None, :]]))
        while rows[0].shape[0] < 64:
            k = rows[0].shape[0]
            top = (rows[0][k - 1 : k], rows[1][k - 1 : k])
            nxt = g.mul(rows, (jnp.broadcast_to(top[0], rows[0].shape),
                               jnp.broadcast_to(top[1], rows[1].shape)))
            nxt = g.mul(nxt, (i2[0][None, :], i2[1][None, :]))
            rows = (jnp.concatenate([rows[0], nxt[0]]),
                    jnp.concatenate([rows[1], nxt[1]]))
        return rows

    if N1 <= 64:
        low = geo_rows(w)
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


# ---------------------------------------------------------------------------
# Eager (multi-program) four-step: bit-identical to ntt()/interpolate()
# below, but each stage — leaf kernel, twiddle multiply, transpose —
# dispatches as its OWN XLA program.  The fused single-program form holds
# every intermediate of the whole recursion alive at once (measured
# 12.9 GB of HLO temp for a 2^23 -> 2^24 interpolate; the 15.75 GB chip
# cannot run it next to anything), while the eager chain peaks at one
# stage's ~3 array copies.  Used by the >= 2^23 single-device commit.
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("nbits", "root"))
def _ntt_leaf_jit(lo, hi, nbits: int, root: int):
    return ntt_axis0((lo, hi), nbits, root=root)


@partial(jax.jit, static_argnames=("nbits", "a", "root"))
def _twiddle_mul_jit(lo, hi, nbits: int, a: int, root: int):
    tw = _four_step_twiddle(nbits, a, root)
    return g.mul((lo, hi), (tw[0][:, :, None], tw[1][:, :, None]))


@jax.jit
def _transpose_jit(lo, hi):
    N1, N2, P = lo.shape
    return (lo.transpose(1, 0, 2).reshape(N2, N1 * P),
            hi.transpose(1, 0, 2).reshape(N2, N1 * P))


def ntt_eager(pair, nbits: int, root: int | None = None):
    """ntt() with per-stage program dispatch (device arrays in/out)."""
    lo, hi = pair
    tail = lo.shape[1:]
    P = int(np.prod(tail)) if tail else 1
    n = 1 << nbits
    if root is None:
        root = int(gl.root_of_unity(nbits))
    if nbits <= KMAX:
        r = _ntt_leaf_jit(lo.reshape(n, P), hi.reshape(n, P), nbits, root)
        return r[0].reshape((n,) + tail), r[1].reshape((n,) + tail)
    a = _split_for(nbits)
    b = nbits - a
    N1, N2 = 1 << a, 1 << b
    root_a = int(gl.exp(np.uint64(root), N2))
    root_b = int(gl.exp(np.uint64(root), N1))
    x = (lo.reshape(N1, N2 * P), hi.reshape(N1, N2 * P))
    del lo, hi, pair
    A = ntt_eager(x, a, root=root_a)
    del x
    # free each stage as soon as its consumer is enqueued: the recursion
    # frame otherwise pins ~5 full-array copies at once, which at 2^24
    # rows is the difference between fitting and RESOURCE_EXHAUSTED
    B = _twiddle_mul_jit(A[0].reshape(N1, N2, P), A[1].reshape(N1, N2, P),
                         nbits, a, root)
    del A
    C = _transpose_jit(B[0], B[1])
    del B
    D = ntt_eager(C, b, root=root_b)
    del C
    return (D[0].reshape((n,) + tail), D[1].reshape((n,) + tail))


@partial(jax.jit, static_argnames=("nbits", "nbits_ext"))
def _coset_scale_pad_jit(lo, hi, nbits: int, nbits_ext: int):
    from . import ntt_jax

    n, n_ext = 1 << nbits, 1 << nbits_ext
    spow = ntt_jax._geo_device(int(gl.SHIFT), nbits)
    n_inv = g.from_u64(np.uint64(gl.inv(np.uint64(n))))
    scale = g.mul(spow, (n_inv[0], n_inv[1]))
    tail = (1,) * (lo.ndim - 1)
    scale = (scale[0].reshape((n,) + tail), scale[1].reshape((n,) + tail))
    s = g.mul((lo, hi), scale)
    padc = [(0, n_ext - n)] + [(0, 0)] * (lo.ndim - 1)
    return jnp.pad(s[0], padc), jnp.pad(s[1], padc)


@partial(jax.jit, static_argnames=("nbits",))
def _invscale_jit(lo, hi, nbits: int):
    n_inv = g.from_u64(np.uint64(gl.inv(np.uint64(1 << nbits))))
    return g.mul((lo, hi), (n_inv[0], n_inv[1]))


def intt_eager(pair, nbits: int):
    root_inv = int(gl.inv(np.uint64(gl.root_of_unity(nbits))))
    q = ntt_eager(pair, nbits, root=root_inv)
    return _invscale_jit(q[0], q[1], nbits)


def interpolate_eager(pair, nbits: int, nbits_ext: int):
    """interpolate() semantics, one program per four-step stage."""
    root_inv = int(gl.inv(np.uint64(gl.root_of_unity(nbits))))
    coeffs = ntt_eager(pair, nbits, root=root_inv)
    del pair
    padded = _coset_scale_pad_jit(coeffs[0], coeffs[1], nbits, nbits_ext)
    del coeffs
    return ntt_eager(padded, nbits_ext)


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
