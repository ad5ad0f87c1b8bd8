"""Poseidon-GL permutation as a Pallas TPU kernel with the MDS on the MXU.

The dense 12x12 Goldilocks matrix layers (8 full rounds + the opt-schedule
PMAT fold — starky/src/poseidon_opt.rs semantics) dominate the hash: 144
field muls each, ~9K u32 VPU ops.  This kernel reformulates them as an
EXACT integer matmul on the systolic array:

    state element s_j (u64)  ->  8 byte limbs s_ja            (VPU shifts)
    out_i = sum_j m_ji * s_j = sum_c 2^(8c) * acc_ic,
    acc   = W[180, 96] @ limbs[96, B]                         (MXU, bf16)
    out_i = digits acc_i* recombined mod p                    (VPU)

where W[(i,c),(j,a)] = byte (c-a) of m_ji.  Every product is <= 255*255
and every accumulation of 96 such terms is < 2^23 — exactly representable
in the MXU's bf16-in/f32-accumulate path, so the result is bit-exact (the
recombination feeds gl_jax._reduce128, verified for arbitrary 128-bit
inputs).  Layout is [12, B]: state on sublanes, hash batch on lanes; the
matmul contracts the sublane axis, so NO transposes are needed, and every
round transforms the WHOLE [12, B] state in one vector op (no per-element
Python fan-out — keeps the traced graph ~5x smaller).

Adds between rounds use wrap-only (non-canonical) arithmetic — values stay
< 2^64 and are canonicalized once at kernel exit.  Digests are bit-exact
with hash/poseidon_gl.py (tests/test_poseidon_mxu.py drives the identical
jnp ladder; the engine tests cover the pallas_call layer on TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hash import poseidon_gl as pnp
from . import gl_jax as g

T = 12
_HALF_F = 4
_N_P = 22
_NC = 15  # byte-digit count of a u64 x u64 column sum

_C = pnp.C.astype(np.uint64)
_M = pnp.M.astype(np.uint64)
_PM = pnp.PMAT.astype(np.uint64)
_S = pnp.S.astype(np.uint64)


def _weight_matrix(mat: np.ndarray) -> np.ndarray:
    """[180, 96] bf16 limb-convolution weights for out = state @ mat
    (out[:, i] = sum_j mat[j, i] * state[:, j])."""
    W = np.zeros((T * _NC, T * 8), dtype=np.float32)
    for i in range(T):
        for j in range(T):
            m = int(mat[j][i])
            for a in range(8):
                for c in range(a, a + 8):
                    b = c - a
                    W[i * _NC + c, j * 8 + a] = (m >> (8 * b)) & 0xFF
    return W.astype(jnp.bfloat16)


_W_M = _weight_matrix(_M)
_W_PM = _weight_matrix(_PM)


def _col_pair(vals: np.ndarray):
    """u64 [k] -> ([k,1] lo, [k,1] hi) u32 numpy column constants."""
    v = np.asarray(vals, dtype=np.uint64).reshape(-1, 1)
    return ((v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (v >> np.uint64(32)).astype(np.uint32))


def _c32(x) -> tuple:
    x = int(x)
    return (np.uint32(x & 0xFFFFFFFF), np.uint32(x >> 32))


def _add_nc(a, b):
    """Wrap-only mod-p add: valid for ANY u64 inputs, result < 2^64
    (== mod p), no canonicalization.  Handles the double-wrap corner
    (sum >= 2^64 twice) that g.add's canonical-input fast path skips."""
    lo, hi, c = g._add64(a[0], a[1], b[0], b[1])
    eps = jnp.where(c > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    lo2 = lo + eps
    c2 = (lo2 < lo).astype(jnp.uint32)
    hi2 = hi + c2
    c3 = jnp.logical_and(hi2 < hi, c2 > 0)
    eps2 = jnp.where(c3, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    lo3 = lo2 + eps2
    hi3 = hi2 + (lo3 < lo2).astype(jnp.uint32)
    return lo3, hi3


_mul = g.mul  # exact mod p for any u64 inputs; canonical output


def _pow7(x):
    x2 = _mul(x, x)
    x3 = _mul(x2, x)
    x6 = _mul(x3, x3)
    return _mul(x6, x)


def _sum_rows(v):
    """Mod-p sum over axis 0 of a [12, B] pair -> [1, B] pair."""
    a = _add_nc((v[0][0:4], v[1][0:4]), (v[0][4:8], v[1][4:8]))
    a = _add_nc(a, (v[0][8:12], v[1][8:12]))          # [4, B]
    b = _add_nc((a[0][0:2], a[1][0:2]), (a[0][2:4], a[1][2:4]))
    return _add_nc((b[0][0:1], b[1][0:1]), (b[0][1:2], b[1][1:2]))


def _mds_mxu(st, w):
    """st: [12, B] pair (any u64 values) -> [12, B] pair, each row i
    ≡ sum_j m_ji s_j (mod p), via one MXU matmul."""
    lo, hi = st
    B = lo.shape[1]
    limbs = jnp.concatenate(
        [(lo >> np.uint32(8 * a)) & np.uint32(0xFF) for a in range(4)]
        + [(hi >> np.uint32(8 * a)) & np.uint32(0xFF) for a in range(4)],
        axis=0)                                       # [8*12, B] a-major
    # reorder to (j, a)-major rows: [8, 12, B] -> [12, 8, B] -> [96, B]
    limbs = limbs.reshape(8, T, B).transpose(1, 0, 2).reshape(8 * T, B)
    # Mosaic has no u32->f32 convert; values are < 256 so the route
    # through i32 is exact
    limbs = limbs.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        w, limbs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [180, B]
    d3 = acc.astype(jnp.int32).astype(jnp.uint32).reshape(
        T, _NC, B)                                    # digits < 2^23, exact
    d = [d3[:, c, :] for c in range(_NC)]             # 15 x [12, B]
    # byte digits -> base-2^16 digits e_m < 2^32
    e = [d[2 * m] + (d[2 * m + 1] << np.uint32(8)) for m in range(7)]
    e.append(d[14])
    # base-2^16 pairs -> 64-bit pairs P_t = e_{2t} + e_{2t+1}*2^16
    P = []
    for t in range(4):
        x, y = e[2 * t], e[2 * t + 1]
        plo = x + (y << np.uint32(16))
        phi = (y >> np.uint32(16)) + (plo < x).astype(jnp.uint32)
        P.append((plo, phi))
    # value = P0 + P1<<32 + P2<<64 + P3<<96  ->  five u32 limbs
    w0 = P[0][0]
    w1 = P[0][1] + P[1][0]
    k1 = (w1 < P[0][1]).astype(jnp.uint32)
    s2 = P[1][1] + P[2][0]
    k2 = (s2 < P[1][1]).astype(jnp.uint32)
    w2 = s2 + k1
    k2 = k2 + (w2 < s2).astype(jnp.uint32)
    s3 = P[2][1] + P[3][0]
    k3 = (s3 < P[2][1]).astype(jnp.uint32)
    w3 = s3 + k2
    k3 = k3 + (w3 < s3).astype(jnp.uint32)
    w4 = P[3][1] + k3                        # < 2^17: no overflow
    r = g._reduce128(w0, w1, w2, w3)         # canonical
    zero = jnp.zeros_like(w4)
    return g.sub(r, (zero, w4))              # - w4*2^32 (2^128 ≡ -2^32)


def _const_arrays():
    """The per-round constant tensors, shaped exactly as the ladder
    consumes them (the Pallas kernel takes them as INPUTS — Mosaic
    rejects captured non-scalar constants).  Order:
    c0[12,1]x2, fullA[3,12,1]x2, mid[12,1]x2, pc[22,1,1]x2,
    prow[22,12,1]x2, pcol[22,11,1]x2, fullB[3,12,1]x2."""
    srows = _S.reshape(_N_P, 2 * T - 1)

    def stack(rows):
        return (np.stack([_col_pair(r)[0] for r in rows]),
                np.stack([_col_pair(r)[1] for r in rows]))

    c0 = _col_pair(_C[0:T])
    fa = stack([_C[(r + 1) * T : (r + 2) * T] for r in range(_HALF_F - 1)])
    mid = _col_pair(_C[_HALF_F * T : (_HALF_F + 1) * T])
    pc_l, pc_h = _col_pair(_C[(_HALF_F + 1) * T
                              : (_HALF_F + 1) * T + _N_P])
    pc = (pc_l.reshape(_N_P, 1, 1), pc_h.reshape(_N_P, 1, 1))
    prow = stack([srows[r, :T] for r in range(_N_P)])
    pcol = stack([srows[r, T:] for r in range(_N_P)])
    base = (_HALF_F + 1) * T + _N_P
    fb = stack([_C[base + r * T : base + (r + 1) * T]
                for r in range(_HALF_F - 1)])
    flat = []
    for pair in (c0, fa, mid, pc, prow, pcol, fb):
        flat += [pair[0], pair[1]]
    return flat


_CONSTS = _const_arrays()


def _ladder(st, wm, wp, consts, unroll: bool = False):
    """The 30-round permutation over a [12, B] pair; wm/wp are the
    [180, 96] bf16 weight arrays, `consts` the _const_arrays() tensors.
    Pure jnp — runs identically inside the Pallas kernel (unroll=True:
    Mosaic cannot lower lax.scan with stacked xs) and as a plain-XLA
    reference (unroll=False: XLA compile time is superlinear in
    straight-line depth, the scan keeps ONE round body)."""
    (c0l, c0h, fal, fah, midl, midh, pcl, pch,
     prl, prh, pkl, pkh, fbl, fbh) = consts

    def full_rounds(state, cl, ch):
        def body(carry, xs):
            s = _pow7(carry)
            s = _add_nc(s, (xs[0], xs[1]))
            s = _mds_mxu(s, wm)
            return s, None

        if unroll:
            for r in range(cl.shape[0]):
                state, _ = body(state, (cl[r], ch[r]))
            return state
        state, _ = jax.lax.scan(body, state, (cl, ch))
        return state

    st = _add_nc(st, (c0l, c0h))
    st = full_rounds(st, fal, fah)
    st = _pow7(st)
    st = _add_nc(st, (midl, midh))
    st = _mds_mxu(st, wp)

    # the 22 partial rounds as ONE lax.scan over per-round constants
    def pround(carry, xs):
        slo, shi = carry
        cl, ch, rl, rh, kl, kh = xs
        s0 = _pow7((slo[0:1], shi[0:1]))
        s0 = _add_nc(s0, (cl, ch))
        stx = (jnp.concatenate([s0[0], slo[1:]], axis=0),
               jnp.concatenate([s0[1], shi[1:]], axis=0))
        new0 = _sum_rows(_mul(stx, (rl, rh)))
        tail = _add_nc((stx[0][1:], stx[1][1:]),
                       _mul(s0, (kl, kh)))  # [1,B] x [11,1] -> [11,B]
        return (jnp.concatenate([new0[0], tail[0]], axis=0),
                jnp.concatenate([new0[1], tail[1]], axis=0)), None

    if unroll:
        for r in range(_N_P):
            st, _ = pround(st, (pcl[r], pch[r], prl[r], prh[r],
                                pkl[r], pkh[r]))
    else:
        st, _ = jax.lax.scan(pround, st, (pcl, pch, prl, prh, pkl, pkh))
    st = full_rounds(st, fbl, fbh)
    st = _pow7(st)
    st = _mds_mxu(st, wm)
    return g._canon(st[0], st[1])


def _kernel(*refs):
    wm_ref, wp_ref = refs[0], refs[1]
    consts = [r[...] for r in refs[2:16]]
    lo_ref, hi_ref, out_lo_ref, out_hi_ref = refs[16:20]
    out = _ladder((lo_ref[...], hi_ref[...]), wm_ref[...], wp_ref[...],
                  consts, unroll=True)
    out_lo_ref[...] = out[0]
    out_hi_ref[...] = out[1]


def _ref_compiler_options() -> dict | None:
    """XLA:CPU's fusion pass is superlinear in the ladder's depth (same
    pathology as ops/vm_jax._segment_compiler_options — producer cloning
    compounds across the 30 sequential rounds); drop it on cpu."""
    if jax.default_backend() == "cpu":
        return {"xla_disable_hlo_passes": "fusion"}
    return None


@partial(jax.jit, compiler_options=None)
def _permute_ref_tpu(state_lo, state_hi):
    return _ladder((state_lo, state_hi),
                   jnp.asarray(_W_M), jnp.asarray(_W_PM),
                   [jnp.asarray(c) for c in _CONSTS])


_permute_ref_cpu = None


def permute_ref(state_lo, state_hi):
    """Plain-XLA reference of the kernel math: [12, B] pair in/out."""
    global _permute_ref_cpu
    if jax.default_backend() != "cpu":
        return _permute_ref_tpu(state_lo, state_hi)
    if _permute_ref_cpu is None:
        _permute_ref_cpu = jax.jit(
            lambda a, b: _ladder((a, b), jnp.asarray(_W_M),
                                 jnp.asarray(_W_PM),
                                 [jnp.asarray(c) for c in _CONSTS]),
            compiler_options=_ref_compiler_options())
    return _permute_ref_cpu(state_lo, state_hi)


@partial(jax.jit, static_argnames=("block", "interpret"))
def permute_t(state_lo, state_hi, block: int = 1024,
              interpret: bool = False):
    """Transposed permutation: [12, B] u32 pair in and out."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = state_lo.shape[1]
    assert B % block == 0, (B, block)
    grid = (B // block,)
    spec = pl.BlockSpec((T, block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((T * _NC, T * 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    cspecs = [pl.BlockSpec(c.shape, (lambda rank: (
        lambda i: (0,) * rank))(c.ndim), memory_space=pltpu.VMEM)
        for c in _CONSTS]
    out_shape = [jax.ShapeDtypeStruct((T, B), jnp.uint32)] * 2
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    lo, hi = pl.pallas_call(
        _kernel, grid=grid,
        in_specs=[wspec, wspec] + cspecs + [spec, spec],
        out_specs=[spec, spec],
        out_shape=out_shape, interpret=interpret,
        compiler_params=params,
    )(jnp.asarray(_W_M), jnp.asarray(_W_PM),
      *[jnp.asarray(c) for c in _CONSTS], state_lo, state_hi)
    return lo, hi


def permute(state, interpret: bool = False):
    """[B, 12] u32 pair -> [B, 12] u32 pair (ops/poseidon_jax.py
    interface), padding the batch up to a block multiple."""
    lo, hi = state
    B = lo.shape[0]
    block = 1024 if B >= 1024 else max(8, B)
    padded = -(-B // block) * block
    if padded != B:
        lo = jnp.pad(lo, ((0, padded - B), (0, 0)))
        hi = jnp.pad(hi, ((0, padded - B), (0, 0)))
    olo, ohi = permute_t(lo.T, hi.T, block=block, interpret=interpret)
    return (olo.T[:B], ohi.T[:B])
