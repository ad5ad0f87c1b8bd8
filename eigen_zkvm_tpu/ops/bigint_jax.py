"""Batched 254-bit field arithmetic in JAX — the TPU SNARK-field engine.

Fq (BN254 base field) elements are [..., 16] uint32 arrays holding 16-bit
limbs (little-endian), so every partial product a_i*b_j fits a u32 exactly
and the whole schoolbook product is one outer-product + anti-diagonal
reduction on the VPU.

Design notes (TPU-shaped, not a bignum-library port):
- Montgomery multiply is SOS (separate operand scanning): full 512-bit
  product accumulated into 32 lazy u32 columns (each column sums at most
  64 sixteen-bit halves, far below 2^32), then 16 reduction rounds that
  only touch column i's exact value before retiring it — one multiply
  wave per round, no per-limb carry scan.
- Carry/borrow chains are log-depth Kogge-Stone prefix scans over the
  (generate, propagate) semigroup via jax.lax.associative_scan — never a
  sequential lax.scan over limbs.

This is the substrate for ops/ec_jax.py (batched Jacobian curve ops and
the TPU MSM) — the role bellperson's CUDA multiexp kernels play in the
reference (groth16/src/groth16.rs), built the TPU way.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NLIMB = 16          # 16 x 16-bit limbs = 256 bits
MASK16 = np.uint32(0xFFFF)

# BN254 base field
P_INT = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R_INT = 1 << 256
NPRIME_INT = (-pow(P_INT, -1, R_INT)) % R_INT   # -p^-1 mod 2^256
R2_INT = (R_INT * R_INT) % P_INT
ONE_MONT_INT = R_INT % P_INT


def limbs_from_int(x: int) -> np.ndarray:
    return np.array([(x >> (16 * i)) & 0xFFFF for i in range(NLIMB)],
                    dtype=np.uint32)


def pack(xs) -> np.ndarray:
    """list of ints -> [n, 16] u32 limb array."""
    out = np.zeros((len(xs), NLIMB), dtype=np.uint32)
    for i, x in enumerate(xs):
        x = int(x)
        for j in range(NLIMB):
            out[i, j] = (x >> (16 * j)) & 0xFFFF
    return out


def unpack(a) -> list:
    a = np.asarray(a)
    return [sum(int(a[i, j]) << (16 * j) for j in range(NLIMB))
            for i in range(a.shape[0])]


# numpy (NOT jnp): device placement must follow the caller's default
# device; module-import-time jnp arrays would pin to whatever device was
# default at import (see tests/conftest.py note on the TPU plugin).
_P = limbs_from_int(P_INT)
_R2 = limbs_from_int(R2_INT)
_ONE_MONT = limbs_from_int(ONE_MONT_INT)
_NPRIME = np.array([(NPRIME_INT >> (16 * i)) & 0xFFFF
                    for i in range(NLIMB)], dtype=np.uint32)


def _ks(g, p):
    """Carry-chain resolution along the limb axis: c_0 = 0,
    c_{i+1} = g_i | (p_i & c_i), with g/p mutually exclusive (true for
    both the carry case s>M / s==M and the borrow case a<b / a==b).

    Instead of a log-depth scan, pack the g/p bits of all limbs into ONE
    u32 bitmask per element and let the hardware adder do the prefix:
    with X = G|P, Y = G we get X&Y = G and X^Y = P, so the carry-in bits
    of the addition X+Y are exactly ((X+Y) ^ X ^ Y) — the whole chain in
    O(1) vector ops.  Works for widths up to 32 (the bit-32 carry-out of
    a 32-limb chain wraps away, and every 32-wide caller drops it anyway;
    the returned carry-out bool is only meaningful for widths <= 31).

    Returns (carry_in per limb as u32 0/1, final carry-out as bool)."""
    nl = g.shape[-1]
    pw = (np.uint32(1) << np.arange(nl, dtype=np.uint32))
    G = jnp.sum(g.astype(jnp.uint32) * pw, axis=-1)
    Pm = jnp.sum(p.astype(jnp.uint32) * pw, axis=-1)
    X = G | Pm
    S = X + G
    cmask = S ^ X ^ G                    # bit i = carry INTO limb i
    cin = (cmask[..., None] >> np.arange(nl, dtype=np.uint32)) & 1
    if nl < 32:
        cout = ((cmask >> nl) & 1).astype(bool)
    else:
        last = nl - 1
        cout = ((((G >> last) & 1)
                 | (((Pm >> last) & 1) & ((cmask >> last) & 1)))
                ).astype(bool)
    return cin, cout


def _add_wrap(a, b):
    """(a + b) mod 2^256 for canonical-limb inputs (1-bit carry chain)."""
    s = a + b
    cin, _ = _ks(s > MASK16, s == MASK16)
    return (s + cin) & MASK16


def _sub_wrap(a, b):
    """(a - b) mod 2^256 plus the final borrow (i.e. a < b)."""
    bin_, bout = _ks(a < b, a == b)
    return (a - b - bin_) & MASK16, bout


def _geq(a, b):
    """a >= b over little-endian 16-bit limb arrays."""
    _, bout = _ks(a < b, a == b)
    return ~bout


def _cond_sub_p(a):
    """Canonicalize a value < 2p to < p."""
    pb = jnp.broadcast_to(jnp.asarray(_P), a.shape)
    diff, borrow = _sub_wrap(a, pb)
    return jnp.where(borrow[..., None], a, diff)


def add(a, b):
    """(a + b) mod p, limbs in, limbs out."""
    return _cond_sub_p(_add_wrap(a, b))


def sub(a, b):
    """(a - b) mod p."""
    d, borrow = _sub_wrap(a, b)
    pb = jnp.broadcast_to(jnp.asarray(_P), a.shape)
    return jnp.where(borrow[..., None], _add_wrap(d, pb), d)


def _spread_matrix() -> np.ndarray:
    """0/1 anti-diagonal spreading matrix: row (i*16+j) of the first half
    sends lo(a_i*b_j) to column i+j; the second half sends hi halves to
    column i+j+1."""
    S = np.zeros((2 * NLIMB * NLIMB, 2 * NLIMB), np.int32)
    for i in range(NLIMB):
        for j in range(NLIMB):
            S[i * NLIMB + j, i + j] = 1
            S[NLIMB * NLIMB + i * NLIMB + j, i + j + 1] = 1
    return S


_S_MAT = _spread_matrix()


def _mul_cols(a, b):
    """Schoolbook product of two canonical 16-limb arrays into 32 lazy u32
    columns (anti-diagonal sums of the lo/hi product halves) — expressed
    as ONE int32 matmul against the spreading matrix, which keeps the XLA
    graph tiny and rides the MXU on TPU.  Each column accumulates at most
    32 sixteen-bit values — far below 2^31."""
    prod = a[..., :, None] * b[..., None, :]      # exact u32 products
    flat = prod.shape[:-2] + (NLIMB * NLIMB,)
    parts = jnp.concatenate(
        [(prod & MASK16).astype(jnp.int32).reshape(flat),
         (prod >> 16).astype(jnp.int32).reshape(flat)], axis=-1)
    return (parts @ jnp.asarray(_S_MAT)).astype(jnp.uint32)


def _normalize(cols):
    """Lazy u32 columns (values < 2^26) -> canonical 16-bit limbs of the
    same width.  One fold pass leaves 1-bit carries, then a Kogge-Stone
    pass finishes; the final carry-out is dropped (callers size the column
    array so it is mathematically zero)."""
    c = cols >> 16
    s = (cols & MASK16) + jnp.concatenate(
        [jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
    cin, _ = _ks(s > MASK16, s == MASK16)
    return (s + cin.astype(jnp.uint32)) & MASK16


def mont_mul(a, b):
    """Montgomery product a*b*R^-1 mod p (R = 2^256) via reduction by the
    full inverse: m = (t mod R) * (-p^-1 mod R) mod R, res = (t + m*p)/R.
    Three parallel schoolbook products and three log-depth normalizes —
    no sequential per-limb reduction rounds, so the XLA graph stays flat
    (~27% more u32 multiplies than CIOS, repaid many times over in
    sequential depth and compile size on the VPU)."""
    t = _normalize(_mul_cols(a, b))               # canonical 32 limbs
    # m = t * N' mod 2^256: slice the lazy columns to 16 BEFORE the fold
    # so carries out of column 15 are discarded (that IS the mod R)
    m = _normalize(_mul_cols(t[..., :NLIMB],
                             jnp.asarray(_NPRIME))[..., :NLIMB])
    u = _mul_cols(m, jnp.asarray(_P))             # lazy 32 columns
    s = _normalize(t + u)                         # t+u < 2^21+2^16 per col
    return _cond_sub_p(s[..., NLIMB:])


def to_mont(a):
    return mont_mul(a, jnp.broadcast_to(jnp.asarray(_R2), a.shape))


def from_mont(a):
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(a, one)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def mont_sq(a):
    return mont_mul(a, a)


def select(mask, a, b):
    """mask ? a : b (mask shape [...])."""
    return jnp.where(mask[..., None], a, b)
