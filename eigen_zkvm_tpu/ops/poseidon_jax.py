"""Batched Poseidon-GL permutation + Merkle tree construction in JAX.

TPU-shaped: state lives as [B, 12] u32-pair tensors; each dense layer is ONE
broadcasted vector multiply [B, 12, 12] + a log-depth modular reduction
(instead of 144 scalar muls), and the round ladder is a lax.scan over
per-round constant rows, so the traced graph stays small (fast compiles) and
XLA fuses each round body.  Digests are bit-exact with hash/poseidon_gl.py.
(reference counterparts: starky/src/poseidon_opt.rs, linearhash.rs,
merklehash.rs — there parallelized with rayon; here one device-wide batch.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hash import poseidon_gl as pnp
from . import gl_jax as g

T = 12
N_ROUNDS_F = 8
N_ROUNDS_P = 22
_HALF_F = N_ROUNDS_F // 2

_C = pnp.C.copy()          # [118] u64
_M = pnp.M.copy()          # [12,12]
_PM = pnp.PMAT.copy()
_S = pnp.S.copy()          # [506]

# constant tables as u32 pairs — NUMPY, not jnp: a module-level jnp.asarray
# creates the default backend client at import time, which with a remote
# (axon) accelerator tunnel blocks every import of this module on tunnel
# liveness (and pins the constants to the wrong device).  numpy constants
# are baked in as literals when traced under jit — same compiled code.
def _pair_const(x):
    x = np.asarray(x, dtype=np.uint64)
    return ((x & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (x >> np.uint64(32)).astype(np.uint32))


_C_FULL_A = _pair_const(_C[T : _HALF_F * T].reshape(_HALF_F - 1, T))     # rounds 1..3
_C_MID = _pair_const(_C[_HALF_F * T : (_HALF_F + 1) * T])                # opt fold
_C_PART = _pair_const(_C[(_HALF_F + 1) * T : (_HALF_F + 1) * T + N_ROUNDS_P])
_C0 = _pair_const(_C[0:T])
_C_FULL_B = _pair_const(
    _C[(_HALF_F + 1) * T + N_ROUNDS_P : (_HALF_F + 1) * T + N_ROUNDS_P
       + (_HALF_F - 1) * T].reshape(_HALF_F - 1, T))
_M_P = _pair_const(_M)
_PM_P = _pair_const(_PM)
_S_ROWS = _pair_const(_S.reshape(N_ROUNDS_P, 2 * T - 1)[:, :T])          # [22,12]
_S_COLS = _pair_const(_S.reshape(N_ROUNDS_P, 2 * T - 1)[:, T:])          # [22,11]


def _reduce_sum(v, axis):
    """Modular sum along an axis by log-depth folding (power-of-2 padding)."""
    n = v[0].shape[axis]
    while n > 1:
        half = n // 2
        lo = (jax.lax.slice_in_dim(v[0], 0, half, axis=axis),
              jax.lax.slice_in_dim(v[1], 0, half, axis=axis))
        hi = (jax.lax.slice_in_dim(v[0], half, 2 * half, axis=axis),
              jax.lax.slice_in_dim(v[1], half, 2 * half, axis=axis))
        s = g.add(lo, hi)
        if n % 2:
            tail = (jax.lax.slice_in_dim(v[0], n - 1, n, axis=axis),
                    jax.lax.slice_in_dim(v[1], n - 1, n, axis=axis))
            s0 = (jax.lax.slice_in_dim(s[0], 0, 1, axis=axis),
                  jax.lax.slice_in_dim(s[1], 0, 1, axis=axis))
            s0 = g.add(s0, tail)
            s = (jax.lax.concatenate([s0[0], jax.lax.slice_in_dim(s[0], 1, half, axis=axis)], axis),
                 jax.lax.concatenate([s0[1], jax.lax.slice_in_dim(s[1], 1, half, axis=axis)], axis))
        v = s
        n = half
    return (jnp.squeeze(v[0], axis), jnp.squeeze(v[1], axis))


def _mat_layer(state, mat):
    """state [B,12] pair x mat [12,12] pair -> [B,12]; out[:,i]=sum_j s[:,j]*m[j,i]."""
    prod = g.mul((state[0][:, :, None], state[1][:, :, None]),
                 (mat[0][None, :, :], mat[1][None, :, :]))  # [B,12(j),12(i)]
    return _reduce_sum(prod, axis=1)


def _add_row(state, crow):
    return g.add(state, (crow[0][None, :], crow[1][None, :]))


def _use_mxu(B: int) -> bool:
    """EIGEN_ZKVM_POSEIDON=mxu routes permutes through the MXU Pallas
    kernel.  OFF by default even on TPU: the kernel is 2.2x faster
    standalone (12.2M perms/s, [12, B] layout), but this [B, 12]
    interface pays a minor-dim-12 transpose each way, and A/B of the
    full 2^20x8 prove measured the routing 2.2x SLOWER end-to-end
    (38.8s vs 17.5s).  Use the kernel via its native permute_t layout."""
    import os

    mode = os.environ.get("EIGEN_ZKVM_POSEIDON", "auto")
    if mode != "mxu":
        return False
    if B < 2048:
        return False
    from ..parallel import meshctx

    ma = meshctx.active()  # CPU-device mesh under a TPU plugin: no Pallas
    if ma is not None:
        return ma[0].devices.flat[0].platform == "tpu"
    return jax.default_backend() == "tpu"


def permute(state):
    """state: [B, 12] u32 pair -> [B, 12] u32 pair."""
    if _use_mxu(state[0].shape[0]):
        from . import poseidon_mxu

        return poseidon_mxu.permute(state)
    state = _add_row(state, _C0)

    def full_round(st, crow):
        st = g.pow7(st)
        st = _add_row(st, crow)
        st = _mat_layer(st, _M_P)
        return st, None

    state, _ = jax.lax.scan(full_round, state, _C_FULL_A)
    state = g.pow7(state)
    state = _add_row(state, _C_MID)
    state = _mat_layer(state, _PM_P)

    def partial_round(st, consts):
        c, srow, scol = consts
        s0 = g.pow7((st[0][:, 0], st[1][:, 0]))
        s0 = g.add(s0, c)
        st = (st[0].at[:, 0].set(s0[0]), st[1].at[:, 0].set(s0[1]))
        new0 = _reduce_sum(g.mul(st, (srow[0][None, :], srow[1][None, :])), axis=1)
        tail = g.add((st[0][:, 1:], st[1][:, 1:]),
                     g.mul((s0[0][:, None], s0[1][:, None]),
                           (scol[0][None, :], scol[1][None, :])))
        st = (jnp.concatenate([new0[0][:, None], tail[0]], axis=1),
              jnp.concatenate([new0[1][:, None], tail[1]], axis=1))
        return st, None

    # scan over 22 partial rounds; xs packed as a tuple of pairs
    state, _ = jax.lax.scan(
        lambda st, xs: partial_round(st, xs),
        state,
        ((_C_PART[0], _C_PART[1]), (_S_ROWS[0], _S_ROWS[1]), (_S_COLS[0], _S_COLS[1])),
    )

    def full_round_b(st, crow):
        st = g.pow7(st)
        st = _add_row(st, crow)
        st = _mat_layer(st, _M_P)
        return st, None

    state, _ = jax.lax.scan(full_round_b, state, _C_FULL_B)
    state = g.pow7(state)
    state = _mat_layer(state, _M_P)
    return state


def hash_n(inp, init_state):
    """inp [B,8] pair, init_state [B,4] pair -> [B,4] pair digests."""
    st = (jnp.concatenate([inp[0], init_state[0]], axis=1),
          jnp.concatenate([inp[1], init_state[1]], axis=1))
    out = permute(st)
    return (out[0][:, :4], out[1][:, :4])


def _pad_cols(v, width):
    cur = v[0].shape[1]
    if cur == width:
        return v
    pad = [(0, 0), (0, width - cur)]
    return (jnp.pad(v[0], pad), jnp.pad(v[1], pad))


def _hash_fold(rows):
    """Sponge-fold [B, w] pair -> [B, 4] digests (reference `_hash`)."""
    B, w = rows[0].shape
    if w <= 4:
        return _pad_cols(rows, 4)
    st = (jnp.zeros((B, 4), jnp.uint32), jnp.zeros((B, 4), jnp.uint32))
    n_full = w // 8
    for i in range(n_full):
        blk = (rows[0][:, i * 8 : (i + 1) * 8], rows[1][:, i * 8 : (i + 1) * 8])
        st = hash_n(blk, st)
    rem = w - n_full * 8
    if rem:
        blk = _pad_cols((rows[0][:, n_full * 8 :], rows[1][:, n_full * 8 :]), 8)
        st = hash_n(blk, st)
    return st


def hash_leaves(rows, w: int):
    """Leaf hash of [B, w] pair -> [B, 4] pair (linearhash.rs semantics)."""
    B = rows[0].shape[0]
    if w == 0:
        return (jnp.zeros((B, 4), jnp.uint32), jnp.zeros((B, 4), jnp.uint32))
    if w <= 4:
        return _pad_cols(rows, 4)
    bs = max(8, -(-w // 4))
    hsz = -(-w // bs)
    digs = []
    for c in range(hsz):
        sub = (rows[0][:, c * bs : min((c + 1) * bs, w)],
               rows[1][:, c * bs : min((c + 1) * bs, w)])
        digs.append(_hash_fold(sub))
    if hsz * 4 <= 4:
        return digs[0]
    cat = (jnp.concatenate([d[0] for d in digs], axis=1),
           jnp.concatenate([d[1] for d in digs], axis=1))
    return _hash_fold(cat)


MERKLE_TAIL = 2048  # power of two; levels at or below this size fold in a scan


def merkle_levels(elements, width: int, height: int, ma=None):
    """Full tree on device: elements [height, width] pair ->
    (levels, tail_stack) where `levels` is a list of [n,4] pair levels
    for sizes > MERKLE_TAIL (level 0 = leaf digests) and `tail_stack` is a
    pair of [t, T, 4] scan outputs for the remaining T=min(height, TAIL)
    -> 1 fold (tail level i holds its true T >> (i+1) nodes in the row
    prefix; rows beyond are don't-care garbage).

    The tail runs as ONE lax.scan over a constant-shape buffer — the same
    trick as fold_root_pow2 — so the whole tree costs ~log2(height/TAIL)+1
    traced permutations instead of log2(height): the XLA graph through a
    remote-TPU tunnel compiles in half the time, for T/2*log2(T) wasted
    (tiny) hashes.

    Under a mesh (`ma`), the unrolled big levels stay ROW-sharded and the
    tail is explicitly REPLICATED before the scan: without the reshard,
    XLA's SPMD partitioner cannot keep a stable layout through the scan
    body's pair-reshapes and falls back to "Involuntary full
    rematerialization" selects — the scaling killer the round-2 dryrun
    recorded.  The tail is <= 2*MERKLE_TAIL rows, so the one all-gather
    is 64 KB/device."""
    from ..parallel import meshctx

    lvl = hash_leaves(elements, width)
    levels = [lvl]
    n = height
    while n > 1 and (n > MERKLE_TAIL or (n & (n - 1))):
        if n % 2 == 1:
            lvl = (jnp.concatenate([lvl[0], jnp.zeros((1, 4), jnp.uint32)], axis=0),
                   jnp.concatenate([lvl[1], jnp.zeros((1, 4), jnp.uint32)], axis=0))
        m2 = lvl[0].shape[0]
        pairs = (lvl[0].reshape(m2 // 2, 8), lvl[1].reshape(m2 // 2, 8))
        B = pairs[0].shape[0]
        st = (jnp.zeros((B, 4), jnp.uint32), jnp.zeros((B, 4), jnp.uint32))
        lvl = meshctx.rows(hash_n(pairs, st), ma)
        levels.append(lvl)
        n = (n - 1) // 2 + 1
    if n == 1:
        return levels, None
    lvl = meshctx.replicated(lvl, ma)

    T = n  # power of two by the loop condition
    t = T.bit_length() - 1

    def step(carry, _):
        clo, chi = carry
        plo = clo.reshape((-1, 8))
        phi = chi.reshape((-1, 8))
        z = jnp.zeros((plo.shape[0], 4), jnp.uint32)
        hlo, hhi = hash_n((plo, phi), (z, z))
        new = (jnp.concatenate([hlo, clo[T // 2 :]], axis=0),
               jnp.concatenate([hhi, chi[T // 2 :]], axis=0))
        return new, new

    _, stack = jax.lax.scan(step, lvl, None, length=t)
    return levels, stack


# Upper bound on rows entering one un-blocked permutation: the MDS layer
# materializes a [B, 12, 12] u32-pair temp (1.1 GB at 2^20 rows), and the
# compiler's rematerialization doubles it — an un-blocked 2^23-leaf level
# asks for 18 GB of HBM and kills the north-star prove.  Bigger batches
# run as a lax.map over fixed-size blocks: same butterflies, bounded HBM.
# 2^18 keeps the transient under ~0.6 GB — the 2^23 prove runs within
# ~1.5 GB of the 15.75 GB budget, so every transient counts.
POSEIDON_BLOCK = 1 << 18


def _blocked_rows(fn, rows, block: int):
    """Apply fn ([B, w] pair -> [B, 4] pair) in lax.map blocks when B is
    a large multiple of `block`; plain call otherwise."""
    B = rows[0].shape[0]
    if B <= block or B % block:
        return fn(rows)
    K = B // block
    blk = (rows[0].reshape(K, block, rows[0].shape[1]),
           rows[1].reshape(K, block, rows[1].shape[1]))
    out = jax.lax.map(lambda p: fn(p), blk)
    return (out[0].reshape(B, 4), out[1].reshape(B, 4))


@partial(jax.jit, static_argnames=("width",))
def _hash_leaves_jit(elements, width: int):
    return _blocked_rows(lambda r: hash_leaves(r, width), elements,
                         POSEIDON_BLOCK)


@jax.jit
def _level_block_jit(plo, phi):
    """Hash one block of a binary level: [b,4] pair -> [b/2,4] pair."""
    b = plo.shape[0]
    pr = (plo.reshape(b // 2, 8), phi.reshape(b // 2, 8))
    st = (jnp.zeros((b // 2, 4), jnp.uint32),
          jnp.zeros((b // 2, 4), jnp.uint32))
    return hash_n(pr, st)


@jax.jit
def _level_loop_jit(lo, hi):
    """One big binary level as ONE program: a fori_loop walks contiguous
    2*POSEIDON_BLOCK-row windows, hashing each with a single traced
    hash_n instance into a preallocated half-size output — same blocked
    memory profile as the python-level dispatch form, one dispatch
    instead of n/blk.  Opt-in (EIGEN_ZKVM_MERKLE_LOOP=1) until measured
    on real hardware; bit-identity is pinned by tests."""
    n = lo.shape[0]
    blk = 2 * POSEIDON_BLOCK
    K = n // blk
    out_lo = jnp.zeros((n // 2, 4), jnp.uint32)
    out_hi = jnp.zeros((n // 2, 4), jnp.uint32)

    def body(k, outs):
        olo, ohi = outs
        slo = jax.lax.dynamic_slice(lo, (k * blk, 0), (blk, 4))
        shi = jax.lax.dynamic_slice(hi, (k * blk, 0), (blk, 4))
        pr = (slo.reshape(blk // 2, 8), shi.reshape(blk // 2, 8))
        z = jnp.zeros((blk // 2, 4), jnp.uint32)
        hlo, hhi = hash_n(pr, (z, z))
        return (jax.lax.dynamic_update_slice(olo, hlo, (k * (blk // 2), 0)),
                jax.lax.dynamic_update_slice(ohi, hhi, (k * (blk // 2), 0)))

    return jax.lax.fori_loop(0, K, body, (out_lo, out_hi))


def _level_step_jit(lvl):
    """One binary Merkle level (even size): [n,4] pair -> [n/2,4] pair.
    Sibling pairing is a RESHAPE (adjacent rows), not a strided gather —
    same values, and the strided form fails to compile at 2^24 rows.

    Levels past 2*POSEIDON_BLOCK run as PYTHON-LEVEL block dispatches
    (contiguous row slices, each its own program): a whole-array
    [n,4] -> [n/2,8] reshape forces a full relayout the hash keeps live
    (measured 13.2 GB of HLO temp at 2^24 nodes), and the lax.map
    nested-scan form fails to compile outright at that size.  With
    EIGEN_ZKVM_MERKLE_LOOP=1 the blocks run as a fori_loop inside ONE
    program instead (bit-identical; per-dispatch tunnel RTT amortized —
    measure before making it the default)."""
    import os

    n = lvl[0].shape[0]
    blk = 2 * POSEIDON_BLOCK
    if n <= blk or n % blk:
        return _level_block_jit(lvl[0], lvl[1])
    if os.environ.get("EIGEN_ZKVM_MERKLE_LOOP"):
        return _level_loop_jit(lvl[0], lvl[1])
    outs = [_level_block_jit(lvl[0][k : k + blk], lvl[1][k : k + blk])
            for k in range(0, n, blk)]
    return (jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.concatenate([o[1] for o in outs], axis=0))


@jax.jit
def _tail_stack_jit(lvl):
    """The constant-shape scan tail over a power-of-two [T,4] level."""
    T = lvl[0].shape[0]
    t = T.bit_length() - 1

    def step(carry, _):
        clo, chi = carry
        plo = clo.reshape((-1, 8))
        phi = chi.reshape((-1, 8))
        z = jnp.zeros((plo.shape[0], 4), jnp.uint32)
        hlo, hhi = hash_n((plo, phi), (z, z))
        new = (jnp.concatenate([hlo, clo[T // 2 :]], axis=0),
               jnp.concatenate([hhi, chi[T // 2 :]], axis=0))
        return new, new

    _, stack = jax.lax.scan(step, lvl, None, length=t)
    return stack


def merkle_levels_eager(elements, width: int, height: int):
    """merkle_levels semantics with EACH LEVEL as its own jitted program
    (device arrays flow between them).  The single fused program at
    >= 2^23 leaves (13+ unrolled levels) crashes the remote XLA compile
    helper; per-level programs compile in seconds each and the extra
    dispatch latency is noise at that size.  Single-device only."""
    lvl = _hash_leaves_jit(elements, width)
    levels = [lvl]
    n = height
    while n > 1 and (n > MERKLE_TAIL or (n & (n - 1))):
        if n % 2 == 1:
            lvl = (jnp.concatenate([lvl[0], jnp.zeros((1, 4), jnp.uint32)],
                                   axis=0),
                   jnp.concatenate([lvl[1], jnp.zeros((1, 4), jnp.uint32)],
                                   axis=0))
        lvl = _level_step_jit(lvl)
        levels.append(lvl)
        n = (n - 1) // 2 + 1
    if n == 1:
        return levels, None
    return levels, _tail_stack_jit(lvl)


@partial(jax.jit, static_argnums=(1, 2))
def merkle_root_jit(elements, width: int, height: int):
    levels, stack = merkle_levels(elements, width, height)
    if stack is None:
        return levels[-1]
    return (stack[0][-1, :1], stack[1][-1, :1])


def fold_root_pow2(digs):
    """Fold pair [..., n, 4] leaf digests (n a power of two) to pair [..., 4].

    Compile-friendly tree reduction: the digest buffer keeps a CONSTANT shape
    and every fori_loop iteration hashes all n/2 row pairs with ONE batched
    permutation (row i depends only on rows 2i, 2i+1, so the garbage beyond
    the live prefix never contaminates it) — one trace of hash_n total,
    instead of log2(n) differently-shaped instances.
    """
    lo, hi = digs
    n = lo.shape[-2]
    if n == 1:
        return (lo[..., 0, :], hi[..., 0, :])
    batch = lo.shape[:-2]
    nlev = n.bit_length() - 1
    assert 1 << nlev == n, "fold_root_pow2 requires a power-of-two leaf count"

    def body(_, buf):
        blo, bhi = buf
        plo = blo.reshape((-1, 8))
        phi = bhi.reshape((-1, 8))
        z = jnp.zeros((plo.shape[0], 4), jnp.uint32)
        hlo, hhi = hash_n((plo, phi), (z, z))
        hlo = hlo.reshape(batch + (n // 2, 4))
        hhi = hhi.reshape(batch + (n // 2, 4))
        return (jnp.concatenate([hlo, blo[..., n // 2 :, :]], axis=-2),
                jnp.concatenate([hhi, bhi[..., n // 2 :, :]], axis=-2))

    lo, hi = jax.lax.fori_loop(0, nlev, body, (lo, hi))
    return (lo[..., 0, :], hi[..., 0, :])


def merkle_root_pow2(elements, width: int):
    """Root of a tree over pair [height, width] elements, height a power of 2."""
    return fold_root_pow2(hash_leaves(elements, width))
