"""Single-chip TPU commit backend: LDE + full Merkle tree on device.

The prover's dominant stage (extend_and_merkelize, reference
stark_gen.rs:710) executed on the TPU: one jitted program does the coset
LDE of all columns and hashes every tree level (Pallas Poseidon when
available, fused-XLA otherwise).  The tree NODES STAY ON DEVICE — only the
root (32 B) comes back eagerly; query-time sibling paths are fetched with
one gather per (tree, index), so the ~2x-elements node volume never rides
the host link.  Enabled with EIGEN_ZKVM_TPU_COMMIT=1 (stark/stark_gen.py
checks it), or used directly.  The multi-chip variant is parallel/sharded.py.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hash.merkle_gl import MerkleTreeGL
from ..parallel import meshctx
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


def _flatten_levels(levels, stack):
    """Concat unrolled levels + the scan tail into one flat [total, 4]
    node array (tail level j stored with stride T at its scan slot)."""
    parts_lo = [l[0] for l in levels]
    parts_hi = [l[1] for l in levels]
    if stack is not None:
        t, T = stack[0].shape[0], stack[0].shape[1]
        parts_lo.append(stack[0].reshape(t * T, 4))
        parts_hi.append(stack[1].reshape(t * T, 4))
    return (jnp.concatenate(parts_lo, axis=0),
            jnp.concatenate(parts_hi, axis=0))


def _flatten_eager(levels, stack):
    """_flatten_levels outside any enclosing jit (eager jnp concat):
    used by the split >= 2^23 commit path."""
    return _flatten_levels(levels, stack)


@partial(jax.jit, donate_argnums=(0, 1))
def _flat_write(flo, fhi, lvl_lo, lvl_hi, off):
    """Write one level into the preallocated flat node buffer IN PLACE
    (donated): the concat-based flatten doubles the ~1 GB node storage
    transiently, which the >= 2^23 prove cannot afford."""
    return (jax.lax.dynamic_update_slice(flo, lvl_lo, (off, 0)),
            jax.lax.dynamic_update_slice(fhi, lvl_hi, (off, 0)))


# Levels at or below this node count run as ONE fused program in the
# eager tree (9+ levels + the tail scan + their flat-store writes fold
# into a single dispatch).  Peak transient of the fused chunk is ~2x the
# first fused level (<= 2^20 x 4 x u32-pair = 64 MB) — irrelevant next
# to the 2^24-leaf levels that stay eager for the HBM budget.  Every
# program through the remote tunnel pays dispatch RTT, and the eager
# tree was ~28 programs of which ~20 were these small levels.
EAGER_FUSE_NODES = 1 << 20


@partial(jax.jit, static_argnames=("n0",))
def _small_levels_fused(lo, hi, n0: int):
    """All levels from a [n0, 4] node level down (binary until the tail,
    then the constant-shape scan) as ONE program; returns the flat
    concatenation in _level_meta storage order."""
    lvl = (lo, hi)
    outs_lo, outs_hi = [], []
    tail = pj.MERKLE_TAIL
    n = n0
    while n > 1 and (n > tail or (n & (n - 1))):
        if n % 2 == 1:
            lvl = (jnp.concatenate(
                [lvl[0], jnp.zeros((1, 4), jnp.uint32)], axis=0),
                jnp.concatenate(
                [lvl[1], jnp.zeros((1, 4), jnp.uint32)], axis=0))
        lvl = pj._level_block_jit(lvl[0], lvl[1])
        outs_lo.append(lvl[0])
        outs_hi.append(lvl[1])
        n = (n - 1) // 2 + 1
    if n > 1:
        stack = pj._tail_stack_jit(lvl)
        T = n
        t = T.bit_length() - 1
        outs_lo.append(stack[0].reshape(t * T, 4))
        outs_hi.append(stack[1].reshape(t * T, 4))
    return jnp.concatenate(outs_lo, axis=0), jnp.concatenate(outs_hi, axis=0)


def _eager_flat_tree(lde, n_pols: int, height: int):
    """Level-at-a-time tree build for the big single-device path: each
    BIG level is its own program (HBM budget), the previous level's
    buffer is freed as soon as it is written into the flat store, the
    flat store is updated by donation, and everything from
    EAGER_FUSE_NODES down runs as one fused program."""
    sizes, offsets = _level_meta(height)
    tail = pj.MERKLE_TAIL
    # unrolled-level count mirrors _level_meta's first while loop
    n_unrolled = 1
    n = height
    while n > 1 and (n > tail or (n & (n - 1))):
        n = (n - 1) // 2 + 1
        n_unrolled += 1
    total = offsets[n_unrolled - 1] + sizes[n_unrolled - 1]
    if n > 1:  # tail scan appends t levels stored at stride T
        total += (n.bit_length() - 1) * n
    flo = jnp.zeros((total, 4), jnp.uint32)
    fhi = jnp.zeros((total, 4), jnp.uint32)
    lvl = pj._hash_leaves_jit(lde, n_pols)
    flo, fhi = _flat_write(flo, fhi, lvl[0], lvl[1], 0)
    n = height
    k = 0
    while n > 1 and (n > tail or (n & (n - 1))):
        if n <= EAGER_FUSE_NODES:
            rest_lo, rest_hi = _small_levels_fused(lvl[0], lvl[1], n)
            return _flat_write(flo, fhi, rest_lo, rest_hi,
                               offsets[k] + sizes[k])
        if n % 2 == 1:
            lvl = (jnp.concatenate(
                [lvl[0], jnp.zeros((1, 4), jnp.uint32)], axis=0),
                jnp.concatenate(
                [lvl[1], jnp.zeros((1, 4), jnp.uint32)], axis=0))
        lvl = pj._level_step_jit(lvl)
        k += 1
        flo, fhi = _flat_write(flo, fhi, lvl[0], lvl[1], offsets[k])
        n = (n - 1) // 2 + 1
    if n > 1:
        stack = pj._tail_stack_jit(lvl)
        T = n
        t = T.bit_length() - 1
        base = offsets[k] + sizes[k]
        flo, fhi = _flat_write(flo, fhi, stack[0].reshape(t * T, 4),
                               stack[1].reshape(t * T, 4), base)
    return flo, fhi


def _level_meta(height: int):
    """(true sizes, storage offsets) per level, mirroring
    poseidon_jax.merkle_levels' unrolled/scan-tail structure."""
    tail = pj.MERKLE_TAIL
    sizes = [height]
    n = height
    while n > 1 and (n > tail or (n & (n - 1))):
        n = (n - 1) // 2 + 1
        sizes.append(n)
    offsets = [0]
    for s in sizes[:-1]:
        offsets.append(offsets[-1] + s)
    if n > 1:
        T = n
        t = T.bit_length() - 1
        base = offsets[-1] + sizes[-1]
        # the unrolled list already ends at size T (its nodes are level 0
        # of the tail input); scan outputs t further levels
        for j in range(t):
            sizes.append(T >> (j + 1))
            offsets.append(base + j * T)
    return sizes, offsets


@partial(jax.jit, static_argnames=("nbits", "nbits_ext", "n_pols", "ma"))
def _lde_and_levels(lo, hi, nbits: int, nbits_ext: int, n_pols: int,
                    ma=None):
    # mesh layout: NTT pol-sharded (row butterflies local), then ONE
    # all_to_all reshard to row-sharded leaves/levels (fft_p.rs transpose
    # analog) — XLA inserts the collective at the constraint switch
    pair = meshctx.cols((lo, hi), ma)
    lde = meshctx.rows(ntt_jax.interpolate(pair, nbits, nbits_ext), ma)
    levels, stack = pj.merkle_levels(lde, n_pols, 1 << nbits_ext, ma=ma)
    return lde, _flatten_levels(levels, stack)


@partial(jax.jit, static_argnames=("nbits", "nbits_ext", "ma"))
def _lde_only(lo, hi, nbits: int, nbits_ext: int, ma=None):
    pair = meshctx.cols((lo, hi), ma)
    return meshctx.rows(ntt_jax.interpolate(pair, nbits, nbits_ext), ma)


def _lde_eager(lo, hi, nbits: int, nbits_ext: int):
    """The big-domain LDE as a chain of per-stage programs (see
    ntt_pallas.interpolate_eager): the fused single-program interpolate
    holds ~12 full-array copies of HLO temp at 2^24 rows."""
    from . import ntt_pallas

    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)
    return ntt_pallas.interpolate_eager((lo, hi), nbits, nbits_ext)


@partial(jax.jit, static_argnames=("width", "height", "ma"))
def _levels_only(lo, hi, width: int, height: int, ma=None):
    levels, stack = pj.merkle_levels(meshctx.rows((lo, hi), ma),
                                     width, height, ma=ma)
    return _flatten_levels(levels, stack)


@jax.jit
def _gather_rows(flat_lo, flat_hi, idxs):
    return flat_lo[idxs], flat_hi[idxs]


class DeviceMerkleTreeGL(MerkleTreeGL):
    """MerkleTreeGL whose node levels AND leaf elements live on the
    accelerator.

    Proof format and root are identical to the host tree; only the storage
    differs.  `levels` is intentionally left empty.  `elements` is lazy: in
    the device-resident prove nothing ever materializes the full LDE on the
    host — query rows come back through `prefetch` (one batched gather for
    all query indices) or a per-index gather."""

    def __init__(self, flat_pair, sizes, offsets):
        super().__init__()
        self._flat = flat_pair               # (lo, hi) device [total, 4]
        self._sizes = [int(s) for s in sizes]       # true nodes per level
        self._offsets = [int(o) for o in offsets]   # storage offsets
        self._root = None
        self._elem_pair = None               # (lo, hi) device [height, w]
        self._pref: dict[int, tuple] = {}    # idx -> (row, [sib digests])

    # `elements` stays assignable (host paths set it) but materializes the
    # device pair on demand for host consumers (to_extend / host VM).
    @property
    def elements(self):
        if self._elements is None and self._elem_pair is not None:
            self._elements = _join(*self._elem_pair)
        return self._elements

    @elements.setter
    def elements(self, v):
        self._elements = v

    def set_device_elements(self, pair):
        self._elem_pair = pair
        self._elements = None

    def root(self) -> np.ndarray:
        if self._root is None:
            lo, hi = _gather_rows(*self._flat,
                                  jnp.asarray([self._offsets[-1]]))
            self._root = _join(lo, hi)[0]
        return self._root

    def _sibling_indices(self, idx: int):
        depth = len(self._sizes) - 1
        idxs = np.zeros(depth, dtype=np.int64)
        mask = np.zeros(depth, dtype=bool)
        i = idx
        for lvl in range(depth):
            sib = i ^ 1
            if sib < self._sizes[lvl]:
                idxs[lvl] = self._offsets[lvl] + sib
                mask[lvl] = True
            i >>= 1
        return idxs, mask

    def prefetch(self, indices):
        """One batched device gather for all query rows + sibling paths."""
        todo = [i for i in dict.fromkeys(int(i) for i in indices)
                if i not in self._pref]
        if not todo:
            return
        depth = len(self._sizes) - 1
        all_idx = np.zeros((len(todo), depth), dtype=np.int32)
        all_mask = np.zeros((len(todo), depth), dtype=bool)
        for k, idx in enumerate(todo):
            all_idx[k], all_mask[k] = self._sibling_indices(idx)
        lo, hi = _gather_rows(*self._flat, jnp.asarray(all_idx.ravel()))
        rows = _join(lo, hi).reshape(len(todo), depth, 4)
        rows[~all_mask] = 0
        if self._elements is not None:
            elems = self._elements[np.asarray(todo)]
        else:
            elo, ehi = _gather_rows(*self._elem_pair,
                                    jnp.asarray(todo, dtype=np.int32))
            elems = _join(elo, ehi)
        for k, idx in enumerate(todo):
            self._pref[idx] = (elems[k],
                               [rows[k, lvl] for lvl in range(depth)])

    def get_group_proof(self, idx: int):
        assert idx < self.height
        if idx not in self._pref:
            self.prefetch([idx])
        v, mp = self._pref[idx]
        return v.copy(), [d.copy() for d in mp]

    # checkpoint support (StarkSetup.save): device arrays pickle as numpy;
    # they re-upload transparently on first use after load
    def __getstate__(self):
        d = self.__dict__.copy()
        d["_flat"] = tuple(np.asarray(x) for x in self._flat)
        if self._elem_pair is not None:
            d["_elem_pair"] = tuple(np.asarray(x) for x in self._elem_pair)
        return d


def tpu_extend_and_merkelize(buf: np.ndarray, nbits: int,
                             nbits_ext: int, cache: dict | None = None,
                             cache_key: str | None = None) -> MerkleTreeGL:
    """buf: [N, n_pols] u64 trace section -> Merkle tree over its LDE,
    computed on the default (TPU) device.  When `cache` is given, the
    device-resident LDE limb pair is deposited under `cache_key` so later
    device passes (ops/vm_jax.py) skip the re-upload.  The LDE never comes
    back to the host unless someone reads `tree.elements` (lazy)."""
    n_pols = buf.shape[1]
    if n_pols == 0:
        return MerkleTreeGL().merkelize(
            np.zeros((1 << nbits_ext, 0), dtype=np.uint64), 0, 1 << nbits_ext)
    lo, hi = _split(np.ascontiguousarray(buf))
    if nbits_ext >= 23 and meshctx.active() is None:
        # split programs: the fused interpolate+all-levels graph at
        # >= 2^23 (13+ unrolled hash levels) crashes the remote XLA
        # compile helper — the LDE runs as one program and every Merkle
        # level as its own, written into a donated flat node buffer
        # (the concat flatten transiently doubles ~1 GB of node storage
        # the 2^23 prove doesn't have)
        lde = _lde_eager(lo, hi, nbits, nbits_ext)
        flat = _eager_flat_tree(lde, n_pols, 1 << nbits_ext)
    else:
        lde, flat = _lde_and_levels(lo, hi, nbits, nbits_ext, n_pols,
                                    ma=meshctx.active())
    if cache is not None and cache_key:
        cache[cache_key] = lde
    tree = DeviceMerkleTreeGL(flat, *_level_meta(1 << nbits_ext))
    tree.set_device_elements(lde)
    tree.width = n_pols
    tree.height = 1 << nbits_ext
    return tree


def tpu_merkelize(buf: np.ndarray | None, cache: dict | None = None,
                  cache_key: str | None = None, pair=None,
                  shape: tuple | None = None) -> MerkleTreeGL:
    """Merkle tree over an already-extended [N_ext, w] section on device.
    Pass `pair` (device limb pair) to skip the host upload entirely; with
    buf=None the tree is fully device-backed (pass `shape` or let it come
    from the pair)."""
    if buf is not None:
        height, width = buf.shape
    elif shape is not None:
        height, width = shape
    else:
        height, width = pair[0].shape
    if pair is None:
        lo, hi = _split(np.ascontiguousarray(buf))
        pair = (jnp.asarray(lo), jnp.asarray(hi))
    if cache is not None and cache_key:
        cache[cache_key] = pair
    if height >= 1 << 23 and meshctx.active() is None:
        # big single-device trees build level-at-a-time into a donated
        # flat buffer (the fused all-levels program OOMs HBM at 2^24)
        flat = _eager_flat_tree(pair, width, height)
    else:
        flat = _levels_only(pair[0], pair[1], width, height,
                            ma=meshctx.active())
    tree = DeviceMerkleTreeGL(flat, *_level_meta(height))
    if buf is not None:
        tree.elements = buf
    else:
        tree.set_device_elements(pair)
    tree.width = width
    tree.height = height
    return tree


@partial(jax.jit,
         static_argnames=("q_dim", "q_deg", "nbits", "nbits_ext", "ma"))
def _q_split(qlo, qhi, q_dim: int, q_deg: int, nbits: int, nbits_ext: int,
             ma=None):
    """Stage-Q on device (stark_gen.rs Q-split): iNTT the quotient over the
    ext domain, unscale each degree-N monomial block off the coset, NTT the
    recombined [Next, q_dim*q_deg] matrix back to evaluations.

    Mesh layout: the quotient is only q_dim (2-3) columns wide — too narrow
    to pol-shard — and the VM hands it over ROW-sharded.  Row-sharded NTT
    butterflies cross shards at every stage (the partitioner would emit a
    collective per stage), so the one sane layout is: gather once
    (replicate), transform locally, and hand the result back row-sharded
    for the Merkle pass."""
    import numpy as _np
    from ..fields import gl64 as _gl

    N = 1 << nbits
    qlo = meshctx.replicated(qlo, ma)
    qhi = meshctx.replicated(qhi, ma)
    qq1 = ntt_jax.intt((qlo, qhi), nbits_ext)
    shift_inv_n = _gl.exp(_gl.inv(_np.uint64(_gl.SHIFT)), N)
    blocks_lo, blocks_hi = [], []
    cur_s = _np.uint64(1)
    next_ = 1 << nbits_ext
    for p in range(q_deg):
        blk = (qq1[0][p * N : (p + 1) * N], qq1[1][p * N : (p + 1) * N])
        blk = g.mul(blk, g.scalar(int(cur_s)))
        pad = [(0, next_ - N), (0, 0)]
        blocks_lo.append(jnp.pad(blk[0], pad))
        blocks_hi.append(jnp.pad(blk[1], pad))
        cur_s = _gl.mul(cur_s, shift_inv_n)
    qq2 = (jnp.concatenate(blocks_lo, axis=1),
           jnp.concatenate(blocks_hi, axis=1))
    return meshctx.rows(ntt_jax.ntt(qq2, nbits_ext), ma)


@partial(jax.jit, static_argnames=("next_",))
def _q_block_jit(lo, hi, slo, shi, next_: int):
    """One degree-N monomial block: coset-unscale by the scalar power and
    zero-pad to the extended domain."""
    blk = g.mul((lo, hi), (slo, shi))
    pad = [(0, next_ - lo.shape[0]), (0, 0)]
    return jnp.pad(blk[0], pad), jnp.pad(blk[1], pad)


def _q_split_eager(q_pair, q_dim: int, q_deg: int, nbits: int,
                   nbits_ext: int):
    """_q_split with per-stage program dispatch: the fused form's NTT
    glue holds ~12 full-array copies of HLO temp at 2^24 rows (width-
    independent), which the big single-device prove cannot fit."""
    import numpy as _np

    from ..fields import gl64 as _gl
    from . import ntt_pallas

    N = 1 << nbits
    next_ = 1 << nbits_ext
    qq1 = ntt_pallas.intt_eager(q_pair, nbits_ext)
    shift_inv_n = _gl.exp(_gl.inv(_np.uint64(_gl.SHIFT)), N)
    blocks_lo, blocks_hi = [], []
    cur_s = _np.uint64(1)
    for p in range(q_deg):
        s = g.scalar(int(cur_s))
        bl, bh = _q_block_jit(qq1[0][p * N : (p + 1) * N],
                              qq1[1][p * N : (p + 1) * N], s[0], s[1],
                              next_)
        blocks_lo.append(bl)
        blocks_hi.append(bh)
        cur_s = _gl.mul(cur_s, shift_inv_n)
    del qq1
    qq2 = (jnp.concatenate(blocks_lo, axis=1),
           jnp.concatenate(blocks_hi, axis=1))
    del blocks_lo, blocks_hi
    return ntt_pallas.ntt_eager(qq2, nbits_ext)


def tpu_q_split(q_pair, q_dim: int, q_deg: int, nbits: int, nbits_ext: int):
    """Device Q-split over the cached q_2ns limb pair; returns the cm4_2ns
    pair (still on device) — deposit it in the cache and merkelize from it."""
    if nbits_ext >= 23 and meshctx.active() is None:
        return _q_split_eager(q_pair, q_dim, q_deg, nbits, nbits_ext)
    return _q_split(q_pair[0], q_pair[1], q_dim, q_deg, nbits, nbits_ext,
                    ma=meshctx.active())


def enabled() -> bool:
    if not os.environ.get("EIGEN_ZKVM_TPU_COMMIT"):
        return False
    try:
        return any(d.platform in ("tpu", "axon") for d in jax.devices())
    except Exception:
        return False
