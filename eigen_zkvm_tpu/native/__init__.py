"""Native (C++/OpenMP) host kernels, loaded via ctypes with a lazy g++ build.

The TPU is the scale-out compute path; these kernels are the host runtime's
hot loops (the role AVX2/AVX512 plays in the reference), used where device
dispatch latency would dominate (small proofs, transcript-sequential hashing).
Falls back silently if no compiler is available: callers must treat
`poseidon` as Optional.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "poseidon_gl.cpp")
_SO = os.path.join(_DIR, "libposeidon_gl.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-funroll-loops", "-shared", "-fPIC", "-fopenmp",
             "-march=native", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=300)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u64p = ctypes.c_void_p
    lib.poseidon_gl_set_constants.argtypes = [u64p] * 4
    lib.poseidon_gl_permute_batch.argtypes = [u64p, ctypes.c_size_t]
    lib.poseidon_gl_hash_n.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
    lib.poseidon_gl_hash_leaves.argtypes = [u64p, ctypes.c_size_t,
                                            ctypes.c_size_t, u64p]
    lib.poseidon_gl_merkle_level.argtypes = [u64p, ctypes.c_size_t, u64p]
    lib.poseidon_gl_merkle_tree.argtypes = [u64p, ctypes.c_size_t,
                                            ctypes.c_size_t, u64p]
    return lib


def _ptr(a: np.ndarray) -> int:
    # raw address for c_void_p argtypes; ~2x cheaper than ctypes.data_as and
    # safe because every call site keeps the array alive across the call
    return a.__array_interface__["data"][0]


class _PoseidonGL:
    """Batched Poseidon-GL on the host kernel; mirrors hash/poseidon_gl.py."""

    def __init__(self, lib, C, M, Pm, S):
        self._lib = lib
        self._keepalive = [np.ascontiguousarray(x, dtype=np.uint64)
                           for x in (C, M, Pm, S)]
        lib.poseidon_gl_set_constants(*[_ptr(x) for x in self._keepalive])

    def permute(self, inp: np.ndarray, init_state: np.ndarray) -> np.ndarray:
        B = inp.shape[0]
        state = np.empty((B, 12), dtype=np.uint64)
        state[:, 0:8] = inp
        state[:, 8:12] = init_state
        self._lib.poseidon_gl_permute_batch(_ptr(state), B)
        return state

    def hash_n(self, inp: np.ndarray, init_state: np.ndarray,
               out: int = 4) -> np.ndarray:
        inp = np.ascontiguousarray(inp, dtype=np.uint64)
        init_state = np.ascontiguousarray(init_state, dtype=np.uint64)
        B = inp.shape[0]
        res = np.empty((B, 12 if out > 4 else 4), dtype=np.uint64)
        if out <= 4:
            self._lib.poseidon_gl_hash_n(_ptr(inp), _ptr(init_state), _ptr(res), B)
            return res[:, :out]
        return self.permute(inp, init_state)[:, :out]

    def hash_leaves(self, rows: np.ndarray) -> np.ndarray:
        rows = np.ascontiguousarray(rows, dtype=np.uint64)
        B, w = rows.shape
        out = np.empty((B, 4), dtype=np.uint64)
        self._lib.poseidon_gl_hash_leaves(_ptr(rows), B, w, _ptr(out))
        return out

    def merkle_level(self, nodes: np.ndarray) -> np.ndarray:
        """nodes [n, 4], n even -> [n/2, 4]."""
        nodes = np.ascontiguousarray(nodes, dtype=np.uint64)
        n_pairs = nodes.shape[0] // 2
        out = np.empty((n_pairs, 4), dtype=np.uint64)
        self._lib.poseidon_gl_merkle_level(_ptr(nodes), n_pairs, _ptr(out))
        return out

    def merkle_tree(self, rows: np.ndarray) -> list[np.ndarray]:
        """Whole tree in one call: leaf rows [h, w] -> list of levels
        ([h,4], [ceil(h/2),4], ..., [1,4])."""
        rows = np.ascontiguousarray(rows, dtype=np.uint64)
        h = rows.shape[0]
        sizes = [h]
        n = h
        while n > 1:
            n = (n - 1) // 2 + 1
            sizes.append(n)
        buf = np.empty((sum(sizes), 4), dtype=np.uint64)
        self._lib.poseidon_gl_merkle_tree(_ptr(rows), h, rows.shape[1],
                                          _ptr(buf))
        levels = []
        pos = 0
        for s in sizes:
            levels.append(buf[pos : pos + s])
            pos += s
        return levels


poseidon: _PoseidonGL | None = None


_GLVEC_SRC = os.path.join(_DIR, "gl_vec.cpp")
_GLVEC_SO = os.path.join(_DIR, "libgl_vec.so")


class _GlVec:
    """Vectorized Goldilocks field ops + batched NTT (native/gl_vec.cpp).

    `try_add`/`try_sub`/`try_mul` return None when the operand pattern is
    not a native fast path (broadcasting other than scalar, exotic dtypes);
    callers fall back to the numpy reference path."""

    def __init__(self, lib):
        self._lib = lib
        u64p = ctypes.c_void_p
        for name in ("gl_vec_add", "gl_vec_sub", "gl_vec_mul",
                     "gl_vec_muladd"):
            getattr(lib, name).argtypes = [u64p, u64p, u64p, ctypes.c_size_t] \
                if name != "gl_vec_muladd" else [u64p] * 4 + [ctypes.c_size_t]
        for name in ("gl_vec_add_scalar", "gl_vec_sub_scalar",
                     "gl_vec_mul_scalar"):
            getattr(lib, name).argtypes = [u64p, ctypes.c_uint64, u64p,
                                           ctypes.c_size_t]
        lib.gl_vec_rsub_scalar.argtypes = [ctypes.c_uint64, u64p, u64p,
                                           ctypes.c_size_t]
        lib.gl_vec_prefix_product.argtypes = [u64p, u64p, ctypes.c_size_t]
        lib.gl_ntt.argtypes = [u64p, ctypes.c_size_t, ctypes.c_size_t,
                               u64p, u64p]
        lib.gl_f3_mul.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
        lib.gl_f3_mul_base.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
        lib.gl_f3_mul_triple.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
        lib.gl_vec_neg.argtypes = [u64p, u64p, ctypes.c_size_t]
        lib.gl_vec_mul_rows.argtypes = [u64p, u64p, u64p, ctypes.c_size_t,
                                        ctypes.c_size_t]
        lib.gl_f3_xdiv.argtypes = [u64p, u64p, u64p, u64p, ctypes.c_size_t]
        lib.gl_f3_dot.argtypes = [u64p, u64p, ctypes.c_size_t,
                                  ctypes.c_size_t, ctypes.c_size_t,
                                  ctypes.c_size_t, ctypes.c_int, u64p]

    @staticmethod
    def _prep(a):
        if not isinstance(a, np.ndarray) or a.dtype != np.uint64 or a.ndim == 0:
            return None
        return np.ascontiguousarray(a)

    def _binop(self, fn, scalar_fn, a, b, rscalar_fn=None):
        av, bv = self._prep(a), self._prep(b)
        if av is not None and bv is not None and av.shape == bv.shape:
            out = np.empty_like(av)
            fn(_ptr(av), _ptr(bv), _ptr(out), av.size)
            return out
        # scalar (0-d or python int / np.uint64) second operand
        if av is not None and np.ndim(b) == 0 and scalar_fn is not None:
            out = np.empty_like(av)
            scalar_fn(_ptr(av), ctypes.c_uint64(int(b)), _ptr(out), av.size)
            return out
        if bv is not None and np.ndim(a) == 0 and rscalar_fn is not None:
            out = np.empty_like(bv)
            rscalar_fn(ctypes.c_uint64(int(a)), _ptr(bv), _ptr(out), bv.size)
            return out
        return None

    def try_add(self, a, b):
        r = self._binop(self._lib.gl_vec_add, self._lib.gl_vec_add_scalar,
                        a, b)
        if r is None and np.ndim(a) == 0:  # add commutes
            r = self._binop(self._lib.gl_vec_add,
                            self._lib.gl_vec_add_scalar, b, a)
        return r

    def try_sub(self, a, b):
        return self._binop(self._lib.gl_vec_sub, self._lib.gl_vec_sub_scalar,
                           a, b, rscalar_fn=self._lib.gl_vec_rsub_scalar)

    def try_mul(self, a, b):
        # [.., k] * [.., 1] row-scale broadcasts (coefficient/quotient
        # scaling, ext-by-base products) take the single-pass kernel
        if isinstance(a, np.ndarray) and isinstance(b, np.ndarray) \
                and a.ndim == b.ndim and a.ndim >= 2:
            if b.shape == a.shape[:-1] + (1,) and a.shape[-1] > 1:
                return self._mul_rows(a, b)
            if a.shape == b.shape[:-1] + (1,) and b.shape[-1] > 1:
                return self._mul_rows(b, a)
        r = self._binop(self._lib.gl_vec_mul, self._lib.gl_vec_mul_scalar,
                        a, b)
        if r is None and np.ndim(a) == 0:  # mul commutes
            r = self._binop(self._lib.gl_vec_mul,
                            self._lib.gl_vec_mul_scalar, b, a)
        return r

    def _mul_rows(self, a, s):
        av = self._prep(a)
        sv = self._prep(s)
        if av is None or sv is None:
            return None
        k = av.shape[-1]
        out = np.empty_like(av)
        self._lib.gl_vec_mul_rows(_ptr(av), _ptr(sv), _ptr(out),
                                  av.size // k, k)
        return out

    def muladd(self, a, b, c):
        out = np.empty_like(a)
        self._lib.gl_vec_muladd(_ptr(a), _ptr(b), _ptr(c), _ptr(out), a.size)
        return out

    def prefix_product(self, a: np.ndarray) -> np.ndarray:
        a = np.ascontiguousarray(a, dtype=np.uint64)
        out = np.empty_like(a)
        self._lib.gl_vec_prefix_product(_ptr(a), _ptr(out), a.size)
        return out

    def f3_dot(self, l: np.ndarray, buf: np.ndarray, stride: int,
               off: int, dim: int) -> np.ndarray:
        """[3] = sum_i L[i] (*) buf[i*stride, off:off+dim] — the openings
        dot (dim 1: base column broadcast; dim 3: F3 product)."""
        lv = np.ascontiguousarray(l, dtype=np.uint64)
        if not (isinstance(buf, np.ndarray) and buf.dtype == np.uint64
                and buf.ndim == 2 and buf.flags["C_CONTIGUOUS"]):
            return None
        out = np.zeros(3, dtype=np.uint64)
        self._lib.gl_f3_dot(_ptr(lv), _ptr(buf), stride, off,
                            buf.shape[1], lv.shape[0], dim, _ptr(out))
        return out

    def f3_xdiv(self, x: np.ndarray, point: np.ndarray) -> np.ndarray:
        """[n] base-field x, [3] point -> [n, 3] x/(x - point) in GF(p^3)
        (adjugate + ONE Montgomery-batched norm inversion in C)."""
        xv = np.ascontiguousarray(x, dtype=np.uint64)
        pv = np.ascontiguousarray(np.asarray(point, dtype=np.uint64)[:3])
        out = np.empty((xv.size, 3), dtype=np.uint64)
        scratch = np.empty(2 * xv.size, dtype=np.uint64)
        self._lib.gl_f3_xdiv(_ptr(xv), _ptr(pv), _ptr(out), _ptr(scratch),
                             xv.size)
        return out

    @staticmethod
    def _is_row_broadcast(x) -> bool:
        """[n, 3] view that repeats one physical row (challenge/eval)."""
        return (isinstance(x, np.ndarray) and x.ndim == 2
                and x.shape[1] == 3 and x.strides[0] == 0)

    def try_f3_mul(self, a, b):
        """[..., 3] x [..., 3] extension product, or None if not native."""
        if self._is_row_broadcast(b) and isinstance(a, np.ndarray) \
                and a.shape == b.shape:
            return self._f3_mul_triple(a, b[0])
        if self._is_row_broadcast(a) and isinstance(b, np.ndarray) \
                and a.shape == b.shape:
            return self._f3_mul_triple(b, a[0])
        av, bv = self._prep(a), self._prep(b)
        if av is None or bv is None or av.shape != bv.shape \
                or av.shape[-1] != 3:
            return None
        out = np.empty_like(av)
        self._lib.gl_f3_mul(_ptr(av), _ptr(bv), _ptr(out), av.size // 3)
        return out

    def _f3_mul_triple(self, a, triple):
        av = self._prep(a)
        if av is None or av.shape[-1] != 3:
            return None
        t = np.ascontiguousarray(triple, dtype=np.uint64)
        out = np.empty_like(av)
        self._lib.gl_f3_mul_triple(_ptr(av), _ptr(t), _ptr(out), av.size // 3)
        return out

    def try_neg(self, a):
        av = self._prep(a)
        if av is None:
            return None
        out = np.empty_like(av)
        self._lib.gl_vec_neg(_ptr(av), _ptr(out), av.size)
        return out

    def try_f3_mul_base(self, a, s):
        """[..., 3] triples scaled by base-field [...] array, or None."""
        av, sv = self._prep(a), self._prep(s)
        if av is None or sv is None or av.shape[-1] != 3 \
                or sv.shape != av.shape[:-1]:
            return None
        out = np.empty_like(av)
        self._lib.gl_f3_mul_base(_ptr(av), _ptr(sv), _ptr(out), av.size // 3)
        return out

    def ntt_inplace(self, buf: np.ndarray, n: int, k: int,
                    pows: np.ndarray, rev: np.ndarray):
        self._lib.gl_ntt(_ptr(buf), n, k, _ptr(pows), _ptr(rev))


gl_vec: _GlVec | None = None


_EC_SRC = os.path.join(_DIR, "ec_curves.cpp")
_EC_SO = os.path.join(_DIR, "libec_curves.so")


class RawAffine:
    """Affine points as the native kernels' raw limb rows ([n, width*NL]
    u64, little-endian; all-zero row = infinity).  Sequence of decoded
    points on demand (tuple for G1, coefficient pairs for G2) — the
    fixed-base batches return this so MSMs over proving-key queries skip
    the bigint <-> limb marshalling round-trip entirely."""

    def __init__(self, limbs: np.ndarray, n_limbs: int, width: int):
        self.limbs = limbs
        self.n_limbs = n_limbs
        self.width = width

    def __len__(self):
        return self.limbs.shape[0]

    def __getitem__(self, i):
        if isinstance(i, slice):
            return RawAffine(self.limbs[i], self.n_limbs, self.width)
        row = self.limbs[i]  # IndexError past the end ends iteration
        n = self.n_limbs
        coords = [sum(int(row[j * n + k]) << (64 * k) for k in range(n))
                  for j in range(self.width)]
        if all(c == 0 for c in coords):
            return None
        if self.width == 2:
            return (coords[0], coords[1])
        return ((coords[0], coords[1]), (coords[2], coords[3]))

    def __eq__(self, other):
        try:
            if len(other) != len(self):
                return False
            return all(self[i] == other[i] for i in range(len(self)))
        except TypeError:
            return NotImplemented

    def __getstate__(self):
        return (self.limbs, self.n_limbs, self.width)

    def __setstate__(self, st):
        self.limbs, self.n_limbs, self.width = st


class _EcCurve:
    """One curve's G1/G2 MSM + fixed-base batches + Fr NTT quotient
    (native/ec_curves.cpp; symbol prefix selects BN254 or BLS12-381)."""

    def __init__(self, lib, prefix: str, n_limbs: int):
        self._lib = lib
        self._n = n_limbs
        u64p = ctypes.c_void_p
        self._g1_msm = getattr(lib, f"{prefix}_g1_msm")
        self._g2_msm = getattr(lib, f"{prefix}_g2_msm")
        self._g1_fixed = getattr(lib, f"{prefix}_g1_fixed_batch")
        self._g2_fixed = getattr(lib, f"{prefix}_g2_fixed_batch")
        self._wh = getattr(lib, f"{prefix}_fr_witness_h")
        self._r1cs = getattr(lib, f"{prefix}_r1cs_eval")
        self._tomont = getattr(lib, f"{prefix}_fr_to_mont")
        for fn in (self._g1_msm, self._g2_msm, self._g1_fixed,
                   self._g2_fixed):
            fn.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
        self._wh.argtypes = [u64p, u64p, u64p, ctypes.c_uint64,
                             u64p, u64p, u64p, u64p]
        self._r1cs.argtypes = [u64p, u64p, u64p, ctypes.c_uint64, u64p,
                               ctypes.c_uint64, u64p]
        self._tomont.argtypes = [u64p, ctypes.c_uint64, u64p]

    def _limbs(self, vals, width):
        nb = self._n * 8
        blob = b"".join(int(x).to_bytes(nb, "little")
                        for v in vals for x in v)
        return np.frombuffer(blob, dtype="<u8").reshape(
            len(vals), width * self._n).copy()

    @staticmethod
    def _scalars(ss):
        if isinstance(ss, np.ndarray) and ss.dtype == np.uint64 \
                and ss.ndim == 2 and ss.shape[1] == 4:
            return np.ascontiguousarray(ss)  # pre-marshalled
        blob = b"".join(int(s).to_bytes(32, "little") for s in ss)
        return np.frombuffer(blob, dtype="<u8").reshape(len(ss), 4).copy()

    def _unlimb(self, row, width):
        n = self._n
        coords = [sum(int(row[j * n + k]) << (64 * k) for k in range(n))
                  for j in range(width)]
        if all(c == 0 for c in coords):
            return None
        return coords

    def prep_g1(self, points) -> np.ndarray:
        """Pre-marshalled limb array for repeated g1_msm over the same
        points (proving keys)."""
        return self._limbs([(p[0], p[1]) if p else (0, 0) for p in points], 2)

    def prep_g2(self, points) -> np.ndarray:
        return self._limbs(
            [(p[0][0], p[0][1], p[1][0], p[1][1]) if p else (0, 0, 0, 0)
             for p in points], 4)

    def g1_msm(self, points, scalars, pts: np.ndarray | None = None):
        """points: affine (x, y) pairs / None entries, or a RawAffine."""
        if isinstance(points, RawAffine):
            pts = np.ascontiguousarray(points.limbs)
        elif pts is None:
            pts = self.prep_g1(points)
        sc = self._scalars(scalars)
        out = np.zeros(2 * self._n, dtype=np.uint64)
        self._g1_msm(_ptr(pts), _ptr(sc), len(points), _ptr(out))
        r = self._unlimb(out, 2)
        return tuple(r) if r else None

    def g2_msm(self, points, scalars, pts: np.ndarray | None = None):
        if isinstance(points, RawAffine):
            pts = np.ascontiguousarray(points.limbs)
        elif pts is None:
            pts = self.prep_g2(points)
        sc = self._scalars(scalars)
        out = np.zeros(4 * self._n, dtype=np.uint64)
        self._g2_msm(_ptr(pts), _ptr(sc), len(points), _ptr(out))
        r = self._unlimb(out, 4)
        return ((r[0], r[1]), (r[2], r[3])) if r else None

    def g1_fixed_batch(self, base, scalars, raw: bool = False):
        b = self._limbs([(base[0], base[1])], 2)[0].copy()
        sc = self._scalars(scalars)
        out = np.zeros((len(scalars), 2 * self._n), dtype=np.uint64)
        self._g1_fixed(_ptr(b), _ptr(sc), len(scalars), _ptr(out))
        if raw:
            return RawAffine(out, self._n, 2)
        res = []
        for i in range(len(scalars)):
            r = self._unlimb(out[i], 2)
            res.append(tuple(r) if r else None)
        return res

    def fr_to_mont(self, vals: np.ndarray) -> np.ndarray:
        """[n, 4] value-space limbs -> Montgomery-form limbs."""
        vals = np.ascontiguousarray(vals, dtype=np.uint64)
        out = np.empty_like(vals)
        self._tomont(_ptr(vals), vals.shape[0], _ptr(out))
        return out

    def r1cs_eval(self, indptr: np.ndarray, wires: np.ndarray,
                  coefs_mont: np.ndarray, witness: np.ndarray) -> np.ndarray:
        """Sparse rows (CSR) dot witness over F_r -> [nc, 4] value limbs."""
        nc = indptr.shape[0] - 1
        out = np.empty((nc, 4), dtype=np.uint64)
        self._r1cs(_ptr(indptr), _ptr(wires), _ptr(coefs_mont), nc,
                   _ptr(witness), witness.shape[0], _ptr(out))
        return out

    def fr_witness_h(self, az, bz, cz, w, shift, zinv, raw: bool = False):
        n = len(az)
        a = self._scalars(az)
        b = self._scalars(bz)
        c = self._scalars(cz)
        wv = self._scalars([w])[0].copy()
        sv = self._scalars([shift])[0].copy()
        zv = self._scalars([zinv])[0].copy()
        out = np.zeros((n, 4), dtype=np.uint64)
        self._wh(_ptr(a), _ptr(b), _ptr(c), n, _ptr(wv), _ptr(sv), _ptr(zv),
                 _ptr(out))
        if raw:
            return out  # [n, 4] value limbs (callers slice/check directly)
        return [int(out[i, 0]) | int(out[i, 1]) << 64 | int(out[i, 2]) << 128
                | int(out[i, 3]) << 192 for i in range(n)]

    def g2_fixed_batch(self, base, scalars, raw: bool = False):
        b = self._limbs([(base[0][0], base[0][1], base[1][0], base[1][1])],
                        4)[0].copy()
        sc = self._scalars(scalars)
        out = np.zeros((len(scalars), 4 * self._n), dtype=np.uint64)
        self._g2_fixed(_ptr(b), _ptr(sc), len(scalars), _ptr(out))
        if raw:
            return RawAffine(out, self._n, 4)
        res = []
        for i in range(len(scalars)):
            r = self._unlimb(out[i], 4)
            res.append(((r[0], r[1]), (r[2], r[3])) if r else None)
        return res


ec_bn254: _EcCurve | None = None
ec_bls12381: _EcCurve | None = None

_VMHOST_SRC = os.path.join(_DIR, "vm_host.cpp")
_VMHOST_SO = os.path.join(_DIR, "libvm_host.so")

vm_host = None  # ctypes lib for the host segment executor

_POSFR_SRC = os.path.join(_DIR, "poseidon_fr.cpp")
_POSFR_SO = os.path.join(_DIR, "libposeidon_fr.so")

poseidon_fr = None  # ctypes lib for big-field (BN254/BLS Fr) Poseidon


def _bind_posfr(lib):
    vp = ctypes.c_void_p
    ci = ctypes.c_int
    lib.posfr_set_field.argtypes = [ci, vp]
    lib.posfr_set_table.argtypes = [ci, ci, vp, ci, vp, vp, vp, ci, ci]
    lib.posfr_hash_batch.argtypes = [ci, ci, vp, vp, vp, ctypes.c_size_t, ci]
    return lib


def _build_ec() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-march=native",
             "-o", _EC_SO, _EC_SRC],
            check=True, capture_output=True, timeout=300)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _build_so(src: str, so: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-funroll-loops", "-shared", "-fPIC", "-fopenmp",
             "-march=native", "-o", so, src],
            check=True, capture_output=True, timeout=300)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _init():
    global poseidon, gl_vec
    if os.environ.get("EIGEN_ZKVM_NO_NATIVE"):
        return
    lib = _load()
    if lib is None:
        return
    from ..hash import poseidon_gl as pnp

    poseidon = _PoseidonGL(lib, pnp.C, pnp.M, pnp.PMAT, pnp.S)

    if (not os.path.exists(_GLVEC_SO)
            or os.path.getmtime(_GLVEC_SO) < os.path.getmtime(_GLVEC_SRC)):
        if not _build_so(_GLVEC_SRC, _GLVEC_SO):
            gl_vec = None
    if gl_vec is None:
        try:
            gl_vec = _GlVec(ctypes.CDLL(_GLVEC_SO))
        except (OSError, AttributeError):
            gl_vec = None

    global vm_host
    if (not os.path.exists(_VMHOST_SO)
            or os.path.getmtime(_VMHOST_SO) < os.path.getmtime(_VMHOST_SRC)):
        if not _build_so(_VMHOST_SRC, _VMHOST_SO):
            return
    try:
        from ..stark import vm_native

        vm_host = vm_native.bind(ctypes.CDLL(_VMHOST_SO))
    except (OSError, AttributeError, ImportError):
        vm_host = None

    global poseidon_fr
    if (not os.path.exists(_POSFR_SO)
            or os.path.getmtime(_POSFR_SO) < os.path.getmtime(_POSFR_SRC)):
        if not _build_so(_POSFR_SRC, _POSFR_SO):
            return
    try:
        poseidon_fr = _bind_posfr(ctypes.CDLL(_POSFR_SO))
    except (OSError, AttributeError):
        poseidon_fr = None

    global ec_bn254, ec_bls12381
    if (not os.path.exists(_EC_SO)
            or os.path.getmtime(_EC_SO) < os.path.getmtime(_EC_SRC)):
        if not _build_ec():
            return
    try:
        eclib = ctypes.CDLL(_EC_SO)
        ec_bn254 = _EcCurve(eclib, "bn254", 4)
        ec_bls12381 = _EcCurve(eclib, "bls12381", 6)
    except (OSError, AttributeError):
        pass


_init()
