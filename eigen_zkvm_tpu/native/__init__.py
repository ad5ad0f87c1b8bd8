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
            ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-march=native",
             "-o", _SO, _SRC],
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
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.poseidon_gl_set_constants.argtypes = [u64p] * 4
    lib.poseidon_gl_permute_batch.argtypes = [u64p, ctypes.c_size_t]
    lib.poseidon_gl_hash_n.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
    lib.poseidon_gl_hash_leaves.argtypes = [u64p, ctypes.c_size_t,
                                            ctypes.c_size_t, u64p]
    lib.poseidon_gl_merkle_level.argtypes = [u64p, ctypes.c_size_t, u64p]
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


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
        self._lib.poseidon_gl_hash_leaves(_ptr(rows), B, w, out.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint64)))
        return out

    def merkle_level(self, nodes: np.ndarray) -> np.ndarray:
        """nodes [n, 4], n even -> [n/2, 4]."""
        nodes = np.ascontiguousarray(nodes, dtype=np.uint64)
        n_pairs = nodes.shape[0] // 2
        out = np.empty((n_pairs, 4), dtype=np.uint64)
        self._lib.poseidon_gl_merkle_level(_ptr(nodes), n_pairs, _ptr(out))
        return out


poseidon: _PoseidonGL | None = None


def _init():
    global poseidon
    if os.environ.get("EIGEN_ZKVM_NO_NATIVE"):
        return
    lib = _load()
    if lib is None:
        return
    from ..hash import poseidon_gl as pnp

    poseidon = _PoseidonGL(lib, pnp.C, pnp.M, pnp.PMAT, pnp.S)


_init()
