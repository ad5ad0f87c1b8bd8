"""Poseidon permutation over Goldilocks, t=12 (rate 8, capacity 4), x^7 sbox.

Batched numpy implementation: hashes B independent inputs at once with
state arrays of shape [B, 12].  Uses the optimized ("opt") constant schedule:
8 full rounds + 22 partial rounds with sparse per-round matrices S and a
pre-round constant fold (semantics match reference: starky/src/poseidon_opt.rs;
golden vectors from its unit tests are in tests/test_poseidon.py).
"""
from __future__ import annotations

import os

import numpy as np

from ..fields import gl64 as gl

T = 12
N_ROUNDS_F = 8
N_ROUNDS_P = 22

_DATA = os.path.join(os.path.dirname(__file__), "..", "data", "poseidon_gl_opt.npz")
_consts = np.load(_DATA)
C = _consts["C"].astype(np.uint64)
M = _consts["M"].astype(np.uint64)  # [12][12]
PMAT = _consts["P"].astype(np.uint64)
S = _consts["S"].astype(np.uint64)


def _mat_mul(state: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """out[:, i] = sum_j mat[j, i] * state[:, j] (column-indexed like reference).

    One [B,12,12] batched field-mul + a log-depth modular reduction instead of
    144 per-lane calls — numpy dispatch overhead otherwise dominates the hash.
    """
    prod = gl.mul(state[:, :, None], mat[None, :, :])  # [B, 12(j), 12(i)]
    return gl.sum_mod(prod, axis=1)


# Python-int constant tables for the scalar fast path (batch==1 callers like
# the transcript and per-query proof verification; numpy batch-1 dispatch
# overhead would dominate there).
_P = int(gl.P_INT)
_C_I = [int(x) for x in C]
_M_I = [[int(x) for x in row] for row in M]
_P_I = [[int(x) for x in row] for row in PMAT]
_S_I = [int(x) for x in S]


def _pow7i(x: int) -> int:
    x2 = x * x % _P
    x3 = x2 * x % _P
    return x3 * x3 % _P * x % _P


def _permute_scalar(state: list) -> list:
    t, half_f = T, N_ROUNDS_F // 2
    state = [(state[i] + _C_I[i]) % _P for i in range(t)]
    for r in range(half_f - 1):
        state = [_pow7i(x) for x in state]
        state = [(state[i] + _C_I[(r + 1) * t + i]) % _P for i in range(t)]
        state = [sum(_M_I[j][i] * state[j] for j in range(t)) % _P for i in range(t)]
    state = [_pow7i(x) for x in state]
    state = [(state[i] + _C_I[half_f * t + i]) % _P for i in range(t)]
    state = [sum(_P_I[j][i] * state[j] for j in range(t)) % _P for i in range(t)]
    for r in range(N_ROUNDS_P):
        s0 = (_pow7i(state[0]) + _C_I[(half_f + 1) * t + r]) % _P
        state[0] = s0
        base = (2 * t - 1) * r
        new0 = sum(_S_I[base + j] * state[j] for j in range(t)) % _P
        for k in range(1, t):
            state[k] = (state[k] + _S_I[base + t + k - 1] * s0) % _P
        state[0] = new0
    base = (half_f + 1) * t + N_ROUNDS_P
    for r in range(half_f - 1):
        state = [_pow7i(x) for x in state]
        state = [(state[i] + _C_I[base + r * t + i]) % _P for i in range(t)]
        state = [sum(_M_I[j][i] * state[j] for j in range(t)) % _P for i in range(t)]
    state = [_pow7i(x) for x in state]
    state = [sum(_M_I[j][i] * state[j] for j in range(t)) % _P for i in range(t)]
    return state


_native = None
_native_checked = False


def _get_native():
    """The C++/OpenMP kernel (native/poseidon_gl.cpp), if it built."""
    global _native, _native_checked
    if not _native_checked:
        from .. import native as _n

        _native = _n.poseidon
        _native_checked = True
    return _native


def permute(inp: np.ndarray, init_state: np.ndarray) -> np.ndarray:
    """Batched Poseidon: inp [B, 8], init_state [B, 4] -> full state [B, 12]."""
    nat = _get_native()
    if nat is not None:
        return nat.permute(np.ascontiguousarray(inp, dtype=np.uint64),
                           np.ascontiguousarray(init_state, dtype=np.uint64))
    B = inp.shape[0]
    if B <= 4:  # scalar fast path: numpy dispatch dominates tiny batches
        out = np.zeros((B, T), dtype=np.uint64)
        for b in range(B):
            st = [int(x) for x in inp[b]] + [int(x) for x in init_state[b]]
            out[b] = _permute_scalar(st)
        return out
    state = np.zeros((B, T), dtype=np.uint64)
    state[:, 0:8] = inp
    state[:, 8:12] = init_state

    state = gl.add(state, C[0:T][None, :])

    half_f = N_ROUNDS_F // 2
    for r in range(half_f - 1):
        state = gl.pow7(state)
        state = gl.add(state, C[(r + 1) * T : (r + 2) * T][None, :])
        state = _mat_mul(state, M)

    state = gl.pow7(state)
    state = gl.add(state, C[half_f * T : (half_f + 1) * T][None, :])
    state = _mat_mul(state, PMAT)

    for r in range(N_ROUNDS_P):
        state[:, 0] = gl.pow7(state[:, 0])
        state[:, 0] = gl.add(state[:, 0], C[(half_f + 1) * T + r])
        srow = S[(2 * T - 1) * r : (2 * T - 1) * r + T]
        s0 = gl.sum_mod(gl.mul(state, srow[None, :]), axis=1)
        scol = S[(2 * T - 1) * r + T : (2 * T - 1) * (r + 1)]
        state[:, 1:] = gl.add(state[:, 1:],
                              gl.mul(state[:, 0:1], scol[None, :]))
        state[:, 0] = s0

    base = (half_f + 1) * T + N_ROUNDS_P
    for r in range(half_f - 1):
        state = gl.pow7(state)
        state = gl.add(state, C[base + r * T : base + (r + 1) * T][None, :])
        state = _mat_mul(state, M)

    state = gl.pow7(state)
    state = _mat_mul(state, M)
    return state


def hash_n(inp: np.ndarray, init_state: np.ndarray, out: int = 4) -> np.ndarray:
    """Batched sponge call: [B, 8] x [B, 4] -> [B, out]."""
    return permute(inp, init_state)[:, :out]


def hash_one(inp8, state4, out: int = 4) -> np.ndarray:
    inp = np.asarray(inp8, dtype=np.uint64)[None, :]
    st = np.asarray(state4, dtype=np.uint64)[None, :]
    return hash_n(inp, st, out)[0]
