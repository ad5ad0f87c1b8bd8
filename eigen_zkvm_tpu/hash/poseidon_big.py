"""Poseidon over a big (snark-curve scalar) field, circomlib "opt" schedule.

Variable state width t = len(inp)+1 (2..17), x^5 sbox, 8 full rounds and a
per-t partial-round count.  Field elements are Python ints in value space —
the reference's Montgomery representation is an implementation detail that
cancels out of every hash (semantics: starky/src/poseidon_bn128_opt.rs /
poseidon_bls12381_opt.rs; constants from their generated tables; golden
vectors replicated in tests/test_bn128.py and tests/test_bls12381.py).

Instantiated by hash/poseidon_bn128.py and hash/poseidon_bls12381.py.
"""
from __future__ import annotations

import os

import numpy as np

_DIR = os.path.dirname(__file__)


def _ints(limb_arr: np.ndarray):
    """[..., 4] u64 little-endian limbs -> nested lists of Python ints."""
    flat = limb_arr.reshape(-1, 4)
    vals = [int(r[0]) | int(r[1]) << 64 | int(r[2]) << 128 | int(r[3]) << 192
            for r in flat]
    shape = limb_arr.shape[:-1]
    if len(shape) == 1:
        return vals
    t = shape[1]
    return [vals[i * t:(i + 1) * t] for i in range(shape[0])]


class _Tables:
    def __init__(self, npz_name: str):
        data = np.load(os.path.join(_DIR, "..", "data", npz_name))
        self.C = {}
        self.M = {}
        self.Pm = {}
        self.S = {}
        for t in range(2, 18):
            self.C[t] = _ints(data[f"C_{t}"])
            self.M[t] = _ints(data[f"M_{t}"])
            self.Pm[t] = _ints(data[f"P_{t}"])
            self.S[t] = _ints(data[f"S_{t}"])


def int_to_limbs(vals) -> np.ndarray:
    """List of ints -> [n, 4] u64 LE limb array."""
    M = (1 << 64) - 1
    return np.array([[(int(v) >> (64 * k)) & M for k in range(4)]
                     for v in vals], dtype=np.uint64)


def limbs_to_ints(arr: np.ndarray) -> list[int]:
    flat = arr.reshape(-1, 4)
    return [int(r[0]) | int(r[1]) << 64 | int(r[2]) << 128
            | int(r[3]) << 192 for r in flat]


_NATIVE_INST = {"poseidon_bn128_opt.npz": 0, "poseidon_bls12381_opt.npz": 1}


class PoseidonBig:
    N_ROUNDS_F = 8

    def __init__(self, p: int, npz_name: str, n_rounds_p: list[int]):
        self.P = p
        self._npz_name = npz_name
        self.N_ROUNDS_P = n_rounds_p
        self._tables = None
        self._nat = "unchecked"

    def tables(self) -> _Tables:
        if self._tables is None:
            self._tables = _Tables(self._npz_name)
        return self._tables

    def native(self):
        """(lib, instance_id) of the C kernel (native/poseidon_fr.cpp), or
        None.  Field + all 16 t-tables are registered on first use."""
        if self._nat != "unchecked":
            return self._nat
        from .. import native

        lib = native.poseidon_fr
        if lib is None or os.environ.get("EIGEN_ZKVM_NO_NATIVE"):
            self._nat = None
            return None
        inst = _NATIVE_INST[self._npz_name]
        from .. import native as n_mod

        p_l = np.ascontiguousarray(int_to_limbs([self.P]))
        lib.posfr_set_field(inst, n_mod._ptr(p_l))
        data = np.load(os.path.join(_DIR, "..", "data", self._npz_name))
        for t in range(2, 18):
            C = np.ascontiguousarray(data[f"C_{t}"], dtype=np.uint64)
            M = np.ascontiguousarray(data[f"M_{t}"], dtype=np.uint64)
            Pm = np.ascontiguousarray(data[f"P_{t}"], dtype=np.uint64)
            S = np.ascontiguousarray(data[f"S_{t}"], dtype=np.uint64)
            lib.posfr_set_table(
                inst, t, n_mod._ptr(C), C.size // 4, n_mod._ptr(M),
                n_mod._ptr(Pm), n_mod._ptr(S), S.size // 4,
                self.N_ROUNDS_P[t - 2])
        self._nat = (lib, inst)
        return self._nat

    def hash_batch_limbs(self, t: int, inp: np.ndarray, init: np.ndarray,
                         n_out: int = 1) -> np.ndarray | None:
        """Batch sponge on 4x64 limb arrays: inp [B, t-1, 4], init [B, 4]
        -> [B, n_out, 4]; None when the native kernel is unavailable."""
        nat = self.native()
        if nat is None:
            return None
        lib, inst = nat
        from .. import native as n_mod

        inp = np.ascontiguousarray(inp, dtype=np.uint64)
        init = np.ascontiguousarray(init, dtype=np.uint64)
        B = inp.shape[0]
        assert inp.shape == (B, t - 1, 4) and init.shape == (B, 4)
        out = np.empty((B, n_out, 4), dtype=np.uint64)
        lib.posfr_hash_batch(inst, t, n_mod._ptr(inp), n_mod._ptr(init),
                             n_mod._ptr(out), B, n_out)
        return out

    def _pow5(self, x: int) -> int:
        P = self.P
        x2 = x * x % P
        return x2 * x2 % P * x % P

    def hash_ex(self, inp: list[int], init_state: int, out: int) -> list[int]:
        """Poseidon sponge call: 1..16 inputs + capacity init -> outputs."""
        if not 1 <= len(inp) <= 16:
            raise ValueError(f"Wrong inputs length {len(inp)}")
        if self.native() is not None:
            t = len(inp) + 1
            res = self.hash_batch_limbs(
                t, int_to_limbs(inp)[None, :, :],
                int_to_limbs([init_state]), n_out=out)
            return limbs_to_ints(res[0])
        P = self.P
        _pow5 = self._pow5
        t = len(inp) + 1
        tb = self.tables()
        C, M, Pm, S = tb.C[t], tb.M[t], tb.Pm[t], tb.S[t]
        n_p = self.N_ROUNDS_P[t - 2]
        half = self.N_ROUNDS_F // 2

        state = [(init_state + C[0]) % P] + [(x + C[i + 1]) % P for i, x in enumerate(inp)]

        for r in range(half - 1):
            state = [_pow5(x) for x in state]
            state = [(state[i] + C[(r + 1) * t + i]) % P for i in range(t)]
            state = [sum(M[j][i] * state[j] for j in range(t)) % P for i in range(t)]

        state = [_pow5(x) for x in state]
        state = [(state[i] + C[half * t + i]) % P for i in range(t)]
        state = [sum(Pm[j][i] * state[j] for j in range(t)) % P for i in range(t)]

        for r in range(n_p):
            s0 = (_pow5(state[0]) + C[(half + 1) * t + r]) % P
            state[0] = s0
            base = (2 * t - 1) * r
            new0 = sum(S[base + j] * state[j] for j in range(t)) % P
            for k in range(1, t):
                state[k] = (state[k] + S[base + t + k - 1] * s0) % P
            state[0] = new0

        cbase = (half + 1) * t + n_p
        for r in range(half - 1):
            state = [_pow5(x) for x in state]
            state = [(state[i] + C[cbase + r * t + i]) % P for i in range(t)]
            state = [sum(M[j][i] * state[j] for j in range(t)) % P for i in range(t)]

        state = [_pow5(x) for x in state]
        state = [sum(M[j][i] * state[j] for j in range(t)) % P for i in range(t)]
        return state[:out]

    def hash_fr(self, inp: list[int], init_state: int = 0) -> int:
        return self.hash_ex(inp, init_state, 1)[0]

