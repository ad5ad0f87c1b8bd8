"""Batched NTT / iNTT / coset-LDE over Goldilocks (numpy reference engine).

All transforms operate column-batched on arrays of shape [N, n_pols]: one
radix-2 pass is a single vectorized butterfly over every polynomial at once.
Outputs equal the reference's mathematical DFT (starky/src/fft.rs /
fft_p.rs): X[k] = sum_j x[j] w^(jk) with w the canonical 2^nbits root
(7^((p-1)/2^32) squared down).  The reference's blocked/transposed loop
structure is a CPU-cache artifact we deliberately do not copy — on TPU the
same math becomes batched matrix/vector work (see ops/ntt_jax.py).

`interpolate` = LDE: iNTT on the n-domain, multiply coeff j by SHIFT^j, zero
pad to the extended size, NTT — evaluations on the shifted coset of the
2^nbits_ext domain (reference: fft_p.rs interpolate()).
"""
from __future__ import annotations

import numpy as np

from ..fields import gl64 as gl

_root_pows_cache: dict = {}


def root_powers(nbits: int) -> np.ndarray:
    """[w^0, w^1, ..., w^(2^nbits - 1)] for the canonical 2^nbits root."""
    key = ("w", nbits)
    if key not in _root_pows_cache:
        n = 1 << nbits
        w = np.uint64(gl.root_of_unity(nbits))
        # log-doubling: pows_{2m} = [pows_m, pows_m * w^m]
        pows = np.ones(1, dtype=np.uint64)
        cur = w
        while pows.shape[0] < n:
            pows = np.concatenate([pows, gl.mul(pows, cur)])
            cur = gl.mul(cur, cur)
        _root_pows_cache[key] = pows
    return _root_pows_cache[key]


def _bit_reverse_indices(nbits: int) -> np.ndarray:
    key = ("rev", nbits)
    if key not in _root_pows_cache:
        n = 1 << nbits
        idx = np.arange(n)
        rev = np.zeros(n, dtype=np.int64)
        for b in range(nbits):
            rev |= ((idx >> b) & 1) << (nbits - 1 - b)
        _root_pows_cache[key] = rev
    return _root_pows_cache[key]


def ntt(values: np.ndarray, nbits: int | None = None) -> np.ndarray:
    """Forward NTT along axis 0 of [N, ...] (natural order in and out)."""
    n = values.shape[0]
    if nbits is None:
        nbits = n.bit_length() - 1
    assert 1 << nbits == n
    if n == 1:
        return values.copy()
    from .. import native

    if native.gl_vec is not None and values.dtype == np.uint64:
        k = int(np.prod(values.shape[1:], dtype=np.int64)) if values.ndim > 1 else 1
        buf = np.ascontiguousarray(values).copy()
        rev = np.ascontiguousarray(_bit_reverse_indices(nbits).astype(np.uint64))
        native.gl_vec.ntt_inplace(buf.reshape(n, k), n, k,
                                  root_powers(nbits), rev)
        return buf
    buf = values[_bit_reverse_indices(nbits)]
    pows = root_powers(nbits)
    for s in range(1, nbits + 1):
        m = 1 << s
        half = m >> 1
        # twiddles for this stage: w_m^j = w^(j * n/m)
        tw = pows[(np.arange(half) * (n // m))]
        tw = tw.reshape((1, half) + (1,) * (values.ndim - 1))
        b = buf.reshape((n // m, m) + values.shape[1:])
        lo = b[:, :half]
        hi = b[:, half:]
        t = gl.mul(hi, tw)
        b_new = np.concatenate([gl.add(lo, t), gl.sub(lo, t)], axis=1)
        buf = b_new.reshape((n,) + values.shape[1:])
    return buf


def intt(values: np.ndarray, nbits: int | None = None) -> np.ndarray:
    """Inverse NTT along axis 0 (with 1/n scaling)."""
    n = values.shape[0]
    if nbits is None:
        nbits = n.bit_length() - 1
    q = ntt(values, nbits)
    n_inv = gl.inv(np.uint64(n))
    res = np.empty_like(q)
    res[0] = gl.mul(q[0], n_inv)
    res[1:] = gl.mul(q[1:][::-1], n_inv)
    return res


def intt_no_scale_reversed(values: np.ndarray, nbits: int | None = None) -> np.ndarray:
    """iNTT without the 1/n factor (used by interpolate, folded into shift)."""
    q = ntt(values, nbits)
    res = np.empty_like(q)
    res[0] = q[0]
    res[1:] = q[1:][::-1]
    return res


def shift_powers(nbits: int, shift: int | None = None) -> np.ndarray:
    key = ("s", nbits, shift)
    if key not in _root_pows_cache:
        n = 1 << nbits
        s = np.uint64(shift if shift is not None else gl.SHIFT)
        # log-doubling: pows_{2m} = [pows_m, pows_m * s^m]
        pows = np.ones(1, dtype=np.uint64)
        cur = s
        while pows.shape[0] < n:
            pows = np.concatenate([pows, gl.mul(pows, cur)])
            cur = gl.mul(cur, cur)
        _root_pows_cache[key] = pows
    return _root_pows_cache[key]


def interpolate(values: np.ndarray, nbits: int, nbits_ext: int) -> np.ndarray:
    """LDE [N, P] -> [N_ext, P]: evaluations on the SHIFT-coset ext domain."""
    n = 1 << nbits
    n_ext = 1 << nbits_ext
    assert values.shape[0] == n
    coeffs = intt_no_scale_reversed(values, nbits)
    n_inv = gl.inv(np.uint64(n))
    scale = gl.mul(shift_powers(nbits), n_inv)  # n_inv * SHIFT^j
    if values.ndim > 1:
        scale = scale.reshape((n,) + (1,) * (values.ndim - 1))
    coeffs = gl.mul(coeffs, scale)
    padded = np.zeros((n_ext,) + values.shape[1:], dtype=np.uint64)
    padded[:n] = coeffs
    return ntt(padded, nbits_ext)


# ---- extension-field (GF(p^3)) wrappers: component-wise linearity ----

def ntt_ext(values: np.ndarray, nbits: int | None = None) -> np.ndarray:
    return ntt(values, nbits)


def intt_ext(values: np.ndarray, nbits: int | None = None) -> np.ndarray:
    return intt(values, nbits)
