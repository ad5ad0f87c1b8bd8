import numpy as np

from eigen_zkvm_tpu.fields import gl64 as gl
from eigen_zkvm_tpu.poly import ntt


def _naive_dft(x, nbits):
    n = 1 << nbits
    w = np.uint64(gl.root_of_unity(nbits))
    out = np.zeros_like(x)
    for k in range(n):
        acc = np.zeros(x.shape[1:], dtype=np.uint64)
        for j in range(n):
            acc = gl.add(acc, gl.mul(x[j], gl.exp(w, (j * k) % n)))
        out[k] = acc
    return out


def test_ntt_matches_naive_dft():
    rng = np.random.default_rng(1)
    for nbits in (0, 1, 2, 4, 6):
        n = 1 << nbits
        x = rng.integers(0, gl.P_INT, (n, 3), dtype=np.uint64)
        assert np.array_equal(ntt.ntt(x), _naive_dft(x, nbits))


def test_intt_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.integers(0, gl.P_INT, (256, 4), dtype=np.uint64)
    assert np.array_equal(ntt.intt(ntt.ntt(x)), x)


def test_interpolate_is_coset_eval():
    rng = np.random.default_rng(3)
    nbits, nbits_ext = 4, 6
    n, n_ext = 1 << nbits, 1 << nbits_ext
    x = rng.integers(0, gl.P_INT, (n, 2), dtype=np.uint64)
    lde = ntt.interpolate(x, nbits, nbits_ext)
    coeffs = ntt.intt(x)
    w_ext = np.uint64(gl.root_of_unity(nbits_ext))
    for i in range(0, n_ext, 7):
        pt = gl.mul(np.uint64(gl.SHIFT), gl.exp(w_ext, i))
        acc = np.zeros(2, dtype=np.uint64)
        xp = np.uint64(1)
        for j in range(n):
            acc = gl.add(acc, gl.mul(coeffs[j], xp))
            xp = gl.mul(xp, pt)
        assert np.array_equal(acc, lde[i])


def test_interpolate_stride_consistency():
    """LDE sampled at stride 2^extend_bits recovers... NOT the original values
    (coset shift), but iNTT/NTT roundtrip through interpolate is linear; check
    linearity instead."""
    rng = np.random.default_rng(4)
    nbits, nbits_ext = 5, 7
    a = rng.integers(0, gl.P_INT, (1 << nbits, 1), dtype=np.uint64)
    b = rng.integers(0, gl.P_INT, (1 << nbits, 1), dtype=np.uint64)
    s = gl.add(a, b)
    assert np.array_equal(
        ntt.interpolate(s, nbits, nbits_ext),
        gl.add(ntt.interpolate(a, nbits, nbits_ext), ntt.interpolate(b, nbits, nbits_ext)),
    )
