"""Pallas Stockham NTT: bit-exact vs the numpy engine (poly/ntt.py) for
the in-kernel path, the four-step recursion, and the interpolate/intt
wrappers.  Runs the kernel under the Pallas interpreter off-TPU.
(reference hot loop being replaced: starky/src/fft_p.rs:242-355)"""
import numpy as np
import pytest

import jax.numpy as jnp

from eigen_zkvm_tpu.poly import ntt as ntt_np
from eigen_zkvm_tpu.ops import ntt_pallas as nt

P = 0xFFFFFFFF00000001
rng = np.random.default_rng(42)


def _pair(x):
    return (jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((x >> np.uint64(32)).astype(np.uint32)))


def _join(p):
    return (np.asarray(p[0]).astype(np.uint64)
            | (np.asarray(p[1]).astype(np.uint64) << np.uint64(32)))


@pytest.mark.parametrize("nbits,pcols", [(3, 2), (5, 3), (8, 1), (9, 8)])
def test_kernel_ntt_bit_exact(nbits, pcols):
    x = rng.integers(0, 2**63, size=(1 << nbits, pcols),
                     dtype=np.uint64) % np.uint64(P)
    want = ntt_np.ntt(x, nbits)
    got = _join(nt.ntt(_pair(x), nbits, interpret=True))
    assert np.array_equal(want, got)


def test_four_step_recursion_bit_exact(monkeypatch):
    """Force the four-step split (and one nested recursion) at small N."""
    monkeypatch.setattr(nt, "KMAX", 4)
    for nbits in (7, 9, 11):
        x = rng.integers(0, 2**63, size=(1 << nbits, 2),
                         dtype=np.uint64) % np.uint64(P)
        want = ntt_np.ntt(x, nbits)
        got = _join(nt.ntt(_pair(x), nbits, interpret=True))
        assert np.array_equal(want, got), nbits


def test_intt_and_interpolate_bit_exact():
    nbits = 6
    x = rng.integers(0, 2**63, size=(1 << nbits, 3),
                     dtype=np.uint64) % np.uint64(P)
    got = _join(nt.intt(_pair(x), nbits, interpret=True))
    assert np.array_equal(ntt_np.intt(x, nbits), got)
    lde = _join(nt.interpolate(_pair(x), nbits, nbits + 2, interpret=True))
    assert np.array_equal(ntt_np.interpolate(x, nbits, nbits + 2), lde)
