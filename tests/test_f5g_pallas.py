"""GF(p^5) extension field + Pallas Poseidon kernel."""
import numpy as np
import pytest

from eigen_zkvm_tpu.fields import f5g


def test_f5g_mul_golden():
    """Golden vector from the reference unit test (starky/src/f5g.rs
    test_f5g_mul)."""
    a = np.array([9788683869780751860, 18176307314149915536,
                  17581807048943060475, 16706651231658143014,
                  424516324638612383], dtype=np.uint64)
    b = np.array([1541862605911742196, 5168181287870979863,
                  10854086836664484156, 11043707160649157424,
                  943499178011708365], dtype=np.uint64)
    atb = np.array([5924286846078684570, 12564682493825924142,
                    17116577152380521223, 5260948460973948760,
                    15673927150284637712], dtype=np.uint64)
    assert np.array_equal(f5g.mul(a, b), atb)


def test_f5g_add_sub_inv():
    f1 = np.array([1, 2, 3, 0, 2], dtype=np.uint64)
    f2 = np.array([4, 5, 0xFFFFFFFF00000000, 0, 2], dtype=np.uint64)
    f3 = np.array([5, 7, 2, 0, 4], dtype=np.uint64)
    assert np.array_equal(f5g.add(f1, f2), f3)
    assert np.array_equal(f5g.sub(f3, f2), f1)
    a = np.array([9788683869780751860, 18176307314149915536,
                  17581807048943060475, 16706651231658143014,
                  424516324638612383], dtype=np.uint64)
    assert np.array_equal(f5g.mul(a, f5g.inv(a)), f5g.ONE)
    assert np.array_equal(f5g.exp(a, 5),
                          f5g.mul(f5g.mul(f5g.square(a), f5g.square(a)), a))


def _tpu_device():
    import jax
    for d in jax.devices():
        if d.platform in ("tpu", "axon") or "TPU" in str(d):
            return d
    return None


@pytest.mark.slow
def test_pallas_poseidon_bit_exact_on_tpu():
    """The Pallas kernel digests match the scalar engine (needs a TPU;
    interpret mode is impractically slow for the 30-round kernel)."""
    import jax

    dev = _tpu_device()
    if dev is None:
        pytest.skip("no TPU device")
    from eigen_zkvm_tpu.hash import poseidon_gl
    from eigen_zkvm_tpu.ops import poseidon_pallas as pp

    rng = np.random.default_rng(3)
    B = 1024
    vals = rng.integers(0, poseidon_gl._P, size=(B, 12), dtype=np.uint64)
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    with jax.default_device(dev):
        olo, ohi = pp.permute((lo, hi))
        got = np.asarray(olo).astype(np.uint64) | \
            (np.asarray(ohi).astype(np.uint64) << np.uint64(32))
    exp = poseidon_gl.permute(vals[:, :8], vals[:, 8:])
    assert np.array_equal(got, exp)
