"""Native EC kernel differentials: the IFMA fixed-base batches and the
batch-affine tree MSM must match the pure-python curve ops, including the
degenerate inputs that broke earlier designs (hot buckets from repeated
0/1 scalars, duplicate points, zero scalars, infinity inputs)."""
import random

import pytest

from eigen_zkvm_tpu import native
from eigen_zkvm_tpu.curves import bls12_381 as bls
from eigen_zkvm_tpu.curves import bn254
from eigen_zkvm_tpu.curves.msm import msm_g1, msm_g2

pytestmark = pytest.mark.skipif(native.ec_bn254 is None,
                                reason="native EC kernels unavailable")


def _g1_points(curve, n):
    base = curve.g1_from_affine(curve.G1_GEN)
    acc = base
    pts = []
    for _ in range(n):
        pts.append(curve.g1_to_affine(acc))
        acc = curve.g1_add(acc, base)
    return pts


@pytest.mark.parametrize("curve,nat_name", [(bn254, "ec_bn254"),
                                            (bls, "ec_bls12381")])
def test_g1_fixed_batch_matches_python(curve, nat_name):
    nat = getattr(native, nat_name)
    rng = random.Random(17)
    scalars = [0, 1, 2, curve.R - 1, curve.R // 2] \
        + [rng.randrange(curve.R) for _ in range(80)]
    got = nat.g1_fixed_batch(curve.G1_GEN, scalars)
    for i in (0, 1, 2, 3, 4, 30, 84):
        s = scalars[i]
        exp = curve.g1_to_affine(
            curve.g1_mul(curve.g1_from_affine(curve.G1_GEN), s)) if s else None
        assert got[i] == exp, f"scalar index {i}"


@pytest.mark.parametrize("curve,nat_name", [(bn254, "ec_bn254"),
                                            (bls, "ec_bls12381")])
def test_g2_fixed_batch_matches_python(curve, nat_name):
    nat = getattr(native, nat_name)
    rng = random.Random(19)
    scalars = [0, 1, curve.R - 1] + [rng.randrange(curve.R) for _ in range(70)]
    got = nat.g2_fixed_batch(curve.G2_GEN, scalars)
    for i in (0, 1, 2, 40, 72):
        s = scalars[i]
        exp = curve.g2_to_affine(
            curve.g2_mul(curve.g2_from_affine(curve.G2_GEN), s)) if s else None
        assert got[i] == exp, f"scalar index {i}"


def test_g1_msm_differential_hot_buckets():
    nat = native.ec_bn254
    rng = random.Random(13)
    pts = _g1_points(bn254, 150)
    pts[7] = None            # infinity input
    pts[11] = pts[10]        # duplicate points
    pts[12] = pts[10]
    cases = []
    sc = [rng.randrange(bn254.R) for _ in range(150)]
    sc[3] = 0
    sc[4] = sc[5]
    cases.append(sc)
    cases.append([1] * 100 + sc[100:])          # hot bucket (repeated wires)
    cases.append([rng.randrange(4) for _ in range(150)])  # tiny scalars
    cases.append([bn254.R - 1] * 70 + [2] * 80)
    for i, scalars in enumerate(cases):
        got = nat.g1_msm(pts, scalars)
        exp = msm_g1(bn254, pts, scalars)
        assert got == exp, f"case {i}"


def test_g2_msm_differential():
    nat = native.ec_bn254
    rng = random.Random(23)
    base = bn254.g2_from_affine(bn254.G2_GEN)
    acc = base
    pts = []
    for _ in range(40):
        pts.append(bn254.g2_to_affine(acc))
        acc = bn254.g2_add(acc, base)
    scalars = [1] * 20 + [rng.randrange(bn254.R) for _ in range(20)]
    got = nat.g2_msm(pts, scalars)
    exp = msm_g2(bn254, pts, scalars)
    assert got == exp


def test_r1cs_eval_matches_python():
    import numpy as np

    from eigen_zkvm_tpu.groth16.groth16 import _int_limbs, _r1cs_csr

    nat = native.ec_bn254
    rng = random.Random(29)
    r = bn254.R
    constraints = []
    n_vars = 50
    for _ in range(30):
        row = [{rng.randrange(n_vars): rng.randrange(r) for _ in range(3)}
               for _ in range(3)]
        constraints.append(tuple(row))
    witness = [rng.randrange(r) for _ in range(n_vars)]
    mats = _r1cs_csr(nat, constraints, r)
    wit_l = _int_limbs(witness, r)
    for sel, (indptr, wires, coefs_m) in enumerate(mats):
        vals = nat.r1cs_eval(indptr, wires, coefs_m, wit_l)
        for j, row in enumerate(constraints):
            exp = sum(witness[s] * c for s, c in row[sel].items()) % r
            got = int(vals[j, 0]) | int(vals[j, 1]) << 64 \
                | int(vals[j, 2]) << 128 | int(vals[j, 3]) << 192
            assert got == exp, f"matrix {sel} row {j}"


def test_bls_g1_msm_ifma_threshold_differential():
    """n >= 1024 crosses into the AVX-512 IFMA batch-affine tree; the
    m52<->FF-mont domain correction is 2^(2*SHIFT_BITS), which is
    CURVE-DEPENDENT (BN254: 2^8, BLS12-381: 2^64) — a hardcoded 256
    silently corrupted every large BLS MSM (round-3 find: the gnark-
    bridge outer prove failed verification at 7.8M constraints)."""
    import random

    from eigen_zkvm_tpu import native
    from eigen_zkvm_tpu.curves import bls12_381 as bls
    from eigen_zkvm_tpu.curves.msm import msm_g1

    if native.ec_bls12381 is None:
        import pytest

        pytest.skip("native EC library unavailable")
    rng = random.Random(9)
    n = 1100  # > 1024: IFMA path; odd size exercises the tail lanes
    acc = bls.g1_from_affine(bls.G1_GEN)
    pts = []
    for _ in range(n):
        pts.append(bls.g1_to_affine(acc))
        acc = bls.g1_double(acc)
    for scalars in ([1] * n,                      # one long bucket run
                    [rng.randrange(bls.R) for _ in range(n)]):
        got = native.ec_bls12381.g1_msm(pts, scalars)
        assert got == msm_g1(bls, pts, scalars)
