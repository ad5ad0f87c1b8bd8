"""Batched BN254 G1 arithmetic + MSM in JAX — the TPU multiexp.

Points are Jacobian over ops/bigint_jax.py limb tensors: (X, Y, Z, inf)
with X/Y/Z [..., 16] u32 Montgomery limbs and inf a [...] bool.  Every add
or double is one fully-vectorized VPU program over the whole batch.

The MSM is a batched double-and-add: each point keeps a private
accumulator acc_i = scalar_i * P_i driven by a [254, n] bit plan
(one masked add + one double per bit, all n points at once), then a
log-depth tree of batched adds folds the n accumulators into one.
That is O(508) sequential steps of width-n vector math — the TPU-shaped
equivalent of bellperson's CUDA multiexp used by the reference's Groth16
layer (reference: groth16/src/groth16.rs prove-time multiexps); a
host-Pippenger does fewer point ops but serially, while here every step
is a full-width VPU wave.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import bigint_jax as bi  # noqa: F401  (package import enables the
# persistent compilation cache — see ops/__init__.py)


def load_points(points_affine):
    """Affine python points ((x, y) or None) -> batched Jacobian tensors."""
    xs, ys, infs = [], [], []
    for p in points_affine:
        if p is None:
            xs.append(0)
            ys.append(1)
            infs.append(True)
        else:
            xs.append(int(p[0]))
            ys.append(int(p[1]))
            infs.append(False)
    X = bi.to_mont(jnp.asarray(bi.pack(xs)))
    Y = bi.to_mont(jnp.asarray(bi.pack(ys)))
    inf = jnp.asarray(np.array(infs, dtype=bool))
    Z = jnp.where(inf[:, None], 0, jnp.broadcast_to(bi._ONE_MONT, X.shape))
    return (X, Y, Z, inf)


def store_point(pt):
    """One Jacobian point (batch of 1) -> affine (x, y) ints or None."""
    X, Y, Z, inf = pt
    x, y, z = (np.asarray(bi.from_mont(v))[0] for v in (X, Y, Z))
    inf = bool(np.asarray(inf).reshape(-1)[0])
    xi = sum(int(x[j]) << (16 * j) for j in range(bi.NLIMB))
    yi = sum(int(y[j]) << (16 * j) for j in range(bi.NLIMB))
    zi = sum(int(z[j]) << (16 * j) for j in range(bi.NLIMB))
    if inf or zi == 0:
        return None
    P = bi.P_INT
    zinv = pow(zi, P - 2, P)
    zi2 = zinv * zinv % P
    return (xi * zi2 % P, yi * zi2 % P * zinv % P)


def _dbl(p):
    """Batched Jacobian doubling (a = 0 curve), dbl-2009-l formulas."""
    X, Y, Z, inf = p
    mul, sq, add, sub = bi.mont_mul, bi.mont_sq, bi.add, bi.sub
    A = sq(X)
    B = sq(Y)
    C = sq(B)
    t = sub(sub(sq(add(X, B)), A), C)
    D = add(t, t)                      # D = 2*((X+B)^2 - A - C)
    E = add(add(A, A), A)              # E = 3*A
    F = sq(E)
    X3 = sub(F, add(D, D))
    c8 = add(C, C)
    c8 = add(c8, c8)
    c8 = add(c8, c8)                   # 8*C
    Y3 = sub(mul(E, sub(D, X3)), c8)
    Z3 = mul(add(Y, Y), Z)
    X3 = bi.select(inf, X, X3)
    Y3 = bi.select(inf, Y, Y3)
    Z3 = bi.select(inf, Z, Z3)
    return (X3, Y3, Z3, inf)


def _add(p, q):
    """Complete batched Jacobian add (handles inf / equal / negation),
    add-2007-bl formulas with jnp.where patching the exceptional cases."""
    X1, Y1, Z1, i1 = p
    X2, Y2, Z2, i2 = q
    mul, sq, add, sub = bi.mont_mul, bi.mont_sq, bi.add, bi.sub
    Z1Z1 = sq(Z1)
    Z2Z2 = sq(Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(mul(Y1, Z2), Z2Z2)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, U1)
    Rv = sub(S2, S1)
    h_zero = bi.is_zero(H)
    r_zero = bi.is_zero(Rv)
    H2 = add(H, H)
    I = sq(H2)
    J = mul(H, I)
    r2 = add(Rv, Rv)
    V = mul(U1, I)
    X3 = sub(sub(sq(r2), J), add(V, V))
    S1J = mul(S1, J)
    Y3 = sub(mul(r2, sub(V, X3)), add(S1J, S1J))
    Z3 = mul(sub(sub(sq(add(Z1, Z2)), Z1Z1), Z2Z2), H)

    # doubling case: U1 == U2 and S1 == S2 (both finite)
    d = _dbl(p)
    use_dbl = h_zero & r_zero & ~i1 & ~i2
    X3 = bi.select(use_dbl, d[0], X3)
    Y3 = bi.select(use_dbl, d[1], Y3)
    Z3 = bi.select(use_dbl, d[2], Z3)
    # p + (-p) = infinity
    inf3 = h_zero & ~r_zero & ~i1 & ~i2
    # identity cases
    X3 = bi.select(i1, X2, bi.select(i2, X1, X3))
    Y3 = bi.select(i1, Y2, bi.select(i2, Y1, Y3))
    Z3 = bi.select(i1, Z2, bi.select(i2, Z1, Z3))
    inf3 = jnp.where(i1, i2, jnp.where(i2, i1, inf3))
    return (X3, Y3, Z3, inf3)


def _tree_reduce(p):
    """Fold a batch of n points to one with a butterfly all-reduce: after
    log2(n) rounds of partner-exchange adds every lane holds the total.
    The rounds run in a fori_loop over a SINGLE _add instantiation (fixed
    shape), which keeps XLA compile time flat — the n*log(n) extra lane
    work is free next to the 254 bit-steps of the MSM itself."""
    n = p[0].shape[0]
    m = 1 << max(0, (n - 1)).bit_length()
    if m != n:
        padn = m - n
        zpad = jnp.zeros((padn, bi.NLIMB), jnp.uint32)
        p = (jnp.concatenate([p[0], zpad]), jnp.concatenate([p[1], zpad]),
             jnp.concatenate([p[2], zpad]),
             jnp.concatenate([p[3], jnp.ones((padn,), bool)]))
    if m == 1:
        return p
    lanes = jnp.arange(m, dtype=jnp.int32)

    def body(l, p):
        partner = lanes ^ jnp.left_shift(jnp.int32(1), l)
        q = tuple(v[partner] for v in p)
        return _add(p, q)

    p = jax.lax.fori_loop(0, m.bit_length() - 1, body, p)
    return tuple(v[:1] for v in p)


@jax.jit
def _msm_core(X, Y, Z, inf, bits):
    """bits: [NBITS, n] bool plan.  acc_i = sum over set bits of 2^k P_i."""
    n = X.shape[0]
    acc = (jnp.zeros_like(X), jnp.zeros_like(Y), jnp.zeros_like(Z),
           jnp.ones((n,), bool))
    base = (X, Y, Z, inf)

    def body(k, state):
        acc, base = state
        has = bits[k]
        q = (base[0], base[1], base[2], base[3] | ~has)
        return (_add(acc, q), _dbl(base))

    acc, _ = jax.lax.fori_loop(0, bits.shape[0], body, (acc, base))
    return _tree_reduce(acc)


NBITS = 254  # BN254 Fr scalars fit 254 bits


def msm(points_affine, scalars):
    """sum_i scalars[i] * points[i] on the accelerator.

    points_affine: list of (x, y) ints or None; scalars: list of ints.
    Returns affine (x, y) or None.  The batch is padded to the next power
    of two (infinity points, zero scalars) so the handful of MSM lengths
    in a Groth16 prove share one compiled executable per size class.
    """
    n = len(points_affine)
    assert n == len(scalars)
    if n == 0:
        return None
    m = max(32, 1 << (n - 1).bit_length())
    points_affine = list(points_affine) + [None] * (m - n)
    pts = load_points(points_affine)
    nbytes = (NBITS + 7) // 8
    raw = b"".join(int(s).to_bytes(nbytes, "little") for s in scalars)
    by = np.frombuffer(raw, dtype=np.uint8).reshape(n, nbytes)
    bits = np.zeros((m, NBITS), dtype=bool)
    bits[:n] = np.unpackbits(by, axis=1, bitorder="little")[:, :NBITS]
    out = _msm_core(*pts, jnp.asarray(bits.T))
    return store_point(out)
