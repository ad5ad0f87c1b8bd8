"""Groth16 zkSNARK: circuit-specific setup, prover, verifier.

Reference: groth16/src/groth16.rs (thin wrapper over bellman_ce's
create_random_proof / verify_proof) and bellman's generator semantics:
the QAP domain is the constraint rows followed by one input-consistency row
per public input (A_i = 1 there), domain padded to a power of two.

Curve-generic: `curve` is a module exposing the bn254.py interface
(curves/bn254.py, curves/bls12_381.py); the scalar field is curve.R.

R1CS constraints are {signal: coef} dict triples with key 0 = the one-wire
(recursion/circuit.py convention, equal to circom's wire layout
[1, publics..., privates...]).
"""
from __future__ import annotations

import os
import secrets
from dataclasses import dataclass

from ..curves.msm import msm_g1, msm_g2


def _find_root(r: int, m: int) -> int:
    """Primitive m-th root of unity in F_r (m a power of two)."""
    two_adic = (r - 1) & -(r - 1)
    assert m <= two_adic, "domain too large for field 2-adicity"
    g = 5
    while pow(g, (r - 1) // 2, r) == 1:
        g += 1
    return pow(g, (r - 1) // m, r)


def _ntt(vals, w, r):
    n = len(vals)
    if n == 1:
        return list(vals)
    nbits = n.bit_length() - 1
    buf = list(vals)
    # bit reverse
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            buf[i], buf[j] = buf[j], buf[i]
    m = 2
    while m <= n:
        wm = pow(w, n // m, r)
        for k in range(0, n, m):
            wj = 1
            for j2 in range(m // 2):
                t = buf[k + j2 + m // 2] * wj % r
                u = buf[k + j2]
                buf[k + j2] = (u + t) % r
                buf[k + j2 + m // 2] = (u - t) % r
                wj = wj * wm % r
        m <<= 1
    return buf


def _intt(vals, w, r):
    n = len(vals)
    res = _ntt(vals, pow(w, r - 2, r), r)
    n_inv = pow(n, r - 2, r)
    return [x * n_inv % r for x in res]


@dataclass
class ProvingKey:
    curve_name: str
    n_public: int          # public wires excluding the one-wire
    n_vars: int
    domain_size: int
    alpha1: tuple
    beta1: tuple
    beta2: tuple
    delta1: tuple
    delta2: tuple
    a_query: list          # G1, per wire: A_i(tau)
    b1_query: list         # G1, per wire: B_i(tau)
    b2_query: list         # G2, per wire: B_i(tau)
    l_query: list          # G1, private wires: (beta A + alpha B + C)/delta
    h_query: list          # G1: tau^i Z(tau)/delta


@dataclass
class VerifyingKey:
    curve_name: str
    alpha1: tuple
    beta2: tuple
    gamma2: tuple
    delta2: tuple
    ic: list               # G1 per public wire (incl. one-wire)


@dataclass
class Proof:
    a: tuple               # G1 affine
    b: tuple               # G2 affine
    c: tuple               # G1 affine


def _eval_qap(constraints, n_vars, n_pub_total, tau, r, m):
    """A_i(tau), B_i(tau), C_i(tau) for every wire, plus Z(tau).

    Rows 0..n_constraints-1 are the constraints; rows n_constraints..+n_pub
    bind the public wires (A_i = 1 there, bellman's input consistency)."""
    w = _find_root(r, m)
    # Lagrange values L_j(tau) = Z(tau) * w^j / (m * (tau - w^j))
    z_tau = (pow(tau, m, r) - 1) % r
    m_inv = pow(m, r - 2, r)
    wjs = [0] * m
    wj = 1
    for j in range(m):
        wjs[j] = wj
        wj = wj * w % r
    # batch-invert all (tau - w^j) with one Fermat pow (Montgomery trick)
    dens = [(tau - x) % r for x in wjs]
    pref = [0] * m
    acc = 1
    for j in range(m):
        acc = acc * dens[j] % r
        pref[j] = acc
    inv_acc = pow(acc, r - 2, r)
    invs = [0] * m
    for j in range(m - 1, 0, -1):
        invs[j] = inv_acc * pref[j - 1] % r
        inv_acc = inv_acc * dens[j] % r
    invs[0] = inv_acc
    zm = z_tau * m_inv % r
    lj = [zm * wjs[j] % r * invs[j] % r for j in range(m)]
    a_t = [0] * n_vars
    b_t = [0] * n_vars
    c_t = [0] * n_vars
    for j, (A, B, C) in enumerate(constraints):
        for s, coef in A.items():
            a_t[s] = (a_t[s] + coef * lj[j]) % r
        for s, coef in B.items():
            b_t[s] = (b_t[s] + coef * lj[j]) % r
        for s, coef in C.items():
            c_t[s] = (c_t[s] + coef * lj[j]) % r
    nc = len(constraints)
    for i in range(n_pub_total):
        a_t[i] = (a_t[i] + lj[nc + i]) % r
    return a_t, b_t, c_t, z_tau


def setup(curve, constraints, n_vars: int, n_publics: int,
          rng=None) -> tuple[ProvingKey, VerifyingKey]:
    """Circuit-specific trusted setup (groth16/src/api.rs groth16_setup;
    bellman generate_random_parameters)."""
    r = curve.R
    rand = rng or (lambda: secrets.randbelow(r - 1) + 1)
    alpha, beta, gamma, delta, tau = (rand() for _ in range(5))
    n_pub_total = n_publics + 1  # one-wire is public
    m = 1
    while m < len(constraints) + n_pub_total:
        m <<= 1
    a_t, b_t, c_t, z_tau = _eval_qap(constraints, n_vars, n_pub_total,
                                     tau, r, m)

    delta_inv = pow(delta, r - 2, r)
    gamma_inv = pow(gamma, r - 2, r)

    ks = [(beta * a_t[i] + alpha * b_t[i] + c_t[i]) % r
          for i in range(n_vars)]
    tz = []
    tp = 1
    for _ in range(m - 1):
        tz.append(tp * z_tau % r * delta_inv % r)
        tp = tp * tau % r
    g1_scalars = ([alpha, beta, delta] + a_t + b_t
                  + [k * gamma_inv % r for k in ks[:n_pub_total]]
                  + [k * delta_inv % r for k in ks[n_pub_total:]] + tz)
    g2_scalars = [beta, gamma, delta] + b_t
    g1_pts = _fixed_base_all(curve, curve.G1_GEN, g1_scalars, g1=True)
    g2_pts = _fixed_base_all(curve, curve.G2_GEN, g2_scalars, g1=False)

    pos = 3
    a_query = g1_pts[pos : pos + n_vars]
    pos += n_vars
    b1_query = g1_pts[pos : pos + n_vars]
    pos += n_vars
    ic = g1_pts[pos : pos + n_pub_total]
    pos += n_pub_total
    l_query = g1_pts[pos : pos + n_vars - n_pub_total]
    pos += n_vars - n_pub_total
    h_query = g1_pts[pos:]
    b2_query = g2_pts[3:]

    pk = ProvingKey(
        curve_name=getattr(curve, "NAME", "bn128"), n_public=n_publics,
        n_vars=n_vars, domain_size=m,
        alpha1=g1_pts[0], beta1=g1_pts[1], beta2=g2_pts[0],
        delta1=g1_pts[2], delta2=g2_pts[2],
        a_query=a_query, b1_query=b1_query, b2_query=b2_query,
        l_query=l_query, h_query=h_query)
    vk = VerifyingKey(
        curve_name=pk.curve_name, alpha1=pk.alpha1, beta2=pk.beta2,
        gamma2=g2_pts[1], delta2=pk.delta2, ic=ic)
    return pk, vk


def _native_ec(curve):
    try:
        from .. import native
    except Exception:
        return None
    name = getattr(curve, "NAME", "bn128")
    if name in ("bn128", "bn254") or curve.P.bit_length() == 254:
        return native.ec_bn254
    if name == "bls12381" or curve.P.bit_length() == 381:
        return native.ec_bls12381
    return None


def _fixed_base_all(curve, base, scalars, g1: bool):
    scalars = [int(s) % curve.R for s in scalars]
    nat = _native_ec(curve)
    if nat is not None:
        # raw limb rows (native.RawAffine): prove-side MSMs consume them
        # with zero marshalling; element access decodes on demand
        return (nat.g1_fixed_batch if g1 else nat.g2_fixed_batch)(
            base, scalars, raw=True)
    from ..curves.msm import g1_fixed_base, g2_fixed_base
    fb = g1_fixed_base(curve) if g1 else g2_fixed_base(curve)
    to_aff = curve.g1_to_affine if g1 else curve.g2_to_affine
    return [to_aff(fb.mul(s)) for s in scalars]


# pre-marshalled point-limb arrays per (query list, group): proving keys
# are reused across proofs, so pay the bigint -> limbs conversion once.
# The stored list reference both guards id() reuse and keeps it alive.
_msm_prep_cache: dict = {}


def _msm(curve, points, scalars, g1: bool):
    # Engine default = the recorded benchmark winner (bench.py
    # bench_msm_rates: msm_points_per_s_{host,tpu}) — the host IFMA
    # Pippenger wins at every measured size, so the TPU double-and-add
    # (ops/ec_jax.py, bit-exact) stays an explicit opt-in:
    # EIGEN_ZKVM_TPU_MSM=1 (BN254 G1 only).
    if g1 and os.environ.get("EIGEN_ZKVM_TPU_MSM") == "1" \
            and curve.P.bit_length() == 254:
        from ..ops import ec_jax
        return ec_jax.msm(points, [int(s) % curve.R for s in scalars])
    nat = _native_ec(curve)
    if nat is not None:
        from ..native import RawAffine

        if isinstance(points, RawAffine):
            ent = (points, None)  # g1_msm/g2_msm take the limbs directly
        else:
            key = (id(points), g1)
            ent = _msm_prep_cache.get(key)
            if ent is None or ent[0] is not points:
                pts = (nat.prep_g1 if g1 else nat.prep_g2)(points)
                _msm_prep_cache[key] = ent = (points, pts)
        # single-slot scalar cache: consecutive A/B1/B2 MSMs reuse the
        # same witness list (one slot only, so proofs don't accumulate)
        sent = _msm_prep_cache.get("sc_last")
        if sent is None or sent[0] is not scalars:
            sent = (scalars, nat._scalars(scalars))
            _msm_prep_cache["sc_last"] = sent
        return (nat.g1_msm if g1 else nat.g2_msm)(points, sent[1],
                                                  pts=ent[1])
    from ..curves.msm import msm_g1, msm_g2
    return (msm_g1 if g1 else msm_g2)(curve, points, scalars)


def _int_limbs(vals, r):
    """List of ints -> [n, 4] u64 LE limb array (values reduced mod r)."""
    import numpy as np

    blob = b"".join((int(v) % r).to_bytes(32, "little") for v in vals)
    return np.frombuffer(blob, dtype="<u8").reshape(len(vals), 4).copy()


def _r1cs_csr(nat, constraints, r):
    """Cached CSR form of the three constraint matrices with
    Montgomery-converted coefficients (one conversion per proving key)."""
    import numpy as np

    ent = _msm_prep_cache.get(("csr", id(constraints)))
    if ent is not None and ent[0] is constraints:
        return ent[1]
    # circuit R1CS reuses a small set of coefficient values (1, -1, gate
    # constants) millions of times — marshal/Montgomery-convert each
    # distinct value once and index into the table
    uniq: dict = {}
    per_sel = []
    for sel in range(3):
        indptr = np.empty(len(constraints) + 1, dtype=np.uint64)
        indptr[0] = 0
        wires = []
        cidx = []
        for j, row in enumerate(constraints):
            for s, c in row[sel].items():
                wires.append(s)
                cidx.append(uniq.setdefault(c, len(uniq)))
            indptr[j + 1] = len(wires)
        per_sel.append((indptr, np.asarray(wires, dtype=np.uint32),
                        np.asarray(cidx, dtype=np.int64)))
    uniq_m = nat.fr_to_mont(_int_limbs(list(uniq), r))
    mats = [(indptr, wires, np.ascontiguousarray(uniq_m[cidx]))
            for indptr, wires, cidx in per_sel]
    _msm_prep_cache[("csr", id(constraints))] = (constraints, mats)
    return mats


def _witness_h(curve, constraints, witness, n_pub_total, m):
    """Coefficients of H = (A*B - C)/Z via coset NTTs over F_r."""
    import numpy as np

    r = curve.R
    w = _find_root(r, m)
    nc = len(constraints)
    shift = 5  # any non-subgroup element works as the coset shift
    nat = _native_ec(curve)
    if nat is not None:
        from ..utils.profiler import Prof

        prof = Prof("groth16.witness_h")
        # sparse evaluation + the whole quotient pipeline on limb arrays
        mats = _r1cs_csr(nat, constraints, r)
        prof.tick("csr build")
        wit_l = _int_limbs(witness, r)
        prof.tick("witness limbs")
        abz = []
        for indptr, wires, coefs_m in mats:
            vals = nat.r1cs_eval(indptr, wires, coefs_m, wit_l)
            full = np.zeros((m, 4), dtype=np.uint64)
            full[:nc] = vals
            abz.append(full)
        prof.tick("r1cs eval")
        az_a, bz_a, cz_a = abz
        az_a[nc : nc + n_pub_total] = wit_l[:n_pub_total]
        z_coset_inv = pow((pow(shift, m, r) - 1) % r, r - 2, r)
        out = nat.fr_witness_h(az_a, bz_a, cz_a, w, shift, z_coset_inv,
                               raw=True)
        prof.tick("quotient ntts")
        assert not out[m - 1].any(), "H degree overflow"
        return np.ascontiguousarray(out[: m - 1])

    az = [0] * m
    bz = [0] * m
    cz = [0] * m
    for j, (A, B, C) in enumerate(constraints):
        az[j] = sum(witness[s] * c for s, c in A.items()) % r
        bz[j] = sum(witness[s] * c for s, c in B.items()) % r
        cz[j] = sum(witness[s] * c for s, c in C.items()) % r
    for i in range(n_pub_total):
        az[nc + i] = witness[i] % r

    def to_coset(evals):
        coeffs = _intt(evals, w, r)
        sp = 1
        out = []
        for cfe in coeffs:
            out.append(cfe * sp % r)
            sp = sp * shift % r
        return _ntt(out, w, r)

    ac = to_coset(az)
    bc = to_coset(bz)
    cc = to_coset(cz)
    z_coset_inv = pow((pow(shift, m, r) - 1) % r, r - 2, r)
    hc = [(a * b - c) % r * z_coset_inv % r for a, b, c in zip(ac, bc, cc)]
    coeffs = _intt(hc, w, r)
    shift_inv = pow(shift, r - 2, r)
    sp = 1
    out = []
    for cfe in coeffs:
        out.append(cfe * sp % r)
        sp = sp * shift_inv % r
    assert out[m - 1] == 0, "H degree overflow"
    return out[: m - 1]


def prove(curve, pk: ProvingKey, constraints, witness,
          rng=None) -> tuple[Proof, list]:
    """bellman create_random_proof equivalent; returns (proof, publics)."""
    r = curve.R
    rand = rng or (lambda: secrets.randbelow(r))
    rr, ss = rand(), rand()
    from ..utils.profiler import Prof

    prof = Prof("groth16.prove")
    witness = [int(x) % r for x in witness]
    n_pub_total = pk.n_public + 1
    h = _witness_h(curve, constraints, witness, n_pub_total, pk.domain_size)
    prof.tick("witness_h")

    g1 = curve.g1_from_affine
    # A = alpha + sum w_i A_i + r*delta
    a_acc = _msm(curve, pk.a_query, witness, g1=True)
    prof.tick("msm A")
    A = curve.g1_add(curve.g1_add(g1(a_acc), g1(pk.alpha1)),
                     curve.g1_mul(g1(pk.delta1), rr))
    # B (G2) and its G1 shadow
    b2_acc = _msm(curve, pk.b2_query, witness, g1=False)
    prof.tick("msm B2 (G2)")
    B = curve.g2_add(curve.g2_add(curve.g2_from_affine(b2_acc),
                                  curve.g2_from_affine(pk.beta2)),
                     curve.g2_mul(curve.g2_from_affine(curve.G2_GEN), 0))
    B = curve.g2_add(B, curve.g2_mul(curve.g2_from_affine(pk.delta2), ss))
    b1_acc = _msm(curve, pk.b1_query, witness, g1=True)
    prof.tick("msm B1")
    B1 = curve.g1_add(curve.g1_add(g1(b1_acc), g1(pk.beta1)),
                      curve.g1_mul(g1(pk.delta1), ss))
    # C = sum_priv w_i L_i + H(tau)Z/delta + s*A + r*B1 - r*s*delta
    l_acc = _msm(curve, pk.l_query, witness[n_pub_total:], g1=True)
    prof.tick("msm L")
    h_acc = _msm(curve, pk.h_query, h, g1=True)
    prof.tick("msm H")
    C = curve.g1_add(g1(l_acc), g1(h_acc))
    C = curve.g1_add(C, curve.g1_mul(A, ss))
    C = curve.g1_add(C, curve.g1_mul(B1, rr))
    C = curve.g1_add(C, curve.g1_neg(
        curve.g1_mul(g1(pk.delta1), rr * ss % r)))

    proof = Proof(a=curve.g1_to_affine(A), b=curve.g2_to_affine(B),
                  c=curve.g1_to_affine(C))
    return proof, witness[1:n_pub_total]


def verify(curve, vk: VerifyingKey, proof: Proof, publics) -> bool:
    """e(A, B) == e(alpha, beta) * e(IC(pub), gamma) * e(C, delta)."""
    r = curve.R
    publics = [int(x) % r for x in publics]
    if len(publics) + 1 != len(vk.ic):
        return False
    acc = curve.g1_from_affine(vk.ic[0])
    for w, pt in zip(publics, vk.ic[1:]):
        acc = curve.g1_add(acc, curve.g1_mul(curve.g1_from_affine(pt), w))
    ic = curve.g1_to_affine(acc)
    neg = lambda p: (p[0], (-p[1]) % curve.P) if p else None
    return curve.multi_pairing([
        (proof.a, proof.b),
        (neg(vk.alpha1), vk.beta2),
        (neg(ic), vk.gamma2),
        (neg(proof.c), vk.delta2),
    ])
