// BN254 G1/G2 kernels: Montgomery Fq, Jacobian arithmetic, Pippenger MSM,
// windowed fixed-base batches.  The SNARK layer's host hot path — the role
// bellman/bellperson's multiexp plays in the reference (groth16/src/
// groth16.rs); the TPU MSM rides on top for pod-scale proofs.
//
// Interface (ctypes): affine points as canonical little-endian u64 limbs
// (G1: x[4],y[4]; G2: x.c0,x.c1,y.c0,y.c1), all-zero = infinity; scalars as
// u64[4].
#include <cstdint>
#include <cstring>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

typedef __uint128_t u128;
typedef uint64_t u64;

static const u64 Pq[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                          0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 R2q[4] = {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                           0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};
static const u64 N0INV = 0x87d20782e4866389ULL;
static const u64 ONEq[4] = {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                            0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL};

struct Fq { u64 v[4]; };

static inline bool fq_is_zero(const Fq &a) {
    return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool geq_p(const u64 a[4]) {
    for (int i = 3; i >= 0; --i) {
        if (a[i] > Pq[i]) return true;
        if (a[i] < Pq[i]) return false;
    }
    return true;
}

static inline void sub_p(u64 a[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a[i] - Pq[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static inline Fq fq_add(const Fq &a, const Fq &b) {
    Fq r;
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        r.v[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq_p(r.v)) sub_p(r.v);
    return r;
}

static inline Fq fq_sub(const Fq &a, const Fq &b) {
    Fq r;
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        r.v[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)r.v[i] + Pq[i] + carry;
            r.v[i] = (u64)s;
            carry = s >> 64;
        }
    }
    return r;
}

static inline Fq fq_dbl(const Fq &a) { return fq_add(a, a); }

// CIOS Montgomery multiplication
static inline Fq fq_mul(const Fq &a, const Fq &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * N0INV;
        carry = ((u128)t[0] + (u128)m * Pq[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 cur2 = (u128)t[j] + (u128)m * Pq[j] + carry;
            t[j - 1] = (u64)cur2;
            carry = cur2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
    }
    Fq r = {{t[0], t[1], t[2], t[3]}};
    if (t[4] || geq_p(r.v)) sub_p(r.v);
    return r;
}

static inline Fq fq_sq(const Fq &a) { return fq_mul(a, a); }

static inline Fq to_mont(const Fq &a) { Fq r2 = {{R2q[0], R2q[1], R2q[2], R2q[3]}}; return fq_mul(a, r2); }
static inline Fq from_mont(const Fq &a) { Fq one = {{1, 0, 0, 0}}; return fq_mul(a, one); }

static inline Fq fq_inv(const Fq &a) {
    // a^(p-2) by square-and-multiply over the exponent limbs
    static const u64 e[4] = {0x3c208c16d87cfd45ULL, 0x97816a916871ca8dULL,
                             0xb85045b68181585dULL, 0x30644e72e131a029ULL};
    Fq result = {{ONEq[0], ONEq[1], ONEq[2], ONEq[3]}};
    Fq base = a;
    for (int limb = 0; limb < 4; ++limb) {
        u64 bits = e[limb];
        for (int i = 0; i < 64; ++i) {
            if (bits & 1) result = fq_mul(result, base);
            base = fq_sq(base);
            bits >>= 1;
        }
    }
    return result;
}

// ---- Fq2 = Fq[u]/(u^2+1) ----
struct Fq2 { Fq c0, c1; };

static inline bool fq2_is_zero(const Fq2 &a) { return fq_is_zero(a.c0) && fq_is_zero(a.c1); }
static inline Fq2 fq2_add(const Fq2 &a, const Fq2 &b) { return {fq_add(a.c0, b.c0), fq_add(a.c1, b.c1)}; }
static inline Fq2 fq2_sub(const Fq2 &a, const Fq2 &b) { return {fq_sub(a.c0, b.c0), fq_sub(a.c1, b.c1)}; }
static inline Fq2 fq2_dbl(const Fq2 &a) { return {fq_dbl(a.c0), fq_dbl(a.c1)}; }
static inline Fq2 fq2_mul(const Fq2 &a, const Fq2 &b) {
    Fq t0 = fq_mul(a.c0, b.c0);
    Fq t1 = fq_mul(a.c1, b.c1);
    Fq s = fq_mul(fq_add(a.c0, a.c1), fq_add(b.c0, b.c1));
    return {fq_sub(t0, t1), fq_sub(fq_sub(s, t0), t1)};
}
static inline Fq2 fq2_sq(const Fq2 &a) { return fq2_mul(a, a); }
static inline Fq2 fq2_smul(const Fq2 &a, const Fq &k) { return {fq_mul(a.c0, k), fq_mul(a.c1, k)}; }
static inline Fq2 fq2_inv(const Fq2 &a) {
    Fq t = fq_inv(fq_add(fq_sq(a.c0), fq_sq(a.c1)));
    Fq zero = {{0, 0, 0, 0}};
    return {fq_mul(a.c0, t), fq_sub(zero, fq_mul(a.c1, t))};
}

// ---- generic Jacobian point templated over the field ----
template <typename F>
struct Pt { F X, Y, Z; bool inf; };

template <typename F, F (*ADD)(const F &, const F &),
          F (*SUB)(const F &, const F &), F (*MUL)(const F &, const F &),
          F (*SQ)(const F &), F (*DBL)(const F &)>
static inline Pt<F> pt_double(const Pt<F> &p) {
    if (p.inf) return p;
    F A = SQ(p.X);
    F B = SQ(p.Y);
    F C = SQ(B);
    F t = SQ(ADD(p.X, B));
    F D = DBL(SUB(SUB(t, A), C));
    F E = ADD(ADD(A, A), A);
    F Fv = SQ(E);
    Pt<F> r;
    r.X = SUB(Fv, DBL(D));
    F c8 = DBL(DBL(DBL(C)));
    r.Y = SUB(MUL(E, SUB(D, r.X)), c8);
    r.Z = DBL(MUL(p.Y, p.Z));
    r.inf = false;
    return r;
}

template <typename F, F (*ADD)(const F &, const F &),
          F (*SUB)(const F &, const F &), F (*MUL)(const F &, const F &),
          F (*SQ)(const F &), F (*DBL)(const F &), bool (*ISZ)(const F &)>
static inline Pt<F> pt_add(const Pt<F> &p, const Pt<F> &q) {
    if (p.inf) return q;
    if (q.inf) return p;
    F Z1Z1 = SQ(p.Z);
    F Z2Z2 = SQ(q.Z);
    F U1 = MUL(p.X, Z2Z2);
    F U2 = MUL(q.X, Z1Z1);
    F S1 = MUL(MUL(p.Y, q.Z), Z2Z2);
    F S2 = MUL(MUL(q.Y, p.Z), Z1Z1);
    F H = SUB(U2, U1);
    F Rv = SUB(S2, S1);
    if (ISZ(H)) {
        if (ISZ(Rv)) return pt_double<F, ADD, SUB, MUL, SQ, DBL>(p);
        Pt<F> r;
        r.inf = true;
        return r;
    }
    F I = SQ(DBL(H));
    F J = MUL(H, I);
    F r2 = DBL(Rv);
    F V = MUL(U1, I);
    Pt<F> r;
    r.X = SUB(SUB(SQ(r2), J), DBL(V));
    r.Y = SUB(MUL(r2, SUB(V, r.X)), DBL(MUL(S1, J)));
    r.Z = MUL(SUB(SUB(SQ(ADD(p.Z, q.Z)), Z1Z1), Z2Z2), H);
    r.inf = false;
    return r;
}

typedef Pt<Fq> G1;
typedef Pt<Fq2> G2;

static inline G1 g1_dbl(const G1 &p) { return pt_double<Fq, fq_add, fq_sub, fq_mul, fq_sq, fq_dbl>(p); }
static inline G1 g1_add(const G1 &p, const G1 &q) { return pt_add<Fq, fq_add, fq_sub, fq_mul, fq_sq, fq_dbl, fq_is_zero>(p, q); }
static inline G2 g2_dbl(const G2 &p) { return pt_double<Fq2, fq2_add, fq2_sub, fq2_mul, fq2_sq, fq2_dbl>(p); }
static inline G2 g2_add(const G2 &p, const G2 &q) { return pt_add<Fq2, fq2_add, fq2_sub, fq2_mul, fq2_sq, fq2_dbl, fq2_is_zero>(p, q); }

// ---- (de)serialization ----
static inline G1 g1_load(const u64 *xy) {
    G1 p;
    bool zero = true;
    for (int i = 0; i < 8; ++i) zero &= (xy[i] == 0);
    p.inf = zero;
    if (zero) return p;
    Fq x, y;
    memcpy(x.v, xy, 32);
    memcpy(y.v, xy + 4, 32);
    p.X = to_mont(x);
    p.Y = to_mont(y);
    p.Z = {{ONEq[0], ONEq[1], ONEq[2], ONEq[3]}};
    return p;
}

static inline void g1_store(const G1 &p, u64 *xy) {
    if (p.inf || fq_is_zero(p.Z)) { memset(xy, 0, 64); return; }
    Fq zi = fq_inv(p.Z);
    Fq zi2 = fq_sq(zi);
    Fq x = from_mont(fq_mul(p.X, zi2));
    Fq y = from_mont(fq_mul(p.Y, fq_mul(zi2, zi)));
    memcpy(xy, x.v, 32);
    memcpy(xy + 4, y.v, 32);
}

static inline G2 g2_load(const u64 *xy) {
    G2 p;
    bool zero = true;
    for (int i = 0; i < 16; ++i) zero &= (xy[i] == 0);
    p.inf = zero;
    if (zero) return p;
    Fq a, b, c, d;
    memcpy(a.v, xy, 32);
    memcpy(b.v, xy + 4, 32);
    memcpy(c.v, xy + 8, 32);
    memcpy(d.v, xy + 12, 32);
    p.X = {to_mont(a), to_mont(b)};
    p.Y = {to_mont(c), to_mont(d)};
    Fq one = {{ONEq[0], ONEq[1], ONEq[2], ONEq[3]}};
    Fq zf = {{0, 0, 0, 0}};
    p.Z = {one, zf};
    return p;
}

static inline void g2_store(const G2 &p, u64 *xy) {
    if (p.inf || fq2_is_zero(p.Z)) { memset(xy, 0, 128); return; }
    Fq2 zi = fq2_inv(p.Z);
    Fq2 zi2 = fq2_sq(zi);
    Fq2 x = fq2_mul(p.X, zi2);
    Fq2 y = fq2_mul(p.Y, fq2_mul(zi2, zi));
    Fq xs0 = from_mont(x.c0), xs1 = from_mont(x.c1);
    Fq ys0 = from_mont(y.c0), ys1 = from_mont(y.c1);
    memcpy(xy, xs0.v, 32);
    memcpy(xy + 4, xs1.v, 32);
    memcpy(xy + 8, ys0.v, 32);
    memcpy(xy + 12, ys1.v, 32);
}

// ---- Pippenger MSM ----
template <typename PT, PT (*PADD)(const PT &, const PT &), PT (*PDBL)(const PT &)>
static void msm_impl(const std::vector<PT> &pts, const u64 *scalars,
                     size_t n, PT &out) {
    int window = n < 32 ? 4 : 1;
    {
        size_t t = n;
        int lg = 0;
        while (t > 1) { t >>= 1; ++lg; }
        window = lg > 4 ? (lg - 2 > 16 ? 16 : lg - 2) : 4;
    }
    int n_windows = (254 + window - 1) / window;
    std::vector<PT> partial(n_windows);

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int w = 0; w < n_windows; ++w) {
        std::vector<PT> buckets((size_t)1 << window);
        for (auto &b : buckets) b.inf = true;
        int shift = w * window;
        int limb = shift / 64;
        int off = shift % 64;
        for (size_t i = 0; i < n; ++i) {
            const u64 *s = scalars + 4 * i;
            u64 idx = s[limb] >> off;
            if (off + window > 64 && limb + 1 < 4)
                idx |= s[limb + 1] << (64 - off);
            idx &= (((u64)1 << window) - 1);
            if (idx) buckets[idx] = PADD(buckets[idx], pts[i]);
        }
        PT running, acc;
        running.inf = true;
        acc.inf = true;
        for (size_t b = buckets.size() - 1; b >= 1; --b) {
            running = PADD(running, buckets[b]);
            acc = PADD(acc, running);
        }
        partial[w] = acc;
    }
    PT result;
    result.inf = true;
    for (int w = n_windows - 1; w >= 0; --w) {
        if (w != n_windows - 1)
            for (int i = 0; i < window; ++i) result = PDBL(result);
        result = PADD(result, partial[w]);
    }
    out = result;
}

extern "C" {

void g1_msm(const u64 *points, const u64 *scalars, u64 n, u64 *out) {
    std::vector<G1> pts(n);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long i = 0; i < (long long)n; ++i) pts[i] = g1_load(points + 8 * i);
    G1 r;
    msm_impl<G1, g1_add, g1_dbl>(pts, scalars, n, r);
    g1_store(r, out);
}

void g2_msm(const u64 *points, const u64 *scalars, u64 n, u64 *out) {
    std::vector<G2> pts(n);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long i = 0; i < (long long)n; ++i) pts[i] = g2_load(points + 16 * i);
    G2 r;
    msm_impl<G2, g2_add, g2_dbl>(pts, scalars, n, r);
    g2_store(r, out);
}

// Windowed fixed-base batch: out[i] = scalars[i] * base, for n scalars.
void g1_fixed_batch(const u64 *base, const u64 *scalars, u64 n, u64 *out) {
    const int W = 8;
    const int NW = (254 + W - 1) / W;
    std::vector<G1> table((size_t)NW << W);
    G1 cur = g1_load(base);
    for (int w = 0; w < NW; ++w) {
        G1 *row = &table[(size_t)w << W];
        row[0].inf = true;
        for (int i = 1; i < (1 << W); ++i) row[i] = g1_add(row[i - 1], cur);
        cur = g1_add(row[(1 << W) - 1], cur);
    }
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long i = 0; i < (long long)n; ++i) {
        const u64 *s = scalars + 4 * i;
        G1 acc;
        acc.inf = true;
        for (int w = 0; w < NW; ++w) {
            int shift = w * W;
            u64 idx = s[shift / 64] >> (shift % 64);
            if (shift % 64 + W > 64 && shift / 64 + 1 < 4)
                idx |= s[shift / 64 + 1] << (64 - shift % 64);
            idx &= ((1 << W) - 1);
            if (idx) acc = g1_add(acc, table[((size_t)w << W) + idx]);
        }
        g1_store(acc, out + 8 * i);
    }
}

void g2_fixed_batch(const u64 *base, const u64 *scalars, u64 n, u64 *out) {
    const int W = 8;
    const int NW = (254 + W - 1) / W;
    std::vector<G2> table((size_t)NW << W);
    G2 cur = g2_load(base);
    for (int w = 0; w < NW; ++w) {
        G2 *row = &table[(size_t)w << W];
        row[0].inf = true;
        for (int i = 1; i < (1 << W); ++i) row[i] = g2_add(row[i - 1], cur);
        cur = g2_add(row[(1 << W) - 1], cur);
    }
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long i = 0; i < (long long)n; ++i) {
        const u64 *s = scalars + 4 * i;
        G2 acc;
        acc.inf = true;
        for (int w = 0; w < NW; ++w) {
            int shift = w * W;
            u64 idx = s[shift / 64] >> (shift % 64);
            if (shift % 64 + W > 64 && shift / 64 + 1 < 4)
                idx |= s[shift / 64 + 1] << (64 - shift % 64);
            idx &= ((1 << W) - 1);
            if (idx) acc = g2_add(acc, table[((size_t)w << W) + idx]);
        }
        g2_store(acc, out + 16 * i);
    }
}

}  // extern "C"

// ---- Fr (the scalar field): Montgomery + radix-2 NTT for the Groth16
// quotient polynomial (groth16/groth16.py _witness_h) ----

static const u64 Pr[4] = {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                          0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 R2r[4] = {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                           0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL};
static const u64 N0INVr = 0xc2e1f593efffffffULL;
static const u64 ONEr[4] = {0xac96341c4ffffffbULL, 0x36fc76959f60cd29ULL,
                            0x666ea36f7879462eULL, 0x0e0a77c19a07df2fULL};

struct Fr { u64 v[4]; };

static inline bool geq_pr(const u64 a[4]) {
    for (int i = 3; i >= 0; --i) {
        if (a[i] > Pr[i]) return true;
        if (a[i] < Pr[i]) return false;
    }
    return true;
}

static inline void sub_pr(u64 a[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a[i] - Pr[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static inline Fr fr_add(const Fr &a, const Fr &b) {
    Fr r;
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        r.v[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq_pr(r.v)) sub_pr(r.v);
    return r;
}

static inline Fr fr_sub(const Fr &a, const Fr &b) {
    Fr r;
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        r.v[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)r.v[i] + Pr[i] + carry;
            r.v[i] = (u64)s;
            carry = s >> 64;
        }
    }
    return r;
}

static inline Fr fr_mul(const Fr &a, const Fr &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);
        u64 m = t[0] * N0INVr;
        carry = ((u128)t[0] + (u128)m * Pr[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 cur2 = (u128)t[j] + (u128)m * Pr[j] + carry;
            t[j - 1] = (u64)cur2;
            carry = cur2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
    }
    Fr r = {{t[0], t[1], t[2], t[3]}};
    if (t[4] || geq_pr(r.v)) sub_pr(r.v);
    return r;
}

static inline Fr fr_to_mont(const Fr &a) { Fr r2 = {{R2r[0], R2r[1], R2r[2], R2r[3]}}; return fr_mul(a, r2); }
static inline Fr fr_from_mont(const Fr &a) { Fr one = {{1, 0, 0, 0}}; return fr_mul(a, one); }

static void fr_ntt_inplace(Fr *buf, size_t n, const Fr &w_mont) {
    // bit reverse
    size_t j = 0;
    for (size_t i = 1; i < n; ++i) {
        size_t bit = n >> 1;
        while (j & bit) { j ^= bit; bit >>= 1; }
        j |= bit;
        if (i < j) { Fr t = buf[i]; buf[i] = buf[j]; buf[j] = t; }
    }
    for (size_t m = 2; m <= n; m <<= 1) {
        // wm = w^(n/m)
        Fr wm = w_mont;
        for (size_t s = n / m; s > 1; s >>= 1) wm = fr_mul(wm, wm);
        size_t half = m >> 1;
        std::vector<Fr> tw(half);
        tw[0] = {{ONEr[0], ONEr[1], ONEr[2], ONEr[3]}};
        for (size_t k = 1; k < half; ++k) tw[k] = fr_mul(tw[k - 1], wm);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (n / m > 8)
#endif
        for (long long blk = 0; blk < (long long)(n / m); ++blk) {
            Fr *base = buf + (size_t)blk * m;
            for (size_t k = 0; k < half; ++k) {
                Fr t = fr_mul(base[k + half], tw[k]);
                Fr u = base[k];
                base[k] = fr_add(u, t);
                base[k + half] = fr_sub(u, t);
            }
        }
    }
}

extern "C" {

// H = intt( coset(az)*coset(bz) - coset(cz) ) / Z_coset, un-shifted.
// All arrays are n x 4 canonical LE limbs; w/shift/etc scalars are 4 limbs.
void fr_witness_h(u64 *az, u64 *bz, u64 *cz, u64 n, const u64 *w_limbs,
                  const u64 *shift_limbs, const u64 *zinv_limbs,
                  u64 *out /* (n) x 4; top word zero-checked by caller */) {
    Fr w, shift, zinv;
    memcpy(w.v, w_limbs, 32);
    memcpy(shift.v, shift_limbs, 32);
    memcpy(zinv.v, zinv_limbs, 32);
    w = fr_to_mont(w);
    shift = fr_to_mont(shift);
    zinv = fr_to_mont(zinv);
    Fr one = {{ONEr[0], ONEr[1], ONEr[2], ONEr[3]}};
    Fr n_fr = {{n, 0, 0, 0}};
    n_fr = fr_to_mont(n_fr);
    // n^-1 = n^(r-2)
    Fr n_inv = one;
    {
        static const u64 e[4] = {0x43e1f593efffffffULL, 0x2833e84879b97091ULL,
                                 0xb85045b68181585dULL, 0x30644e72e131a029ULL};
        Fr base = n_fr;
        for (int limb = 0; limb < 4; ++limb) {
            u64 bits = e[limb];
            for (int i = 0; i < 64; ++i) {
                if (bits & 1) n_inv = fr_mul(n_inv, base);
                base = fr_mul(base, base);
                bits >>= 1;
            }
        }
    }
    Fr w_inv = one;  // w^(n-1) since w^n = 1
    {
        Fr cur = w;
        for (u64 k = n - 1; k; k >>= 1) {
            if (k & 1) w_inv = fr_mul(w_inv, cur);
            cur = fr_mul(cur, cur);
        }
    }

    Fr *a = new Fr[n], *b = new Fr[n], *c = new Fr[n];
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long i = 0; i < (long long)n; ++i) {
        Fr t;
        memcpy(t.v, az + 4 * i, 32); a[i] = fr_to_mont(t);
        memcpy(t.v, bz + 4 * i, 32); b[i] = fr_to_mont(t);
        memcpy(t.v, cz + 4 * i, 32); c[i] = fr_to_mont(t);
    }

    auto to_coset = [&](Fr *arr) {
        fr_ntt_inplace(arr, n, w_inv);  // intt = ntt with w^-1 ...
        // scale by n_inv * shift^j
        Fr sp = n_inv;
#ifdef _OPENMP
        // sequential: sp chain (cheap relative to ntt)
#endif
        for (size_t j2 = 0; j2 < n; ++j2) {
            arr[j2] = fr_mul(arr[j2], sp);
            sp = fr_mul(sp, shift);
        }
        fr_ntt_inplace(arr, n, w);
    };
    to_coset(a);
    to_coset(b);
    to_coset(c);

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long i = 0; i < (long long)n; ++i)
        a[i] = fr_mul(fr_sub(fr_mul(a[i], b[i]), c[i]), zinv);

    fr_ntt_inplace(a, n, w_inv);
    Fr shift_inv = one;
    {  // shift^(r-2)
        static const u64 e[4] = {0x43e1f593efffffffULL, 0x2833e84879b97091ULL,
                                 0xb85045b68181585dULL, 0x30644e72e131a029ULL};
        Fr base = shift;
        for (int limb = 0; limb < 4; ++limb) {
            u64 bits = e[limb];
            for (int i = 0; i < 64; ++i) {
                if (bits & 1) shift_inv = fr_mul(shift_inv, base);
                base = fr_mul(base, base);
                bits >>= 1;
            }
        }
    }
    Fr sp = n_inv;
    for (size_t j2 = 0; j2 < n; ++j2) {
        Fr r = fr_from_mont(fr_mul(a[j2], fr_mul(sp, one)));
        memcpy(out + 4 * j2, r.v, 32);
        sp = fr_mul(sp, shift_inv);
    }
    delete[] a; delete[] b; delete[] c;
}

}  // extern "C"
