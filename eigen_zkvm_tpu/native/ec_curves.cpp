// Curve-generic EC kernels (BN254 + BLS12-381): Montgomery base fields,
// Jacobian G1/G2, Pippenger MSM, windowed fixed-base batches, scalar-field
// NTT quotient — the bellman/bellperson multiexp role for BOTH of the
// reference's SNARK curves (groth16/src/groth16.rs).
//
// ctypes interface: affine points as canonical LE u64 limbs (G1: x,y of
// NL limbs each; G2: x.c0,x.c1,y.c0,y.c1), all-zero = infinity; scalars
// u64[4].
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

// EIGEN_ZKVM_MSM_PROF=1: per-phase MSM timing breakdown on stderr
static inline double msm_now() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}
static inline bool msm_prof() {
    static const bool on = getenv("EIGEN_ZKVM_MSM_PROF") != nullptr;
    return on;
}

#include "mont52_avx512.h"

typedef __uint128_t u128;
typedef uint64_t u64;

template <int NL>
struct FieldParams {
    u64 P[NL];
    u64 R2[NL];
    u64 ONE[NL];
    u64 PM2[NL];  // P - 2 (inversion exponent)
    u64 N0INV;
};

template <int NL>
struct Fp {
    u64 v[NL];
};

template <int NL, const FieldParams<NL> *FP>
struct F {
    typedef Fp<NL> T;

    static inline bool is_zero(const T &a) {
        u64 acc = 0;
        for (int i = 0; i < NL; ++i) acc |= a.v[i];
        return acc == 0;
    }
    static inline bool geq_p(const u64 *a) {
        for (int i = NL - 1; i >= 0; --i) {
            if (a[i] > FP->P[i]) return true;
            if (a[i] < FP->P[i]) return false;
        }
        return true;
    }
    static inline void sub_p(u64 *a) {
        u128 borrow = 0;
        for (int i = 0; i < NL; ++i) {
            u128 d = (u128)a[i] - FP->P[i] - borrow;
            a[i] = (u64)d;
            borrow = (d >> 64) & 1;
        }
    }
    static inline T add(const T &a, const T &b) {
        T r;
        u128 carry = 0;
        for (int i = 0; i < NL; ++i) {
            u128 s = (u128)a.v[i] + b.v[i] + carry;
            r.v[i] = (u64)s;
            carry = s >> 64;
        }
        if (carry || geq_p(r.v)) sub_p(r.v);
        return r;
    }
    static inline T sub(const T &a, const T &b) {
        T r;
        u128 borrow = 0;
        for (int i = 0; i < NL; ++i) {
            u128 d = (u128)a.v[i] - b.v[i] - borrow;
            r.v[i] = (u64)d;
            borrow = (d >> 64) & 1;
        }
        if (borrow) {
            u128 carry = 0;
            for (int i = 0; i < NL; ++i) {
                u128 s = (u128)r.v[i] + FP->P[i] + carry;
                r.v[i] = (u64)s;
                carry = s >> 64;
            }
        }
        return r;
    }
    static inline T dbl(const T &a) { return add(a, a); }

    // CIOS Montgomery multiplication
    static inline T mul(const T &a, const T &b) {
        u64 t[NL + 2];
        memset(t, 0, sizeof(t));
        for (int i = 0; i < NL; ++i) {
            u128 carry = 0;
            for (int j = 0; j < NL; ++j) {
                u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
                t[j] = (u64)cur;
                carry = cur >> 64;
            }
            u128 cur = (u128)t[NL] + carry;
            t[NL] = (u64)cur;
            t[NL + 1] = (u64)(cur >> 64);

            u64 m = t[0] * FP->N0INV;
            carry = ((u128)t[0] + (u128)m * FP->P[0]) >> 64;
            for (int j = 1; j < NL; ++j) {
                u128 cur2 = (u128)t[j] + (u128)m * FP->P[j] + carry;
                t[j - 1] = (u64)cur2;
                carry = cur2 >> 64;
            }
            cur = (u128)t[NL] + carry;
            t[NL - 1] = (u64)cur;
            t[NL] = t[NL + 1] + (u64)(cur >> 64);
        }
        T r;
        memcpy(r.v, t, NL * 8);
        if (t[NL] || geq_p(r.v)) sub_p(r.v);
        return r;
    }
    static inline T sq(const T &a) { return mul(a, a); }
    static inline T to_mont(const T &a) {
        T r2;
        memcpy(r2.v, FP->R2, NL * 8);
        return mul(a, r2);
    }
    static inline T from_mont(const T &a) {
        T one;
        memset(one.v, 0, NL * 8);
        one.v[0] = 1;
        return mul(a, one);
    }
    static inline T one_mont() {
        T o;
        memcpy(o.v, FP->ONE, NL * 8);
        return o;
    }
    static inline bool is_one_mont(const T &a) {
        return memcmp(a.v, FP->ONE, NL * 8) == 0;
    }
    static inline T inv(const T &a) {
        T result = one_mont();
        T base = a;
        for (int limb = 0; limb < NL; ++limb) {
            u64 bits = FP->PM2[limb];
            for (int i = 0; i < 64; ++i) {
                if (bits & 1) result = mul(result, base);
                base = sq(base);
                bits >>= 1;
            }
        }
        return result;
    }
};

// quadratic extension u^2 = -1
template <typename FQ>
struct F2 {
    typedef typename FQ::T B;
    struct T { B c0, c1; };

    static inline bool is_zero(const T &a) {
        return FQ::is_zero(a.c0) && FQ::is_zero(a.c1);
    }
    static inline T add(const T &a, const T &b) {
        return {FQ::add(a.c0, b.c0), FQ::add(a.c1, b.c1)};
    }
    static inline T sub(const T &a, const T &b) {
        return {FQ::sub(a.c0, b.c0), FQ::sub(a.c1, b.c1)};
    }
    static inline T dbl(const T &a) { return {FQ::dbl(a.c0), FQ::dbl(a.c1)}; }
    static inline T mul(const T &a, const T &b) {
        B t0 = FQ::mul(a.c0, b.c0);
        B t1 = FQ::mul(a.c1, b.c1);
        B s = FQ::mul(FQ::add(a.c0, a.c1), FQ::add(b.c0, b.c1));
        return {FQ::sub(t0, t1), FQ::sub(FQ::sub(s, t0), t1)};
    }
    static inline T sq(const T &a) { return mul(a, a); }
    static inline T one_mont() {
        T o;
        o.c0 = FQ::one_mont();
        memset(o.c1.v, 0, sizeof(o.c1.v));
        return o;
    }
    static inline bool is_one_mont(const T &a) {
        return FQ::is_one_mont(a.c0) && FQ::is_zero(a.c1);
    }
    static inline T inv(const T &a) {
        B t = FQ::inv(FQ::add(FQ::sq(a.c0), FQ::sq(a.c1)));
        B zero;
        memset(zero.v, 0, sizeof(zero.v));
        return {FQ::mul(a.c0, t), FQ::sub(zero, FQ::mul(a.c1, t))};
    }
};

template <typename FF>
struct Point {
    typename FF::T X, Y, Z;
    bool inf;
};

template <typename FF>
static inline Point<FF> pt_double(const Point<FF> &p) {
    if (p.inf) return p;
    auto A = FF::sq(p.X);
    auto B = FF::sq(p.Y);
    auto C = FF::sq(B);
    auto t = FF::sq(FF::add(p.X, B));
    auto D = FF::dbl(FF::sub(FF::sub(t, A), C));
    auto E = FF::add(FF::add(A, A), A);
    auto Fv = FF::sq(E);
    Point<FF> r;
    r.X = FF::sub(Fv, FF::dbl(D));
    auto c8 = FF::dbl(FF::dbl(FF::dbl(C)));
    r.Y = FF::sub(FF::mul(E, FF::sub(D, r.X)), c8);
    r.Z = FF::dbl(FF::mul(p.Y, p.Z));
    r.inf = false;
    return r;
}

template <typename FF>
static inline Point<FF> pt_add(const Point<FF> &p, const Point<FF> &q) {
    if (p.inf) return q;
    if (q.inf) return p;
    auto Z1Z1 = FF::sq(p.Z);
    auto Z2Z2 = FF::sq(q.Z);
    auto U1 = FF::mul(p.X, Z2Z2);
    auto U2 = FF::mul(q.X, Z1Z1);
    auto S1 = FF::mul(FF::mul(p.Y, q.Z), Z2Z2);
    auto S2 = FF::mul(FF::mul(q.Y, p.Z), Z1Z1);
    auto H = FF::sub(U2, U1);
    auto Rv = FF::sub(S2, S1);
    if (FF::is_zero(H)) {
        if (FF::is_zero(Rv)) return pt_double<FF>(p);
        Point<FF> r;
        r.inf = true;
        return r;
    }
    auto I = FF::sq(FF::dbl(H));
    auto J = FF::mul(H, I);
    auto r2 = FF::dbl(Rv);
    auto V = FF::mul(U1, I);
    Point<FF> r;
    r.X = FF::sub(FF::sub(FF::sq(r2), J), FF::dbl(V));
    r.Y = FF::sub(FF::mul(r2, FF::sub(V, r.X)), FF::dbl(FF::mul(S1, J)));
    r.Z = FF::mul(FF::sub(FF::sub(FF::sq(FF::add(p.Z, q.Z)), Z1Z1), Z2Z2), H);
    r.inf = false;
    return r;
}

// Mixed addition: q affine (Z = 1), madd-2007-bl — 7M + 4S vs the 11M + 5S
// general add.  The fixed-base tables and MSM inputs are affine, so this
// carries most of the point-add volume.
template <typename FF>
struct AffPt {
    typename FF::T X, Y;
    bool inf;
};

template <typename FF>
static inline Point<FF> pt_madd(const Point<FF> &p, const AffPt<FF> &q) {
    if (q.inf) return p;
    if (p.inf) {
        Point<FF> r;
        r.X = q.X;
        r.Y = q.Y;
        r.Z = FF::one_mont();
        r.inf = false;
        return r;
    }
    auto Z1Z1 = FF::sq(p.Z);
    auto U2 = FF::mul(q.X, Z1Z1);
    auto S2 = FF::mul(FF::mul(q.Y, p.Z), Z1Z1);
    auto H = FF::sub(U2, p.X);
    auto Rv = FF::sub(S2, p.Y);
    if (FF::is_zero(H)) {
        if (FF::is_zero(Rv)) return pt_double<FF>(p);
        Point<FF> r;
        r.inf = true;
        return r;
    }
    auto HH = FF::sq(H);
    auto I = FF::dbl(FF::dbl(HH));
    auto J = FF::mul(H, I);
    auto r2 = FF::dbl(Rv);
    auto V = FF::mul(p.X, I);
    Point<FF> r;
    r.X = FF::sub(FF::sub(FF::sq(r2), J), FF::dbl(V));
    r.Y = FF::sub(FF::mul(r2, FF::sub(V, r.X)), FF::dbl(FF::mul(p.Y, J)));
    r.Z = FF::sub(FF::sub(FF::sq(FF::add(p.Z, H)), Z1Z1), HH);
    r.inf = false;
    return r;
}

// Batch-normalize Jacobian points to affine (one inversion, Montgomery
// trick); infinity entries stay flagged.
template <typename FF>
static void pt_batch_to_affine(const std::vector<Point<FF>> &pts,
                               std::vector<AffPt<FF>> &out) {
    size_t n = pts.size();
    out.resize(n);
    std::vector<typename FF::T> pref(n);
    auto acc = FF::one_mont();
    for (size_t i = 0; i < n; i++) {
        if (!pts[i].inf && !FF::is_zero(pts[i].Z)) acc = FF::mul(acc, pts[i].Z);
        pref[i] = acc;
    }
    auto inv = FF::inv(acc);
    for (size_t i = n; i-- > 0;) {
        if (pts[i].inf || FF::is_zero(pts[i].Z)) {
            out[i].inf = true;
            continue;
        }
        auto prev = i == 0 ? FF::one_mont() : pref[i - 1];
        auto zinv = FF::mul(inv, prev);
        inv = FF::mul(inv, pts[i].Z);
        auto zi2 = FF::sq(zinv);
        out[i].X = FF::mul(pts[i].X, zi2);
        out[i].Y = FF::mul(pts[i].Y, FF::mul(zi2, zinv));
        out[i].inf = false;
    }
}

// ---- field parameter tables ----

static const FieldParams<4> BN_FQ = {
    {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL, 0xb85045b68181585dULL,
     0x30644e72e131a029ULL},
    {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL, 0x47ab1eff0a417ff6ULL,
     0x06d89f71cab8351fULL},
    {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL, 0x666ea36f7879462cULL,
     0x0e0a77c19a07df2fULL},
    {0x3c208c16d87cfd45ULL, 0x97816a916871ca8dULL, 0xb85045b68181585dULL,
     0x30644e72e131a029ULL},
    0x87d20782e4866389ULL};

static const FieldParams<6> BLS_FQ = {
    {0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
     0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL},
    {0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL,
     0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL},
    {0x760900000002fffdULL, 0xebf4000bc40c0002ULL, 0x5f48985753c758baULL,
     0x77ce585370525745ULL, 0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL},
    {0xb9feffffffffaaa9ULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
     0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL},
    0x89f3fffcfffcfffdULL};

static const FieldParams<4> BN_FR = {
    {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL, 0xb85045b68181585dULL,
     0x30644e72e131a029ULL},
    {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL, 0x8c49833d53bb8085ULL,
     0x0216d0b17f4e44a5ULL},
    {0xac96341c4ffffffbULL, 0x36fc76959f60cd29ULL, 0x666ea36f7879462eULL,
     0x0e0a77c19a07df2fULL},
    {0x43e1f593efffffffULL, 0x2833e84879b97091ULL, 0xb85045b68181585dULL,
     0x30644e72e131a029ULL},
    0xc2e1f593efffffffULL};

static const FieldParams<4> BLS_FR = {
    {0xffffffff00000001ULL, 0x53bda402fffe5bfeULL, 0x3339d80809a1d805ULL,
     0x73eda753299d7d48ULL},
    {0xc999e990f3f29c6dULL, 0x2b6cedcb87925c23ULL, 0x05d314967254398fULL,
     0x0748d9d99f59ff11ULL},
    {0x00000001fffffffeULL, 0x5884b7fa00034802ULL, 0x998c4fefecbc4ff5ULL,
     0x1824b159acc5056fULL},
    {0xfffffffeffffffffULL, 0x53bda402fffe5bfeULL, 0x3339d80809a1d805ULL,
     0x73eda753299d7d48ULL},
    0xfffffffeffffffffULL};

// ---- AVX-512 IFMA vector G1 (4-limb base fields only) ---------------------
// 8 independent curve points per vector over the shared 5x52 Montgomery
// core (mont52_avx512.h).  Used by the BN254 G1 fixed-base batch: all 8
// lanes walk the same window schedule, each gathering its own affine
// table entry.  Rare per-lane exceptions (doubling, p = -q) are detected
// by mask and those lanes fall back to scalar arithmetic.
#ifdef HAVE_MONT52

static bool have_ifma_ec() {
    static const bool ok = __builtin_cpu_supports("avx512ifma")
        && __builtin_cpu_supports("avx512dq");
    return ok;
}

template <int L>
struct VPt {
    m52::Fv<L> X, Y, Z;
    __mmask8 inf;  // set bit = lane is infinity
};

// vector mixed add: q affine (lanes with q_inf skip); returns mask of
// lanes needing the scalar slow path (doubling / cancellation)
template <int L>
static inline __mmask8 v_madd(const m52::M52Params<L>& P, VPt<L>& p,
                              const m52::Fv<L>& qx, const m52::Fv<L>& qy,
                              __mmask8 q_inf, const m52::Fv<L>& mont_one) {
    using namespace m52;
    Fv<L> Z1Z1 = f_sq(P, p.Z);
    Fv<L> U2 = f_mul(P, qx, Z1Z1);
    Fv<L> S2 = f_mul(P, f_mul(P, qy, p.Z), Z1Z1);
    Fv<L> H = f_sub(P, U2, p.X);
    Fv<L> Rv = f_sub(P, S2, p.Y);
    __mmask8 h0 = f_is_zero_mod(P, H);
    __mmask8 active = (__mmask8)(~p.inf & ~q_inf);
    __mmask8 slow = (__mmask8)(h0 & active);  // double or annihilate
    Fv<L> HH = f_sq(P, H);
    Fv<L> I = f_dbl(P, f_dbl(P, HH));
    Fv<L> J = f_mul(P, H, I);
    Fv<L> r2 = f_dbl(P, Rv);
    Fv<L> V = f_mul(P, p.X, I);
    Fv<L> X3 = f_sub(P, f_sub(P, f_sq(P, r2), J), f_dbl(P, V));
    Fv<L> Y3 = f_sub(P, f_mul(P, r2, f_sub(P, V, X3)),
                     f_dbl(P, f_mul(P, p.Y, J)));
    Fv<L> Z3 = f_sub(P, f_sub(P, f_sq(P, f_add(P, p.Z, H)), Z1Z1), HH);
    // p.inf lanes: result = q (affine promoted, Z = R mod p i.e. mont(1))
    // q_inf lanes: result = p (unchanged)
    __mmask8 take_q = (__mmask8)(p.inf & ~q_inf);
    __mmask8 keep_p = q_inf;
    __mmask8 upd = (__mmask8)(active & ~slow);
    p.X = f_select(upd, p.X, X3);
    p.Y = f_select(upd, p.Y, Y3);
    p.Z = f_select(upd, p.Z, Z3);
    p.X = f_select(take_q, p.X, qx);
    p.Y = f_select(take_q, p.Y, qy);
    p.Z = f_select(take_q, p.Z, mont_one);
    p.inf = (__mmask8)(p.inf & q_inf);  // was-inf lanes that took q are live
    (void)keep_p;  // q_inf lanes already untouched by upd/take_q masks
    return slow;
}

#endif  // HAVE_MONT52

// Vector fixed-base batch over a 4-limb base field: 8 scalars per group,
// per-lane gathered affine table entries (mont52 domain), optimistic
// execution with whole-group scalar redo on the (vanishing-probability)
// doubling/cancellation mask.  Emits Jacobian coordinates in VALUE space;
// the caller batch-normalizes.
#ifdef HAVE_MONT52

// value -> value * 2^(52*L) mod p (scalar helper for table conversion)
template <int NL, const FieldParams<NL>* FP, int L>
static void to_mont52_value(const u64* in, u64* out) {
    u64 v[NL];
    memcpy(v, in, NL * 8);
    for (int d = 0; d < 52 * L; d++) {
        u64 carry = 0;
        for (int k = 0; k < NL; k++) {
            u64 nv = (v[k] << 1) | carry;
            carry = v[k] >> 63;
            v[k] = nv;
        }
        bool ge = carry != 0;
        if (!ge) {
            ge = true;
            for (int i = NL - 1; i >= 0; i--) {
                if (v[i] > FP->P[i]) break;
                if (v[i] < FP->P[i]) { ge = false; break; }
            }
        }
        if (ge) {
            u128 borrow = 0;
            for (int i = 0; i < NL; i++) {
                u128 dd = (u128)v[i] - FP->P[i] - (u64)borrow;
                v[i] = (u64)dd;
                borrow = (dd >> 64) ? 1 : 0;
            }
        }
    }
    m52::split52<NL, L>(v, out);
}

// vector Fq2 (u^2 = -1) over the Lx52 core — 8 extension elements/vector
template <int L>
struct F2v {
    m52::Fv<L> c0, c1;
};

template <int L>
static inline F2v<L> f2_add(const m52::M52Params<L>& P, const F2v<L>& a,
                            const F2v<L>& b) {
    return {m52::f_add(P, a.c0, b.c0), m52::f_add(P, a.c1, b.c1)};
}

template <int L>
static inline F2v<L> f2_sub(const m52::M52Params<L>& P, const F2v<L>& a,
                            const F2v<L>& b) {
    return {m52::f_sub(P, a.c0, b.c0), m52::f_sub(P, a.c1, b.c1)};
}

template <int L>
static inline F2v<L> f2_dbl(const m52::M52Params<L>& P, const F2v<L>& a) {
    return {m52::f_dbl(P, a.c0), m52::f_dbl(P, a.c1)};
}

template <int L>
static inline F2v<L> f2_mul(const m52::M52Params<L>& P, const F2v<L>& a,
                            const F2v<L>& b) {
    using namespace m52;
    Fv<L> t0 = f_mul(P, a.c0, b.c0);
    Fv<L> t1 = f_mul(P, a.c1, b.c1);
    Fv<L> s = f_mul(P, f_add(P, a.c0, a.c1), f_add(P, b.c0, b.c1));
    return {f_sub(P, t0, t1), f_sub(P, f_sub(P, s, t0), t1)};
}

template <int L>
static inline F2v<L> f2_sq(const m52::M52Params<L>& P, const F2v<L>& a) {
    return f2_mul(P, a, a);
}

template <int L>
static inline __mmask8 f2_is_zero_mod(const m52::M52Params<L>& P,
                                      const F2v<L>& a) {
    return (__mmask8)(m52::f_is_zero_mod(P, a.c0)
                      & m52::f_is_zero_mod(P, a.c1));
}

template <int L>
static inline F2v<L> f2_select(__mmask8 k, const F2v<L>& if0,
                               const F2v<L>& if1) {
    return {m52::f_select(k, if0.c0, if1.c0),
            m52::f_select(k, if0.c1, if1.c1)};
}

template <int L>
static inline F2v<L> f2_zero() {
    return {m52::f_zero<L>(), m52::f_zero<L>()};
}

template <int L>
struct VPt2 {
    F2v<L> X, Y, Z;
    __mmask8 inf;
};

template <int L>
static inline __mmask8 v2_madd(const m52::M52Params<L>& P, VPt2<L>& p,
                               const F2v<L>& qx, const F2v<L>& qy,
                               __mmask8 q_inf, const F2v<L>& mont_one) {
    F2v<L> Z1Z1 = f2_sq(P, p.Z);
    F2v<L> U2 = f2_mul(P, qx, Z1Z1);
    F2v<L> S2 = f2_mul(P, f2_mul(P, qy, p.Z), Z1Z1);
    F2v<L> H = f2_sub(P, U2, p.X);
    F2v<L> Rv = f2_sub(P, S2, p.Y);
    __mmask8 h0 = f2_is_zero_mod(P, H);
    __mmask8 active = (__mmask8)(~p.inf & ~q_inf);
    __mmask8 slow = (__mmask8)(h0 & active);
    F2v<L> HH = f2_sq(P, H);
    F2v<L> I = f2_dbl(P, f2_dbl(P, HH));
    F2v<L> J = f2_mul(P, H, I);
    F2v<L> r2 = f2_dbl(P, Rv);
    F2v<L> V = f2_mul(P, p.X, I);
    F2v<L> X3 = f2_sub(P, f2_sub(P, f2_sq(P, r2), J), f2_dbl(P, V));
    F2v<L> Y3 = f2_sub(P, f2_mul(P, r2, f2_sub(P, V, X3)),
                       f2_dbl(P, f2_mul(P, p.Y, J)));
    F2v<L> Z3 = f2_sub(P, f2_sub(P, f2_sq(P, f2_add(P, p.Z, H)), Z1Z1), HH);
    __mmask8 take_q = (__mmask8)(p.inf & ~q_inf);
    __mmask8 upd = (__mmask8)(active & ~slow);
    p.X = f2_select(upd, p.X, X3);
    p.Y = f2_select(upd, p.Y, Y3);
    p.Z = f2_select(upd, p.Z, Z3);
    p.X = f2_select(take_q, p.X, qx);
    p.Y = f2_select(take_q, p.Y, qy);
    p.Z = f2_select(take_q, p.Z, mont_one);
    p.inf = (__mmask8)(p.inf & q_inf);
    return slow;
}

#endif  // HAVE_MONT52

// ---- generic point IO + MSM / fixed-base ----

template <int NL, typename FQ>
static inline Point<FQ> g1_load(const u64 *xy) {
    Point<FQ> p;
    u64 acc = 0;
    for (int i = 0; i < 2 * NL; ++i) acc |= xy[i];
    p.inf = (acc == 0);
    if (p.inf) return p;
    typename FQ::T x, y;
    memcpy(x.v, xy, NL * 8);
    memcpy(y.v, xy + NL, NL * 8);
    p.X = FQ::to_mont(x);
    p.Y = FQ::to_mont(y);
    p.Z = FQ::one_mont();
    return p;
}

template <int NL, typename FQ>
static inline void g1_store(const Point<FQ> &p, u64 *xy) {
    if (p.inf || FQ::is_zero(p.Z)) {
        memset(xy, 0, 2 * NL * 8);
        return;
    }
    if (FQ::is_one_mont(p.Z)) {  // already affine: skip the inversion
        auto x = FQ::from_mont(p.X);
        auto y = FQ::from_mont(p.Y);
        memcpy(xy, x.v, NL * 8);
        memcpy(xy + NL, y.v, NL * 8);
        return;
    }
    auto zi = FQ::inv(p.Z);
    auto zi2 = FQ::sq(zi);
    auto x = FQ::from_mont(FQ::mul(p.X, zi2));
    auto y = FQ::from_mont(FQ::mul(p.Y, FQ::mul(zi2, zi)));
    memcpy(xy, x.v, NL * 8);
    memcpy(xy + NL, y.v, NL * 8);
}

template <int NL, typename FQ, typename F2Q>
static inline Point<F2Q> g2_load(const u64 *xy) {
    Point<F2Q> p;
    u64 acc = 0;
    for (int i = 0; i < 4 * NL; ++i) acc |= xy[i];
    p.inf = (acc == 0);
    if (p.inf) return p;
    typename FQ::T a, b, c, d;
    memcpy(a.v, xy, NL * 8);
    memcpy(b.v, xy + NL, NL * 8);
    memcpy(c.v, xy + 2 * NL, NL * 8);
    memcpy(d.v, xy + 3 * NL, NL * 8);
    p.X = {FQ::to_mont(a), FQ::to_mont(b)};
    p.Y = {FQ::to_mont(c), FQ::to_mont(d)};
    typename FQ::T zero;
    memset(zero.v, 0, NL * 8);
    p.Z = {FQ::one_mont(), zero};
    return p;
}

template <int NL, typename FQ, typename F2Q>
static inline void g2_store(const Point<F2Q> &p, u64 *xy) {
    if (!p.inf && !F2Q::is_zero(p.Z) && F2Q::is_one_mont(p.Z)) {
        auto xs0 = FQ::from_mont(p.X.c0), xs1 = FQ::from_mont(p.X.c1);
        auto ys0 = FQ::from_mont(p.Y.c0), ys1 = FQ::from_mont(p.Y.c1);
        memcpy(xy, xs0.v, NL * 8);
        memcpy(xy + NL, xs1.v, NL * 8);
        memcpy(xy + 2 * NL, ys0.v, NL * 8);
        memcpy(xy + 3 * NL, ys1.v, NL * 8);
        return;
    }
    if (p.inf || F2Q::is_zero(p.Z)) {
        memset(xy, 0, 4 * NL * 8);
        return;
    }
    auto zi = F2Q::inv(p.Z);
    auto zi2 = F2Q::sq(zi);
    auto x = F2Q::mul(p.X, zi2);
    auto y = F2Q::mul(p.Y, F2Q::mul(zi2, zi));
    auto xs0 = FQ::from_mont(x.c0), xs1 = FQ::from_mont(x.c1);
    auto ys0 = FQ::from_mont(y.c0), ys1 = FQ::from_mont(y.c1);
    memcpy(xy, xs0.v, NL * 8);
    memcpy(xy + NL, xs1.v, NL * 8);
    memcpy(xy + 2 * NL, ys0.v, NL * 8);
    memcpy(xy + 3 * NL, ys1.v, NL * 8);
}

// Pippenger with BATCH-AFFINE bucket accumulation.  Points are
// counting-sorted by bucket per window, then every bucket's run is
// pairwise tree-reduced: each level pairs up the remaining entries of
// ALL buckets at once (independent by construction — no conflict
// scheduling, linear work even when one bucket holds most points, as
// repeated 0/1 witness wires commonly do) and shares ONE Montgomery
// inversion, so an addition costs ~7 field muls.  Doubling /
// cancellation / infinity lanes are classified before the inversion.
template <typename FF>
static void msm_affine_impl(const std::vector<AffPt<FF>> &pts,
                            const u64 *scalars, size_t n, int sbits,
                            Point<FF> &out) {
    int window = 4;
    {
        size_t t = n;
        int lg = 0;
        while (t > 1) { t >>= 1; ++lg; }
        window = lg > 4 ? (lg - 2 > 16 ? 16 : lg - 2) : 4;
    }
    int n_windows = (sbits + window - 1) / window;
    std::vector<Point<FF>> partial(n_windows);
    size_t B = (size_t)1 << window;

    std::vector<uint32_t> counts(B), offs(B + 1);
    std::vector<uint32_t> bidx(n);
    std::vector<AffPt<FF>> cur(n);
    std::vector<typename FF::T> dens, pref, lambdas;
    std::vector<uint32_t> p_lo, p_hi, p_out;
    std::vector<int> kind;
    struct Run {
        uint32_t bucket, start, len;
    };
    std::vector<Run> runs;

    double t_sort = 0, t_cls = 0, t_inv = 0, t_apply = 0, t_buck = 0;
    for (int w = 0; w < n_windows; ++w) {
        double t0 = msm_prof() ? msm_now() : 0;
        int shift = w * window;
        int limb = shift / 64;
        int off = shift % 64;
        std::fill(counts.begin(), counts.end(), 0u);
        for (size_t i = 0; i < n; ++i) {
            u64 idx = 0;
            if (!pts[i].inf) {
                const u64 *s = scalars + 4 * i;
                idx = s[limb] >> off;
                if (off + window > 64 && limb + 1 < 4)
                    idx |= s[limb + 1] << (64 - off);
                idx &= (((u64)1 << window) - 1);
            }
            bidx[i] = (uint32_t)idx;
            if (idx) counts[idx]++;
        }
        offs[0] = 0;
        for (size_t b = 0; b < B; ++b) offs[b + 1] = offs[b] + counts[b];
        size_t live = offs[B];
        {
            std::vector<uint32_t> cursor(offs.begin(), offs.end() - 1);
            for (size_t i = 0; i < n; ++i)
                if (bidx[i]) cur[cursor[bidx[i]]++] = pts[i];
        }
        runs.clear();
        for (size_t b = 1; b < B; ++b)
            if (counts[b])
                runs.push_back({(uint32_t)b, offs[b], counts[b]});
        if (msm_prof()) { t_sort += msm_now() - t0; t0 = msm_now(); }

        // pairwise tree reduction: one shared inversion per level
        bool again = true;
        while (again) {
            again = false;
            p_lo.clear();
            p_hi.clear();
            p_out.clear();
            // odd leftovers move AFTER the apply pass: the destination
            // slot start+pairs is still a live pair input this level
            static thread_local std::vector<std::pair<uint32_t, uint32_t>>
                odd_moves;
            odd_moves.clear();
            for (auto &r : runs) {
                if (r.len <= 1) continue;
                uint32_t pairs = r.len / 2;
                for (uint32_t k = 0; k < pairs; ++k) {
                    p_lo.push_back(r.start + 2 * k);
                    p_hi.push_back(r.start + 2 * k + 1);
                    p_out.push_back(r.start + k);
                }
                if (r.len & 1)
                    odd_moves.emplace_back(r.start + r.len - 1,
                                           r.start + pairs);
                r.len = pairs + (r.len & 1);
                if (r.len > 1) again = true;
            }
            size_t np = p_lo.size();
            if (np == 0) break;
            if (msm_prof()) { t_cls += msm_now() - t0; t0 = msm_now(); }
            dens.resize(np);
            pref.resize(np);
            lambdas.resize(np);
            kind.resize(np);
            size_t nd = 0;
            for (size_t k = 0; k < np; ++k) {
                const AffPt<FF> &a = cur[p_lo[k]];
                const AffPt<FF> &b2 = cur[p_hi[k]];
                if (a.inf || b2.inf) {
                    kind[k] = a.inf ? 2 : 3;  // take b / take a
                    continue;
                }
                auto dx = FF::sub(b2.X, a.X);
                if (FF::is_zero(dx)) {
                    if (FF::is_zero(FF::sub(b2.Y, a.Y))) {
                        kind[k] = 1;
                        dens[nd++] = FF::dbl(a.Y);
                    } else {
                        kind[k] = 4;  // opposite points: infinity
                    }
                } else {
                    kind[k] = 0;
                    dens[nd++] = dx;
                }
            }
            if (nd) {
                auto run2 = FF::one_mont();
                for (size_t k = 0; k < nd; ++k) {
                    run2 = FF::mul(run2, dens[k]);
                    pref[k] = run2;
                }
                auto inv = FF::inv(run2);
                for (size_t k = nd; k-- > 1;) {
                    lambdas[k] = FF::mul(inv, pref[k - 1]);
                    inv = FF::mul(inv, dens[k]);
                }
                lambdas[0] = inv;
            }
            if (msm_prof()) { t_inv += msm_now() - t0; t0 = msm_now(); }
            size_t di = 0;
            for (size_t k = 0; k < np; ++k) {
                const AffPt<FF> a = cur[p_lo[k]];
                const AffPt<FF> b2 = cur[p_hi[k]];
                AffPt<FF> &o = cur[p_out[k]];
                if (kind[k] == 2) {
                    o = b2;
                    continue;
                }
                if (kind[k] == 3) {
                    o = a;
                    continue;
                }
                if (kind[k] == 4) {
                    o.inf = true;
                    continue;
                }
                typename FF::T lam;
                if (kind[k] == 1) {
                    auto x2 = FF::sq(a.X);
                    lam = FF::mul(FF::add(FF::add(x2, x2), x2),
                                  lambdas[di++]);
                } else {
                    lam = FF::mul(FF::sub(b2.Y, a.Y), lambdas[di++]);
                }
                auto x3 = FF::sub(FF::sub(FF::sq(lam), a.X), b2.X);
                auto y3 = FF::sub(FF::mul(lam, FF::sub(a.X, x3)), a.Y);
                o.X = x3;
                o.Y = y3;
                o.inf = false;
            }
            for (auto &m : odd_moves) cur[m.second] = cur[m.first];
            if (msm_prof()) { t_apply += msm_now() - t0; t0 = msm_now(); }
        }
        (void)live;
        if (msm_prof()) t0 = msm_now();

        // bucket reduction (Jacobian): buckets descending
        Point<FF> running, tot;
        running.inf = true;
        tot.inf = true;
        size_t ri = runs.size();
        for (size_t b = B - 1; b >= 1; --b) {
            while (ri > 0 && runs[ri - 1].bucket > b) --ri;
            if (ri > 0 && runs[ri - 1].bucket == b) {
                const AffPt<FF> &a = cur[runs[ri - 1].start];
                if (!a.inf) running = pt_madd(running, a);
                --ri;
            }
            tot = pt_add(tot, running);
        }
        partial[w] = tot;
        if (msm_prof()) t_buck += msm_now() - t0;
    }
    if (msm_prof())
        fprintf(stderr,
                "[msm] n=%zu w=%d sort=%.3f cls=%.3f inv=%.3f apply=%.3f "
                "buck=%.3f\n",
                n, window, t_sort, t_cls, t_inv, t_apply, t_buck);
    Point<FF> result;
    result.inf = true;
    for (int w = n_windows - 1; w >= 0; --w) {
        if (w != n_windows - 1)
            for (int i = 0; i < window; ++i) result = pt_double(result);
        result = pt_add(result, partial[w]);
    }
    out = result;
}

// ---- IFMA-vectorized batch-affine MSM tree --------------------------------
// Same algorithm as msm_affine_impl, with the three mul-heavy phases
// (inversion prefix chain, apply pass, classify) running 8 pairs per
// AVX-512 IFMA vector over the 5x52 Montgomery core.  Points live in an
// SoA limb pool in the m52 Montgomery domain (a * 2^(52L)); the counting
// sort moves u32 indices instead of 72-byte structs.  Measured on BN254
// G1 at 2^20: inv 3.1 s -> ~0.3 s, apply 3.1 s -> ~0.6 s (one core).
#ifdef HAVE_MONT52

template <int L>
static inline m52::Fv<L> gath52(const u64* base, __m512i vidx) {
    m52::Fv<L> r;
    for (int l = 0; l < L; ++l)
        r.l[l] = _mm512_i64gather_epi64(
            _mm512_add_epi64(vidx, _mm512_set1_epi64(l)),
            (const long long*)base, 8);
    return r;
}

template <int L>
static inline void scat52(const m52::Fv<L>& v, u64* base, __m512i vidx) {
    for (int l = 0; l < L; ++l)
        _mm512_i64scatter_epi64((long long*)base,
            _mm512_add_epi64(vidx, _mm512_set1_epi64(l)), v.l[l], 8);
}

static inline __m512i vidx_mul(const uint32_t* idx8, long long words) {
    __m512i v = _mm512_cvtepu32_epi64(
        _mm256_loadu_si256((const __m256i*)idx8));
    return _mm512_mullo_epi64(v, _mm512_set1_epi64(words));
}

// {(base+0)w, (base+1)w, ..., (base+7)w}
static inline __m512i vidx_iota(size_t base, long long w) {
    const __m512i io = _mm512_setr_epi64(0, 1, 2, 3, 4, 5, 6, 7);
    return _mm512_mullo_epi64(
        _mm512_add_epi64(io, _mm512_set1_epi64((long long)base)),
        _mm512_set1_epi64(w));
}

// {0, q w, 2q w, ..., 7q w}  (chunked-chain lane bases)
static inline __m512i vidx_lane(size_t q, long long w) {
    const __m512i io = _mm512_setr_epi64(0, 1, 2, 3, 4, 5, 6, 7);
    return _mm512_mullo_epi64(io,
                              _mm512_set1_epi64((long long)q * w));
}

// Tree policy: base-field curve (G1).  Coordinates are single Fv lanes.
template <int NL, const FieldParams<NL>* FP, int L>
struct TreePolG1 {
    typedef F<NL, FP> FS;               // scalar curve field
    typedef F<NL, FP> FQ;               // base field (== FS here)
    typedef typename FS::T ST;          // scalar coordinate
    typedef m52::Fv<L> V;               // 8-lane coordinate
    static const int DEG = 1;           // Fq components per coordinate
    static const int LW = L;
    static const int NLW = NL;
    static const int CW = 2 * L;        // pool words per point (X | Y)
    static constexpr const FieldParams<NL>* FPP = FP;

    static inline V mul_c(const m52::M52Params<L>& P, const V& a,
                          const u64* c52) {
        return m52::f_mul_const(P, a, c52);
    }

    static inline V load(const u64* pool, __m512i vidx, int off) {
        return gath52<L>(pool, _mm512_add_epi64(vidx,
                                                _mm512_set1_epi64(off)));
    }
    static inline void store(const V& v, u64* pool, __m512i vidx, int off) {
        scat52<L>(v, pool, _mm512_add_epi64(vidx, _mm512_set1_epi64(off)));
    }
    static inline V mul(const m52::M52Params<L>& P, const V& a, const V& b) {
        return m52::f_mul(P, a, b);
    }
    static inline V sq(const m52::M52Params<L>& P, const V& a) {
        return m52::f_sq(P, a);
    }
    static inline V add(const m52::M52Params<L>& P, const V& a, const V& b) {
        return m52::f_add(P, a, b);
    }
    static inline V sub(const m52::M52Params<L>& P, const V& a, const V& b) {
        return m52::f_sub(P, a, b);
    }
    static inline V dbl(const m52::M52Params<L>& P, const V& a) {
        return m52::f_dbl(P, a);
    }
    static inline __mmask8 is_zero(const m52::M52Params<L>& P, const V& a) {
        return m52::f_is_zero_mod(P, a);
    }
    static inline V sel(__mmask8 k, const V& if0, const V& if1) {
        return m52::f_select(k, if0, if1);
    }
    static inline V bcast(const u64* limbs52) {
        V r;
        for (int l = 0; l < L; ++l)
            r.l[l] = _mm512_set1_epi64((long long)limbs52[l]);
        return r;
    }
    // 8 lanes -> canonical scalar mont limbs (value a*2^256 given lanes
    // hold a*2^(260) pre-multiplied by inv16 upstream — see callers)
    static inline void lanes_out(const m52::M52Params<L>& P, const V& v,
                                 ST* out8) {
        u64 buf[8 * NL];
        m52::store_4x64<NL, L>(P, v, buf, NL);
        for (int k = 0; k < 8; ++k)
            memcpy(out8[k].v, buf + k * NL, NL * 8);
    }
    static inline V lanes_in(const u64* vals, size_t stride) {
        return m52::load_raw<NL, L>(vals, stride);
    }
    static inline ST s_inv(const ST& a) { return FS::inv(a); }
    static inline ST s_mul(const ST& a, const ST& b) { return FS::mul(a, b); }
    static inline ST s_one() { return FS::one_mont(); }
    static inline void s_to_buf(const ST& a, u64* dst) {
        memcpy(dst, a.v, NL * 8);
    }
};

// Tree policy: quadratic-extension curve (G2, u^2 = -1).
template <int NL, const FieldParams<NL>* FP, int L>
struct TreePolG2 {
    typedef F<NL, FP> FQ;
    typedef F2<FQ> FS;
    typedef typename FS::T ST;
    typedef F2v<L> V;
    static const int DEG = 2;
    static const int LW = L;
    static const int NLW = NL;
    static const int CW = 4 * L;        // X.c0 | X.c1 | Y.c0 | Y.c1
    static constexpr const FieldParams<NL>* FPP = FP;

    static inline V mul_c(const m52::M52Params<L>& P, const V& a,
                          const u64* c52) {
        return {m52::f_mul_const(P, a.c0, c52),
                m52::f_mul_const(P, a.c1, c52)};
    }

    static inline V load(const u64* pool, __m512i vidx, int off) {
        return {gath52<L>(pool, _mm512_add_epi64(
                                    vidx, _mm512_set1_epi64(off))),
                gath52<L>(pool, _mm512_add_epi64(
                                    vidx, _mm512_set1_epi64(off + L)))};
    }
    static inline void store(const V& v, u64* pool, __m512i vidx, int off) {
        scat52<L>(v.c0, pool, _mm512_add_epi64(vidx,
                                               _mm512_set1_epi64(off)));
        scat52<L>(v.c1, pool, _mm512_add_epi64(vidx,
                                               _mm512_set1_epi64(off + L)));
    }
    static inline V mul(const m52::M52Params<L>& P, const V& a, const V& b) {
        return f2_mul(P, a, b);
    }
    static inline V sq(const m52::M52Params<L>& P, const V& a) {
        return f2_sq(P, a);
    }
    static inline V add(const m52::M52Params<L>& P, const V& a, const V& b) {
        return f2_add(P, a, b);
    }
    static inline V sub(const m52::M52Params<L>& P, const V& a, const V& b) {
        return f2_sub(P, a, b);
    }
    static inline V dbl(const m52::M52Params<L>& P, const V& a) {
        return f2_dbl(P, a);
    }
    static inline __mmask8 is_zero(const m52::M52Params<L>& P, const V& a) {
        return f2_is_zero_mod(P, a);
    }
    static inline V sel(__mmask8 k, const V& if0, const V& if1) {
        return f2_select(k, if0, if1);
    }
    static inline V bcast(const u64* limbs52) {  // c0 = const, c1 = 0
        V r;
        for (int l = 0; l < L; ++l) {
            r.c0.l[l] = _mm512_set1_epi64((long long)limbs52[l]);
            r.c1.l[l] = _mm512_setzero_si512();
        }
        return r;
    }
    static inline void lanes_out(const m52::M52Params<L>& P, const V& v,
                                 ST* out8) {
        u64 b0[8 * NL], b1[8 * NL];
        m52::store_4x64<NL, L>(P, v.c0, b0, NL);
        m52::store_4x64<NL, L>(P, v.c1, b1, NL);
        for (int k = 0; k < 8; ++k) {
            memcpy(out8[k].c0.v, b0 + k * NL, NL * 8);
            memcpy(out8[k].c1.v, b1 + k * NL, NL * 8);
        }
    }
    static inline V lanes_in(const u64* vals, size_t stride) {
        // vals rows: [c0 limbs | c1 limbs] per lane
        return {m52::load_raw<NL, L>(vals, stride),
                m52::load_raw<NL, L>(vals + NL, stride)};
    }
    static inline ST s_inv(const ST& a) { return FS::inv(a); }
    static inline ST s_mul(const ST& a, const ST& b) { return FS::mul(a, b); }
    static inline ST s_one() { return FS::one_mont(); }
    static inline void s_to_buf(const ST& a, u64* dst) {
        memcpy(dst, a.c0.v, NL * 8);
        memcpy(dst + NL, a.c1.v, NL * 8);
    }
};

// Vectorized MSM: POL is one of the tree policies above; FF is the curve's
// (possibly extension) field, with AffPt<FF> matching POL::ST coordinates.
//
// Domain bookkeeping: pool values are m52-Montgomery (a * R52, R52 =
// 2^(52L)); inputs arrive FF-Montgomery (a * R64, R64 = 2^(64 NL)), so
// ingest multiplies by c_shift = 2^(52L - 64NL) in m52-mont form, and
// head extraction multiplies by its inverse before storing canonical
// FF-mont limbs.  The batch-inversion bridge exploits that a canonical
// dump of m52-mont IS the FF-mont encoding of a * 2^(52L - 64NL).
template <typename POL, typename FF>
static void msm_affine_ifma(const std::vector<AffPt<FF>>& pts,
                            const u64* scalars, size_t n, int sbits,
                            Point<FF>& out) {
    using namespace m52;
    typedef typename POL::V V;
    typedef typename POL::ST ST;
    typedef typename POL::FQ FQ;
    const int L = POL::LW, NL = POL::NLW;
    const int DEG = POL::DEG, CW = POL::CW;
    const int EW = DEG * L;             // chain-entry u64 words
    const int SHIFT_BITS = 52 * L - 64 * NL;
    M52Params<L> P;
    m52_init<POL::NLW, L>(P, POL::FPP->P);

    // constants (base-field, value -> m52-mont via to_mont52_value)
    u64 one52[L], cshift[L], c256[L], cinvs[L];
    {
        u64 v[NL];
        memset(v, 0, sizeof(v));
        v[0] = 1;
        to_mont52_value<POL::NLW, POL::FPP, POL::LW>(v, one52);
        v[0] = (u64)1 << SHIFT_BITS;
        to_mont52_value<POL::NLW, POL::FPP, POL::LW>(v, cshift);
        // 2^(2*SHIFT_BITS) = R52^2 / R_ff^2: re-enters the m52-mont
        // domain after the scalar FF-mont batch-inversion round-trip.
        // (A literal 256 here is the BN254 special case SHIFT_BITS=4 —
        // it silently corrupted every BLS12-381 IFMA MSM, SHIFT_BITS=32.)
        v[0] = 0;
        v[(2 * SHIFT_BITS) / 64] = (u64)1 << ((2 * SHIFT_BITS) % 64);
        to_mont52_value<POL::NLW, POL::FPP, POL::LW>(v, c256);
        v[(2 * SHIFT_BITS) / 64] = 0;
        // inverse of the shift constant, canonical value
        typename FQ::T sh;
        memset(sh.v, 0, sizeof(sh.v));
        sh.v[0] = (u64)1 << SHIFT_BITS;
        auto invsh = FQ::from_mont(FQ::inv(FQ::to_mont(sh)));
        to_mont52_value<POL::NLW, POL::FPP, POL::LW>(invsh.v, cinvs);
    }
    const V vone = POL::bcast(one52);

    // window choice: with the 8-lane tree, per-point work is cheap and the
    // scalar Jacobian bucket reduction (2 * 2^w adds/window) is the brake —
    // measured cost ratios (bucket-add : per-point tree work) are ~5.5 for
    // base-field curves and ~9 for quadratic extensions, which pushes the
    // optimum 1-3 bits below the classic lg(n)-2 rule
    int window = 4;
    {
        double best = 1e30;
        const double ratio = POL::DEG == 1 ? 5.5 : 9.0;
        for (int wc = 4; wc <= 16; ++wc) {
            int nwc = (sbits + wc - 1) / wc;
            double cost = (double)nwc
                * ((double)n + ratio * (double)((size_t)1 << wc));
            if (cost < best) {
                best = cost;
                window = wc;
            }
        }
    }

    // ---- ingest: FF-mont AffPt array -> m52 SoA pool (+8 scratch slots)
    std::vector<u64> pts52((n + 8) * CW, 0);
    std::vector<uint8_t> pinf(n + 8, 1);
    {
        const size_t strideW = sizeof(AffPt<FF>) / 8;
        AffPt<FF> tail[8];
        for (size_t g = 0; g < n; g += 8) {
            const u64* base;
            if (g + 8 <= n) {
                base = (const u64*)&pts[g];
            } else {
                for (size_t k = 0; k < 8; ++k)
                    tail[k] = pts[g + k < n ? g + k : n - 1];
                base = (const u64*)&tail[0];
            }
            __m512i vdst = vidx_iota(g, CW);
            for (int c = 0; c < 2 * DEG; ++c) {
                Fv<L> raw = load_raw<POL::NLW, POL::LW>(base + c * NL,
                                                        strideW);
                Fv<L> m = f_mul_const(P, raw, cshift);
                scat52<L>(m, pts52.data(),
                          _mm512_add_epi64(vdst,
                                           _mm512_set1_epi64(c * L)));
            }
        }
        for (size_t i = 0; i < n; ++i) pinf[i] = pts[i].inf ? 1 : 0;
    }

    int n_windows = (sbits + window - 1) / window;
    std::vector<Point<FF>> partial(n_windows);
    size_t B = (size_t)1 << window;

    std::vector<uint32_t> counts(B), offs(B + 1), bidx(n);
    std::vector<u64> cur52((n + 8) * CW, 0);
    std::vector<uint8_t> cinf(n + 8, 1);
    const uint32_t scratch = (uint32_t)n;  // pad slot
    size_t maxp = n / 2 + 16;
    std::vector<u64> den52(maxp * EW), num52(maxp * EW), pref52(maxp * EW),
        lam52(maxp * EW);
    std::vector<uint32_t> p_lo, p_hi, p_out;
    std::vector<uint8_t> kind(maxp);
    std::vector<AffPt<FF>> heads;
    struct Run {
        uint32_t bucket, start, len;
    };
    std::vector<Run> runs;

    double t_sort = 0, t_cls = 0, t_inv = 0, t_apply = 0, t_buck = 0;
    for (int w = 0; w < n_windows; ++w) {
        double t0 = msm_prof() ? msm_now() : 0;
        int shift = w * window;
        int limb = shift / 64;
        int off = shift % 64;
        std::fill(counts.begin(), counts.end(), 0u);
        for (size_t i = 0; i < n; ++i) {
            u64 idx = 0;
            if (!pinf[i]) {
                const u64* s = scalars + 4 * i;
                idx = s[limb] >> off;
                if (off + window > 64 && limb + 1 < 4)
                    idx |= s[limb + 1] << (64 - off);
                idx &= (((u64)1 << window) - 1);
            }
            bidx[i] = (uint32_t)idx;
            if (idx) counts[idx]++;
        }
        offs[0] = 0;
        for (size_t b = 0; b < B; ++b) offs[b + 1] = offs[b] + counts[b];
        size_t live = offs[B];
        {
            std::vector<uint32_t> cursor(offs.begin(), offs.end() - 1);
            for (size_t i = 0; i < n; ++i)
                if (bidx[i]) {
                    uint32_t slot = cursor[bidx[i]]++;
                    memcpy(&cur52[(size_t)slot * CW], &pts52[i * CW],
                           CW * 8);
                    cinf[slot] = 0;
                }
        }
        runs.clear();
        for (size_t b = 1; b < B; ++b)
            if (counts[b])
                runs.push_back({(uint32_t)b, offs[b], counts[b]});
        if (msm_prof()) { t_sort += msm_now() - t0; t0 = msm_now(); }

        // pairwise tree reduction, 8 pairs per vector
        bool again = true;
        while (again) {
            again = false;
            p_lo.clear();
            p_hi.clear();
            p_out.clear();
            static thread_local std::vector<std::pair<uint32_t, uint32_t>>
                odd_moves;
            odd_moves.clear();
            for (auto& r : runs) {
                if (r.len <= 1) continue;
                uint32_t pairs = r.len / 2;
                for (uint32_t k = 0; k < pairs; ++k) {
                    p_lo.push_back(r.start + 2 * k);
                    p_hi.push_back(r.start + 2 * k + 1);
                    p_out.push_back(r.start + k);
                }
                if (r.len & 1)
                    odd_moves.emplace_back(r.start + r.len - 1,
                                           r.start + pairs);
                r.len = pairs + (r.len & 1);
                if (r.len > 1) again = true;
            }
            size_t np = p_lo.size();
            if (np == 0) break;
            size_t q = (np + 7) / 8;
            size_t np8 = 8 * q;
            while (p_lo.size() < np8) {
                p_lo.push_back(scratch);
                p_hi.push_back(scratch);
                p_out.push_back(scratch);
            }

            // classify: dens/nums per pair, kind bytes
            for (size_t k = 0; k < np8; k += 8) {
                __m512i vlo = vidx_mul(&p_lo[k], CW);
                __m512i vhi = vidx_mul(&p_hi[k], CW);
                V x1 = POL::load(cur52.data(), vlo, 0);
                V y1 = POL::load(cur52.data(), vlo, DEG * L);
                V x2 = POL::load(cur52.data(), vhi, 0);
                V y2 = POL::load(cur52.data(), vhi, DEG * L);
                __mmask8 inf1 = 0, inf2 = 0;
                for (int j = 0; j < 8; ++j) {
                    inf1 |= (__mmask8)((cinf[p_lo[k + j]] & 1) << j);
                    inf2 |= (__mmask8)((cinf[p_hi[k + j]] & 1) << j);
                }
                V dx = POL::sub(P, x2, x1);
                V dy = POL::sub(P, y2, y1);
                __mmask8 zdx = POL::is_zero(P, dx);
                __mmask8 zdy = POL::is_zero(P, dy);
                __mmask8 zy1 = POL::is_zero(P, y1);
                __mmask8 active = (__mmask8)(~(inf1 | inf2));
                __mmask8 dblm = (__mmask8)(zdx & zdy & active & ~zy1);
                __mmask8 genm = (__mmask8)(active & ~zdx);
                __mmask8 annm = (__mmask8)((zdx & active) & ~dblm);
                V den = POL::sel(genm, vone, dx);
                den = POL::sel(dblm, den, POL::dbl(P, y1));
                V x1sq = POL::sq(P, x1);
                V num = POL::sel(dblm, dy,
                                 POL::add(P, POL::dbl(P, x1sq), x1sq));
                __m512i vden = vidx_iota(k, EW);
                POL::store(den, den52.data(), vden, 0);
                POL::store(num, num52.data(), vden, 0);
                for (int j = 0; j < 8; ++j) {
                    uint8_t kd;
                    __mmask8 bit = (__mmask8)(1 << j);
                    if (inf1 & bit)
                        kd = (inf2 & bit) ? 4 : 2;
                    else if (inf2 & bit)
                        kd = 3;
                    else if (annm & bit)
                        kd = 4;
                    else if (dblm & bit)
                        kd = 1;
                    else
                        kd = 0;
                    kind[k + j] = kd;
                }
            }
            if (msm_prof()) { t_cls += msm_now() - t0; t0 = msm_now(); }

            // 8-lane prefix-product chain + one scalar batch inversion
            V acc = vone;
            const __m512i lanebase = vidx_lane(q, EW);
            for (size_t t = 0; t < q; ++t) {
                __m512i vt = _mm512_add_epi64(
                    lanebase, _mm512_set1_epi64((long long)(t * EW)));
                V d = POL::load(den52.data(), vt, 0);
                acc = POL::mul(P, acc, d);
                POL::store(acc, pref52.data(), vt, 0);
            }
            ST tot[8], inv8[8];
            POL::lanes_out(P, acc, tot);
            {
                // batch invert 8 values with one FS inversion
                ST pp[8];
                pp[0] = tot[0];
                for (int j = 1; j < 8; ++j)
                    pp[j] = POL::s_mul(pp[j - 1], tot[j]);
                ST iv = POL::s_inv(pp[7]);
                for (int j = 7; j >= 1; --j) {
                    inv8[j] = POL::s_mul(iv, pp[j - 1]);
                    iv = POL::s_mul(iv, tot[j]);
                }
                inv8[0] = iv;
            }
            {
                u64 buf[8 * 2 * POL::NLW];
                for (int j = 0; j < 8; ++j)
                    POL::s_to_buf(inv8[j], buf + j * DEG * NL);
                V iv = POL::lanes_in(buf, DEG * NL);
                acc = POL::mul_c(P, iv, c256);
            }
            // backward pass: per-entry lambda inverses
            for (size_t t = q; t-- > 0;) {
                __m512i vt = _mm512_add_epi64(
                    lanebase, _mm512_set1_epi64((long long)(t * EW)));
                V prev = t ? POL::load(
                                 pref52.data(),
                                 _mm512_add_epi64(
                                     lanebase,
                                     _mm512_set1_epi64(
                                         (long long)((t - 1) * EW))),
                                 0)
                           : vone;
                V lam = POL::mul(P, acc, prev);
                POL::store(lam, lam52.data(), vt, 0);
                V d = POL::load(den52.data(), vt, 0);
                acc = POL::mul(P, acc, d);
            }
            if (msm_prof()) { t_inv += msm_now() - t0; t0 = msm_now(); }

            // apply pass
            for (size_t k = 0; k < np8; k += 8) {
                __m512i vlo = vidx_mul(&p_lo[k], CW);
                __m512i vhi = vidx_mul(&p_hi[k], CW);
                __m512i vout = vidx_mul(&p_out[k], CW);
                V x1 = POL::load(cur52.data(), vlo, 0);
                V y1 = POL::load(cur52.data(), vlo, DEG * L);
                V x2 = POL::load(cur52.data(), vhi, 0);
                V y2 = POL::load(cur52.data(), vhi, DEG * L);
                __m512i ve = vidx_iota(k, EW);
                V num = POL::load(num52.data(), ve, 0);
                V li = POL::load(lam52.data(), ve, 0);
                V lam = POL::mul(P, num, li);
                V x3 = POL::sub(P, POL::sub(P, POL::sq(P, lam), x1), x2);
                V y3 = POL::sub(P, POL::mul(P, lam, POL::sub(P, x1, x3)),
                                y1);
                __mmask8 takeb = 0, takea = 0, toinf = 0;
                for (int j = 0; j < 8; ++j) {
                    uint8_t kd = kind[k + j];
                    if (kd == 2) takeb |= (__mmask8)(1 << j);
                    else if (kd == 3) takea |= (__mmask8)(1 << j);
                    else if (kd == 4) toinf |= (__mmask8)(1 << j);
                }
                x3 = POL::sel(takeb, x3, x2);
                y3 = POL::sel(takeb, y3, y2);
                x3 = POL::sel(takea, x3, x1);
                y3 = POL::sel(takea, y3, y1);
                POL::store(x3, cur52.data(), vout, 0);
                POL::store(y3, cur52.data(), vout, DEG * L);
                for (int j = 0; j < 8; ++j) {
                    uint8_t kd = kind[k + j];
                    uint8_t fl = kd == 4
                        ? 1
                        : (kd == 2 ? cinf[p_hi[k + j]]
                                   : (kd == 3 ? cinf[p_lo[k + j]] : 0));
                    cinf[p_out[k + j]] = fl;
                }
            }
            for (auto& m : odd_moves) {
                memcpy(&cur52[(size_t)m.second * CW],
                       &cur52[(size_t)m.first * CW], CW * 8);
                cinf[m.second] = cinf[m.first];
            }
            cinf[scratch] = 1;
            if (msm_prof()) { t_apply += msm_now() - t0; t0 = msm_now(); }
        }
        (void)live;
        if (msm_prof()) t0 = msm_now();

        // extract bucket heads back to FF-mont affine
        size_t nr = runs.size();
        heads.assign(nr, AffPt<FF>());
        {
            uint32_t hidx[8];
            ST xs[8], ys[8];
            for (size_t g = 0; g < nr; g += 8) {
                for (size_t j = 0; j < 8; ++j)
                    hidx[j] = g + j < nr ? runs[g + j].start : scratch;
                __m512i vh = vidx_mul(hidx, CW);
                V hx = POL::mul_c(P, POL::load(cur52.data(), vh, 0), cinvs);
                V hy = POL::mul_c(P, POL::load(cur52.data(), vh, DEG * L),
                                  cinvs);
                POL::lanes_out(P, hx, xs);
                POL::lanes_out(P, hy, ys);
                for (size_t j = 0; j < 8 && g + j < nr; ++j) {
                    heads[g + j].X = xs[j];
                    heads[g + j].Y = ys[j];
                    heads[g + j].inf = cinf[runs[g + j].start] != 0;
                }
            }
        }

        // bucket reduction (Jacobian): buckets descending
        Point<FF> running, tot;
        running.inf = true;
        tot.inf = true;
        size_t ri = nr;
        for (size_t b = B - 1; b >= 1; --b) {
            while (ri > 0 && runs[ri - 1].bucket > b) --ri;
            if (ri > 0 && runs[ri - 1].bucket == b) {
                const AffPt<FF>& a = heads[ri - 1];
                if (!a.inf) running = pt_madd(running, a);
                --ri;
            }
            tot = pt_add(tot, running);
        }
        partial[w] = tot;
        if (msm_prof()) t_buck += msm_now() - t0;
    }
    if (msm_prof())
        fprintf(stderr,
                "[msm-ifma] n=%zu w=%d sort=%.3f cls=%.3f inv=%.3f "
                "apply=%.3f buck=%.3f\n",
                n, window, t_sort, t_cls, t_inv, t_apply, t_buck);
    Point<FF> result;
    result.inf = true;
    for (int w = n_windows - 1; w >= 0; --w) {
        if (w != n_windows - 1)
            for (int i = 0; i < window; ++i) result = pt_double(result);
        result = pt_add(result, partial[w]);
    }
    out = result;
}

#endif  // HAVE_MONT52

template <typename FF>
static void msm_impl(const std::vector<Point<FF>> &pts, const u64 *scalars,
                     size_t n, int sbits, Point<FF> &out) {
    typedef Point<FF> PT;
    // inputs are affine (Z = 1 from the loaders): bucket adds use the
    // cheaper mixed addition
    std::vector<AffPt<FF>> apts(n);
    for (size_t i = 0; i < n; ++i) {
        apts[i].inf = pts[i].inf;
        apts[i].X = pts[i].X;
        apts[i].Y = pts[i].Y;
    }
    int window = 4;
    {
        size_t t = n;
        int lg = 0;
        while (t > 1) { t >>= 1; ++lg; }
        window = lg > 4 ? (lg - 2 > 16 ? 16 : lg - 2) : 4;
    }
    int n_windows = (sbits + window - 1) / window;
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
            if (idx) buckets[idx] = pt_madd(buckets[idx], apts[i]);
        }
        PT running, acc;
        running.inf = true;
        acc.inf = true;
        for (size_t b = buckets.size() - 1; b >= 1; --b) {
            running = pt_add(running, buckets[b]);
            acc = pt_add(acc, running);
        }
        partial[w] = acc;
    }
    PT result;
    result.inf = true;
    for (int w = n_windows - 1; w >= 0; --w) {
        if (w != n_windows - 1)
            for (int i = 0; i < window; ++i) result = pt_double(result);
        result = pt_add(result, partial[w]);
    }
    out = result;
}

template <typename FF>
static void fixed_batch_impl(const Point<FF> &base, const u64 *scalars,
                             u64 n, int sbits,
                             void (*store)(const Point<FF> &, u64 *),
                             u64 *out, int out_stride) {
    typedef Point<FF> PT;
    const int W = 8;
    const int NW = (sbits + W - 1) / W;
    std::vector<PT> table((size_t)NW << W);
    PT cur = base;
    for (int w = 0; w < NW; ++w) {
        PT *row = &table[(size_t)w << W];
        row[0].inf = true;
        for (int i = 1; i < (1 << W); ++i) row[i] = pt_add(row[i - 1], cur);
        cur = pt_add(row[(1 << W) - 1], cur);
    }
    // one batch inversion turns the whole table affine so every scalar
    // costs NW mixed additions instead of full Jacobian adds
    std::vector<AffPt<FF>> atable;
    pt_batch_to_affine<FF>(table, atable);
    std::vector<PT> accs(n);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long i = 0; i < (long long)n; ++i) {
        const u64 *s = scalars + 4 * i;
        PT acc;
        acc.inf = true;
        for (int w = 0; w < NW; ++w) {
            int shift = w * W;
            u64 idx = s[shift / 64] >> (shift % 64);
            if (shift % 64 + W > 64 && shift / 64 + 1 < 4)
                idx |= s[shift / 64 + 1] << (64 - shift % 64);
            idx &= ((1 << W) - 1);
            if (idx) acc = pt_madd(acc, atable[((size_t)w << W) + idx]);
        }
        accs[i] = acc;
    }
    // ONE batched inversion normalizes every result; store sees Z = 1
    std::vector<AffPt<FF>> aff;
    pt_batch_to_affine<FF>(accs, aff);
    for (size_t i = 0; i < n; ++i) {
        PT p;
        if (aff[i].inf) {
            p.inf = true;
        } else {
            p.inf = false;
            p.X = aff[i].X;
            p.Y = aff[i].Y;
            p.Z = FF::one_mont();
        }
        store(p, out + out_stride * i);
    }
}

#ifdef HAVE_MONT52

// 8-lane IFMA fixed-base batch (G1).  `store` converts a scalar Jacobian
// point to the output wire format.  NL = 64-bit limbs of the base field,
// L = 52-bit limbs of the vector form.
template <int NL, const FieldParams<NL>* FP, typename FQ, int L>
static void fixed_batch_ifma(const Point<FQ>& base, const u64* scalars,
                             u64 n, int sbits,
                             void (*store)(const Point<FQ>&, u64*), u64* out,
                             int out_stride) {
    using namespace m52;
    // 8-bit windows: the ~0.6 MB affine table stays L2-resident — wider
    // windows save mixed adds but lose more to table-gather cache misses
    const int W = 8;
    const int NW = (sbits + W - 1) / W;

    std::vector<Point<FQ>> table((size_t)NW << W);
    Point<FQ> cur = base;
    for (int w = 0; w < NW; ++w) {
        Point<FQ>* row = &table[(size_t)w << W];
        row[0].inf = true;
        for (int i = 1; i < (1 << W); ++i) row[i] = pt_add(row[i - 1], cur);
        cur = pt_add(row[(1 << W) - 1], cur);
    }
    std::vector<AffPt<FQ>> atable;
    pt_batch_to_affine<FQ>(table, atable);

    M52Params<L> P;
    m52_init<NL, L>(P, FP->P);
    Fv<L> mont_one;
    {
        u64 one_v[NL] = {1};
        u64 o52[L];
        to_mont52_value<NL, FP, L>(one_v, o52);
        for (int i = 0; i < L; i++)
            mont_one.l[i] = _mm512_set1_epi64((long long)o52[i]);
    }

    // mont52 copy of the affine table: [entry][X(L) | Y(L)]
    size_t n_ent = atable.size();
    std::vector<u64> t52(n_ent * 2 * L, 0);
    for (size_t e = 0; e < n_ent; e++) {
        if (atable[e].inf) continue;
        auto xv = FQ::from_mont(atable[e].X);
        auto yv = FQ::from_mont(atable[e].Y);
        to_mont52_value<NL, FP, L>(xv.v, &t52[e * 2 * L]);
        to_mont52_value<NL, FP, L>(yv.v, &t52[e * 2 * L + L]);
    }

    // group results: Jacobian value-space coords [n][3*NL]
    std::vector<u64> jac((size_t)n * 3 * NL, 0);
    std::vector<unsigned char> jinf(n, 0);
    u64 one_raw[L] = {1};

    auto scalar_one = [&](size_t i) {
        const u64* s = scalars + 4 * i;
        Point<FQ> a;
        a.inf = true;
        for (int w = 0; w < NW; ++w) {
            int shift = w * W;
            u64 v = s[shift / 64] >> (shift % 64);
            if (shift % 64 + W > 64 && shift / 64 + 1 < 4)
                v |= s[shift / 64 + 1] << (64 - shift % 64);
            v &= ((1 << W) - 1);
            if (v) a = pt_madd(a, atable[((size_t)w << W) + v]);
        }
        store(a, out + out_stride * i);
    };

    size_t g0 = 0;
    for (; g0 + 8 <= n; g0 += 8) {
        VPt<L> acc;
        acc.X = f_zero<L>();
        acc.Y = f_zero<L>();
        acc.Z = f_zero<L>();
        acc.inf = 0xFF;
        __mmask8 slow_any = 0;
        for (int w = 0; w < NW; ++w) {
            int shift = w * W;
            alignas(64) long long idx[8];
            for (int l = 0; l < 8; l++) {
                const u64* s = scalars + 4 * (g0 + l);
                u64 v = s[shift / 64] >> (shift % 64);
                if (shift % 64 + W > 64 && shift / 64 + 1 < 4)
                    v |= s[shift / 64 + 1] << (64 - shift % 64);
                idx[l] = (long long)((v & ((1 << W) - 1))
                                     + ((size_t)w << W));
            }
            __m512i iv = _mm512_load_si512(idx);
            __mmask8 q_inf = 0;
            for (int l = 0; l < 8; l++)
                if ((idx[l] & ((1 << W) - 1)) == 0 || atable[idx[l]].inf)
                    q_inf |= (__mmask8)(1 << l);
            __m512i baseo = _mm512_mullo_epi64(iv,
                                               _mm512_set1_epi64(2 * L));
            Fv<L> qx, qy;
            for (int i = 0; i < L; i++) {
                qx.l[i] = _mm512_i64gather_epi64(
                    _mm512_add_epi64(baseo, _mm512_set1_epi64(i)),
                    (const long long*)t52.data(), 8);
                qy.l[i] = _mm512_i64gather_epi64(
                    _mm512_add_epi64(baseo, _mm512_set1_epi64(L + i)),
                    (const long long*)t52.data(), 8);
            }
            slow_any |= v_madd<L>(P, acc, qx, qy, q_inf, mont_one);
        }
        if (slow_any) {
            for (int l = 0; l < 8; l++) scalar_one(g0 + l);
            for (int l = 0; l < 8; l++) jinf[g0 + l] = 2;
            continue;
        }
        Fv<L> xv = f_mul_const(P, acc.X, one_raw);
        Fv<L> yv = f_mul_const(P, acc.Y, one_raw);
        Fv<L> zv = f_mul_const(P, acc.Z, one_raw);
        store_4x64<NL, L>(P, xv, &jac[g0 * 3 * NL], 3 * NL);
        store_4x64<NL, L>(P, yv, &jac[g0 * 3 * NL + NL], 3 * NL);
        store_4x64<NL, L>(P, zv, &jac[g0 * 3 * NL + 2 * NL], 3 * NL);
        for (int l = 0; l < 8; l++)
            jinf[g0 + l] = (acc.inf >> l) & 1;
    }
    for (size_t i = g0; i < n; i++) {
        scalar_one(i);
        jinf[i] = 2;
    }
    // finalize: rebuild scalar-Montgomery Jacobians; ONE batched inversion
    std::vector<size_t> live;
    std::vector<Point<FQ>> lp;
    live.reserve(n);
    for (size_t i = 0; i < n; i++) {
        if (jinf[i] == 2) continue;
        if (jinf[i] == 1) {
            Point<FQ> p;
            p.inf = true;
            store(p, out + out_stride * i);
            continue;
        }
        typename FQ::T x, y, z;
        memcpy(x.v, &jac[i * 3 * NL], NL * 8);
        memcpy(y.v, &jac[i * 3 * NL + NL], NL * 8);
        memcpy(z.v, &jac[i * 3 * NL + 2 * NL], NL * 8);
        Point<FQ> p;
        p.X = FQ::to_mont(x);
        p.Y = FQ::to_mont(y);
        p.Z = FQ::to_mont(z);
        p.inf = false;
        live.push_back(i);
        lp.push_back(p);
    }
    std::vector<AffPt<FQ>> laff;
    pt_batch_to_affine<FQ>(lp, laff);
    for (size_t k = 0; k < live.size(); k++) {
        u64* xy = out + out_stride * live[k];
        if (laff[k].inf) {
            memset(xy, 0, 2 * NL * 8);
            continue;
        }
        auto xv2 = FQ::from_mont(laff[k].X);
        auto yv2 = FQ::from_mont(laff[k].Y);
        memcpy(xy, xv2.v, NL * 8);
        memcpy(xy + NL, yv2.v, NL * 8);
    }
}

// 8-lane IFMA fixed-base batch for G2
template <int NL, const FieldParams<NL>* FP, typename FQ, typename F2Q,
          int L>
static void fixed_batch_ifma_g2(const Point<F2Q>& base, const u64* scalars,
                                u64 n, int sbits,
                                void (*store)(const Point<F2Q>&, u64*),
                                u64* out, int out_stride) {
    using namespace m52;
    const int W = 8;  // see the G1 note: larger tables gather-thrash
    const int NW = (sbits + W - 1) / W;

    std::vector<Point<F2Q>> table((size_t)NW << W);
    Point<F2Q> cur = base;
    for (int w = 0; w < NW; ++w) {
        Point<F2Q>* row = &table[(size_t)w << W];
        row[0].inf = true;
        for (int i = 1; i < (1 << W); ++i) row[i] = pt_add(row[i - 1], cur);
        cur = pt_add(row[(1 << W) - 1], cur);
    }
    std::vector<AffPt<F2Q>> atable;
    pt_batch_to_affine<F2Q>(table, atable);

    M52Params<L> P;
    m52_init<NL, L>(P, FP->P);
    F2v<L> mont_one;
    {
        u64 one_v[NL] = {1};
        u64 o52[L];
        to_mont52_value<NL, FP, L>(one_v, o52);
        for (int i = 0; i < L; i++)
            mont_one.c0.l[i] = _mm512_set1_epi64((long long)o52[i]);
        mont_one.c1 = f_zero<L>();
    }

    // mont52 table: [entry][x0 x1 y0 y1], L u64 each -> stride 4L
    size_t n_ent = atable.size();
    std::vector<u64> t52(n_ent * 4 * L, 0);
    for (size_t e = 0; e < n_ent; e++) {
        if (atable[e].inf) continue;
        auto x0 = FQ::from_mont(atable[e].X.c0);
        auto x1 = FQ::from_mont(atable[e].X.c1);
        auto y0 = FQ::from_mont(atable[e].Y.c0);
        auto y1 = FQ::from_mont(atable[e].Y.c1);
        to_mont52_value<NL, FP, L>(x0.v, &t52[e * 4 * L]);
        to_mont52_value<NL, FP, L>(x1.v, &t52[e * 4 * L + L]);
        to_mont52_value<NL, FP, L>(y0.v, &t52[e * 4 * L + 2 * L]);
        to_mont52_value<NL, FP, L>(y1.v, &t52[e * 4 * L + 3 * L]);
    }

    std::vector<u64> jac((size_t)n * 6 * NL, 0);  // X,Y,Z each 2xNL values
    std::vector<unsigned char> jinf(n, 0);
    u64 one_raw[L] = {1};

    auto scalar_one = [&](size_t i) {
        const u64* s = scalars + 4 * i;
        Point<F2Q> a;
        a.inf = true;
        for (int w = 0; w < NW; ++w) {
            int shift = w * W;
            u64 v = s[shift / 64] >> (shift % 64);
            if (shift % 64 + W > 64 && shift / 64 + 1 < 4)
                v |= s[shift / 64 + 1] << (64 - shift % 64);
            v &= ((1 << W) - 1);
            if (v) a = pt_madd(a, atable[((size_t)w << W) + v]);
        }
        store(a, out + out_stride * i);
    };

    size_t g0 = 0;
    for (; g0 + 8 <= n; g0 += 8) {
        VPt2<L> acc;
        acc.X = f2_zero<L>();
        acc.Y = f2_zero<L>();
        acc.Z = f2_zero<L>();
        acc.inf = 0xFF;
        __mmask8 slow_any = 0;
        for (int w = 0; w < NW; ++w) {
            int shift = w * W;
            alignas(64) long long idx[8];
            for (int l = 0; l < 8; l++) {
                const u64* s = scalars + 4 * (g0 + l);
                u64 v = s[shift / 64] >> (shift % 64);
                if (shift % 64 + W > 64 && shift / 64 + 1 < 4)
                    v |= s[shift / 64 + 1] << (64 - shift % 64);
                idx[l] = (long long)((v & ((1 << W) - 1))
                                     + ((size_t)w << W));
            }
            __m512i iv = _mm512_load_si512(idx);
            __mmask8 q_inf = 0;
            for (int l = 0; l < 8; l++)
                if ((idx[l] & ((1 << W) - 1)) == 0 || atable[idx[l]].inf)
                    q_inf |= (__mmask8)(1 << l);
            __m512i baseo = _mm512_mullo_epi64(iv,
                                               _mm512_set1_epi64(4 * L));
            F2v<L> qx, qy;
            for (int i = 0; i < L; i++) {
                qx.c0.l[i] = _mm512_i64gather_epi64(
                    _mm512_add_epi64(baseo, _mm512_set1_epi64(i)),
                    (const long long*)t52.data(), 8);
                qx.c1.l[i] = _mm512_i64gather_epi64(
                    _mm512_add_epi64(baseo, _mm512_set1_epi64(L + i)),
                    (const long long*)t52.data(), 8);
                qy.c0.l[i] = _mm512_i64gather_epi64(
                    _mm512_add_epi64(baseo, _mm512_set1_epi64(2 * L + i)),
                    (const long long*)t52.data(), 8);
                qy.c1.l[i] = _mm512_i64gather_epi64(
                    _mm512_add_epi64(baseo, _mm512_set1_epi64(3 * L + i)),
                    (const long long*)t52.data(), 8);
            }
            slow_any |= v2_madd<L>(P, acc, qx, qy, q_inf, mont_one);
        }
        if (slow_any) {
            for (int l = 0; l < 8; l++) scalar_one(g0 + l);
            for (int l = 0; l < 8; l++) jinf[g0 + l] = 2;
            continue;
        }
        Fv<L> c;
        c = f_mul_const(P, acc.X.c0, one_raw);
        store_4x64<NL, L>(P, c, &jac[g0 * 6 * NL], 6 * NL);
        c = f_mul_const(P, acc.X.c1, one_raw);
        store_4x64<NL, L>(P, c, &jac[g0 * 6 * NL + NL], 6 * NL);
        c = f_mul_const(P, acc.Y.c0, one_raw);
        store_4x64<NL, L>(P, c, &jac[g0 * 6 * NL + 2 * NL], 6 * NL);
        c = f_mul_const(P, acc.Y.c1, one_raw);
        store_4x64<NL, L>(P, c, &jac[g0 * 6 * NL + 3 * NL], 6 * NL);
        c = f_mul_const(P, acc.Z.c0, one_raw);
        store_4x64<NL, L>(P, c, &jac[g0 * 6 * NL + 4 * NL], 6 * NL);
        c = f_mul_const(P, acc.Z.c1, one_raw);
        store_4x64<NL, L>(P, c, &jac[g0 * 6 * NL + 5 * NL], 6 * NL);
        for (int l = 0; l < 8; l++)
            jinf[g0 + l] = (acc.inf >> l) & 1;
    }
    for (size_t i = g0; i < n; i++) {
        scalar_one(i);
        jinf[i] = 2;
    }
    // finalize with one batched inversion
    std::vector<size_t> live;
    std::vector<Point<F2Q>> lp;
    for (size_t i = 0; i < n; i++) {
        if (jinf[i] == 2) continue;
        if (jinf[i] == 1) {
            Point<F2Q> p;
            p.inf = true;
            store(p, out + out_stride * i);
            continue;
        }
        Point<F2Q> p;
        typename FQ::T t;
        memcpy(t.v, &jac[i * 6 * NL], NL * 8);
        p.X.c0 = FQ::to_mont(t);
        memcpy(t.v, &jac[i * 6 * NL + NL], NL * 8);
        p.X.c1 = FQ::to_mont(t);
        memcpy(t.v, &jac[i * 6 * NL + 2 * NL], NL * 8);
        p.Y.c0 = FQ::to_mont(t);
        memcpy(t.v, &jac[i * 6 * NL + 3 * NL], NL * 8);
        p.Y.c1 = FQ::to_mont(t);
        memcpy(t.v, &jac[i * 6 * NL + 4 * NL], NL * 8);
        p.Z.c0 = FQ::to_mont(t);
        memcpy(t.v, &jac[i * 6 * NL + 5 * NL], NL * 8);
        p.Z.c1 = FQ::to_mont(t);
        p.inf = false;
        live.push_back(i);
        lp.push_back(p);
    }
    std::vector<AffPt<F2Q>> laff;
    pt_batch_to_affine<F2Q>(lp, laff);
    for (size_t k = 0; k < live.size(); k++) {
        Point<F2Q> p;
        if (laff[k].inf) {
            p.inf = true;
        } else {
            p.inf = false;
            p.X = laff[k].X;
            p.Y = laff[k].Y;
            p.Z = F2Q::one_mont();
        }
        store(p, out + out_stride * live[k]);
    }
}

#endif  // HAVE_MONT52

// ---- curve instantiations ----

typedef F<4, &BN_FQ> BNQ;
typedef F2<BNQ> BNQ2;
typedef F<6, &BLS_FQ> BLSQ;
typedef F2<BLSQ> BLSQ2;

static void bn_g1_store(const Point<BNQ> &p, u64 *xy) { g1_store<4, BNQ>(p, xy); }
static void bn_g2_store(const Point<BNQ2> &p, u64 *xy) { g2_store<4, BNQ, BNQ2>(p, xy); }
static void bls_g1_store(const Point<BLSQ> &p, u64 *xy) { g1_store<6, BLSQ>(p, xy); }
static void bls_g2_store(const Point<BLSQ2> &p, u64 *xy) { g2_store<6, BLSQ, BLSQ2>(p, xy); }

extern "C" {

#define MSM_FN(name, NL, FQ, F2Q, LOAD1, LOAD2, STORE1, STORE2, SBITS)        \
    void name##_g1_msm(const u64 *points, const u64 *scalars, u64 n,          \
                       u64 *out) {                                            \
        std::vector<AffPt<FQ>> pts(n);                                        \
        _Pragma("omp parallel for schedule(static)")                          \
        for (long long i = 0; i < (long long)n; ++i) {                        \
            Point<FQ> p = LOAD1(points + 2 * NL * i);                         \
            pts[i].inf = p.inf;                                               \
            pts[i].X = p.X;                                                   \
            pts[i].Y = p.Y;                                                   \
        }                                                                     \
        Point<FQ> r;                                                          \
        msm_affine_impl(pts, scalars, n, SBITS, r);                           \
        STORE1(r, out);                                                       \
    }                                                                         \
    void name##_g2_msm(const u64 *points, const u64 *scalars, u64 n,          \
                       u64 *out) {                                            \
        std::vector<AffPt<F2Q>> pts(n);                                       \
        _Pragma("omp parallel for schedule(static)")                          \
        for (long long i = 0; i < (long long)n; ++i) {                        \
            Point<F2Q> p = LOAD2(points + 4 * NL * i);                        \
            pts[i].inf = p.inf;                                               \
            pts[i].X = p.X;                                                   \
            pts[i].Y = p.Y;                                                   \
        }                                                                     \
        Point<F2Q> r;                                                         \
        msm_affine_impl(pts, scalars, n, SBITS, r);                           \
        STORE2(r, out);                                                       \
    }                                                                         \
    void name##_g1_fixed_batch(const u64 *base, const u64 *scalars, u64 n,    \
                               u64 *out) {                                    \
        fixed_batch_impl(LOAD1(base), scalars, n, SBITS, STORE1, out,         \
                         2 * NL);                                             \
    }                                                                         \
    void name##_g2_fixed_batch(const u64 *base, const u64 *scalars, u64 n,    \
                               u64 *out) {                                    \
        fixed_batch_impl(LOAD2(base), scalars, n, SBITS, STORE2, out,         \
                         4 * NL);                                             \
    }

static inline Point<BNQ> bn_l1(const u64 *p) { return g1_load<4, BNQ>(p); }
static inline Point<BNQ2> bn_l2(const u64 *p) { return g2_load<4, BNQ, BNQ2>(p); }
static inline Point<BLSQ> bls_l1(const u64 *p) { return g1_load<6, BLSQ>(p); }
static inline Point<BLSQ2> bls_l2(const u64 *p) { return g2_load<6, BLSQ, BLSQ2>(p); }

MSM_FN(bn254_generic, 4, BNQ, BNQ2, bn_l1, bn_l2, bn_g1_store, bn_g2_store, 254)

// BN254 public entry points: MSM + fixed-base take the 8-lane IFMA
// kernels when the host supports them; else the generic scalar path.
void bn254_g1_msm(const u64 *points, const u64 *scalars, u64 n, u64 *out) {
#ifdef HAVE_MONT52
    if (have_ifma_ec() && n >= 1024) {
        std::vector<AffPt<BNQ>> pts(n);
        for (size_t i = 0; i < n; ++i) {
            Point<BNQ> p = bn_l1(points + 8 * i);
            pts[i] = {p.X, p.Y, p.inf};
        }
        Point<BNQ> r;
        msm_affine_ifma<TreePolG1<4, &BN_FQ, 5>>(pts, scalars, n, 254, r);
        bn_g1_store(r, out);
        return;
    }
#endif
    bn254_generic_g1_msm(points, scalars, n, out);
}
void bn254_g2_msm(const u64 *points, const u64 *scalars, u64 n, u64 *out) {
#ifdef HAVE_MONT52
    if (have_ifma_ec() && n >= 1024) {
        std::vector<AffPt<BNQ2>> pts(n);
        for (size_t i = 0; i < n; ++i) {
            Point<BNQ2> p = bn_l2(points + 16 * i);
            pts[i] = {p.X, p.Y, p.inf};
        }
        Point<BNQ2> r;
        msm_affine_ifma<TreePolG2<4, &BN_FQ, 5>>(pts, scalars, n, 254, r);
        bn_g2_store(r, out);
        return;
    }
#endif
    bn254_generic_g2_msm(points, scalars, n, out);
}
void bn254_g1_fixed_batch(const u64 *base, const u64 *scalars, u64 n,
                          u64 *out) {
#ifdef HAVE_MONT52
    if (have_ifma_ec() && n >= 64) {
        fixed_batch_ifma<4, &BN_FQ, BNQ, 5>(bn_l1(base), scalars, n, 254,
                                            bn_g1_store, out, 8);
        return;
    }
#endif
    bn254_generic_g1_fixed_batch(base, scalars, n, out);
}
void bn254_g2_fixed_batch(const u64 *base, const u64 *scalars, u64 n,
                          u64 *out) {
#ifdef HAVE_MONT52
    if (have_ifma_ec() && n >= 64) {
        fixed_batch_ifma_g2<4, &BN_FQ, BNQ, BNQ2, 5>(
            bn_l2(base), scalars, n, 254, bn_g2_store, out, 16);
        return;
    }
#endif
    bn254_generic_g2_fixed_batch(base, scalars, n, out);
}
MSM_FN(bls12381_generic, 6, BLSQ, BLSQ2, bls_l1, bls_l2, bls_g1_store, bls_g2_store, 255)

// BLS12-381 public entry points: fixed-base takes the 8-lane IFMA kernel
// (8x52-limb field form) when available
void bls12381_g1_msm(const u64 *points, const u64 *scalars, u64 n,
                     u64 *out) {
#ifdef HAVE_MONT52
    if (have_ifma_ec() && n >= 1024) {
        std::vector<AffPt<BLSQ>> pts(n);
        for (size_t i = 0; i < n; ++i) {
            Point<BLSQ> p = bls_l1(points + 12 * i);
            pts[i] = {p.X, p.Y, p.inf};
        }
        Point<BLSQ> r;
        msm_affine_ifma<TreePolG1<6, &BLS_FQ, 8>>(pts, scalars, n, 255, r);
        bls_g1_store(r, out);
        return;
    }
#endif
    bls12381_generic_g1_msm(points, scalars, n, out);
}
void bls12381_g2_msm(const u64 *points, const u64 *scalars, u64 n,
                     u64 *out) {
#ifdef HAVE_MONT52
    if (have_ifma_ec() && n >= 1024) {
        std::vector<AffPt<BLSQ2>> pts(n);
        for (size_t i = 0; i < n; ++i) {
            Point<BLSQ2> p = bls_l2(points + 24 * i);
            pts[i] = {p.X, p.Y, p.inf};
        }
        Point<BLSQ2> r;
        msm_affine_ifma<TreePolG2<6, &BLS_FQ, 8>>(pts, scalars, n, 255, r);
        bls_g2_store(r, out);
        return;
    }
#endif
    bls12381_generic_g2_msm(points, scalars, n, out);
}
void bls12381_g1_fixed_batch(const u64 *base, const u64 *scalars, u64 n,
                             u64 *out) {
#ifdef HAVE_MONT52
    if (have_ifma_ec() && n >= 64) {
        fixed_batch_ifma<6, &BLS_FQ, BLSQ, 8>(bls_l1(base), scalars, n, 255,
                                              bls_g1_store, out, 12);
        return;
    }
#endif
    bls12381_generic_g1_fixed_batch(base, scalars, n, out);
}
void bls12381_g2_fixed_batch(const u64 *base, const u64 *scalars, u64 n,
                             u64 *out) {
#ifdef HAVE_MONT52
    if (have_ifma_ec() && n >= 64) {
        fixed_batch_ifma_g2<6, &BLS_FQ, BLSQ, BLSQ2, 8>(
            bls_l2(base), scalars, n, 255, bls_g2_store, out, 24);
        return;
    }
#endif
    bls12381_generic_g2_fixed_batch(base, scalars, n, out);
}

}  // extern "C"

// ---- scalar-field NTT quotient (generic over FR params) ----

template <typename FR>
static void ntt_inplace(typename FR::T *buf, size_t n,
                        const typename FR::T &w_mont) {
    size_t j = 0;
    for (size_t i = 1; i < n; ++i) {
        size_t bit = n >> 1;
        while (j & bit) { j ^= bit; bit >>= 1; }
        j |= bit;
        if (i < j) { auto t = buf[i]; buf[i] = buf[j]; buf[j] = t; }
    }
    for (size_t m = 2; m <= n; m <<= 1) {
        auto wm = w_mont;
        for (size_t s = n / m; s > 1; s >>= 1) wm = FR::mul(wm, wm);
        size_t half = m >> 1;
        std::vector<typename FR::T> tw(half);
        tw[0] = FR::one_mont();
        for (size_t k = 1; k < half; ++k) tw[k] = FR::mul(tw[k - 1], wm);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (n / m > 8)
#endif
        for (long long blk = 0; blk < (long long)(n / m); ++blk) {
            auto *base = buf + (size_t)blk * m;
            for (size_t k = 0; k < half; ++k) {
                auto t = FR::mul(base[k + half], tw[k]);
                auto u = base[k];
                base[k] = FR::add(u, t);
                base[k + half] = FR::sub(u, t);
            }
        }
    }
}

// ---- IFMA-vectorized scalar-field NTT (the Groth16 quotient's 7 big
// transforms).  Values live in limb-major 52-bit planes (plane l holds
// limb l of every element) so the butterflies of every stage with
// half >= 8 are CONTIGUOUS vector loads — no gathers; the three small
// stages gather across 8 blocks at stride m.  Elements stay in the
// "sigma encoding" (x stored as x * 2^(64NL) split to 52-bit limbs);
// twiddles/scales are prepared in m52-mont form (t * 2^(52L)) so one
// f_mul keeps the encoding: (x sig)(t rho)rho^-1 = (x t) sig.
#ifdef HAVE_MONT52

template <int NL, const FieldParams<NL>* FP, int L>
struct Ntt52 {
    typedef F<NL, FP> FR;
    typedef typename FR::T T;
    size_t n;
    std::vector<u64> tw, twi;     // per-stage twiddles (m52-mont)
    std::vector<size_t> stage_off;
    m52::M52Params<L> P;
    u64 c_sigma[L];   // m52-mont(sigma): canonical -> sigma encoding
    u64 c_fix[L];     // m52-mont(2^s), s = 52L-64NL: sig^2 product fix,
                      // and sigma-encoding -> m52-mont converter
    u64 c_dec[L];     // raw 2^s: sigma encoding -> canonical

    explicit Ntt52(size_t n_, const T& w_mont) : n(n_) {
        m52::m52_init<NL, L>(P, FP->P);
        to_mont52_value<NL, FP, L>(FP->ONE, c_sigma);
        u64 v[NL];
        memset(v, 0, sizeof(v));
        v[0] = (u64)1 << (52 * L - 64 * NL);
        to_mont52_value<NL, FP, L>(v, c_fix);
        m52::split52<NL, L>(v, c_dec);
        T wi = FR::one_mont();
        {
            T cur = w_mont;
            for (u64 k = n - 1; k; k >>= 1) {
                if (k & 1) wi = FR::mul(wi, cur);
                cur = FR::mul(cur, cur);
            }
        }
        size_t total = 0;
        for (size_t m = 2; m <= n; m <<= 1) total += m >> 1;
        tw.resize(total * L);
        twi.resize(total * L);
        stage_off.assign(64, 0);
        size_t off = 0;
        int st = 0;
        for (size_t m = 2; m <= n; m <<= 1, ++st) {
            stage_off[st] = off;
            build_stage(w_mont, m, &tw[off * L]);
            build_stage(wi, m, &twi[off * L]);
            off += m >> 1;
        }
    }

    // tw_out[k*L..] = (w^(n/m))^k in m52-mont, k < m/2
    void build_stage(const T& w_mont, size_t m, u64* tw_out) {
        T wm = w_mont;
        for (size_t s = n / m; s > 1; s >>= 1) wm = FR::mul(wm, wm);
        size_t half = m >> 1;
        T pw = FR::one_mont();
        for (size_t k = 0; k < 8 && k < half; ++k) {
            auto cv = FR::from_mont(pw);
            to_mont52_value<NL, FP, L>(cv.v, tw_out + k * L);
            pw = FR::mul(pw, wm);
        }
        if (half <= 8) return;
        u64 w8[L];
        {
            T w8m = FR::mul(FR::mul(wm, wm), FR::mul(wm, wm));
            w8m = FR::mul(w8m, w8m);  // wm^8
            auto cv = FR::from_mont(w8m);
            to_mont52_value<NL, FP, L>(cv.v, w8);
        }
        for (size_t k = 8; k < half; k += 8) {
            m52::Fv<L> prev = gath52<L>(tw_out, vidx_iota(k - 8, L));
            m52::Fv<L> nxt = m52::f_mul_const(P, prev, w8);
            scat52<L>(nxt, tw_out, vidx_iota(k, L));
        }
    }

    inline m52::Fv<L> at(const u64* pl, size_t i) const {
        m52::Fv<L> r;
        for (int l = 0; l < L; ++l)
            r.l[l] = _mm512_loadu_si512(&pl[(size_t)l * n + i]);
        return r;
    }
    inline void put(u64* pl, size_t i, const m52::Fv<L>& v) const {
        for (int l = 0; l < L; ++l)
            _mm512_storeu_si512(&pl[(size_t)l * n + i], v.l[l]);
    }
    inline m52::Fv<L> at_s(const u64* pl, size_t i, size_t stride) const {
        const __m512i io = _mm512_setr_epi64(0, 1, 2, 3, 4, 5, 6, 7);
        __m512i vidx = _mm512_mullo_epi64(io, _mm512_set1_epi64(stride));
        m52::Fv<L> r;
        for (int l = 0; l < L; ++l)
            r.l[l] = _mm512_i64gather_epi64(
                vidx, (const long long*)&pl[(size_t)l * n + i], 8);
        return r;
    }
    inline void put_s(u64* pl, size_t i, size_t stride,
                      const m52::Fv<L>& v) const {
        const __m512i io = _mm512_setr_epi64(0, 1, 2, 3, 4, 5, 6, 7);
        __m512i vidx = _mm512_mullo_epi64(io, _mm512_set1_epi64(stride));
        for (int l = 0; l < L; ++l)
            _mm512_i64scatter_epi64((long long*)&pl[(size_t)l * n + i],
                                    vidx, v.l[l], 8);
    }

    // raw canonical u64[NL] rows -> planes (sigma encoding)
    void load_values(const u64* vals, u64* pl) const {
        for (size_t i = 0; i < n; i += 8) {
            m52::Fv<L> raw = m52::load_raw<NL, L>(vals + NL * i, NL);
            put(pl, i, m52::f_mul_const(P, raw, c_sigma));
        }
    }
    // planes -> canonical u64[NL] rows
    void store_values(u64* out, const u64* pl) const {
        for (size_t i = 0; i < n; i += 8) {
            m52::Fv<L> v = m52::f_mul_const(P, at(pl, i), c_dec);
            m52::store_4x64<NL, L>(P, v, out + NL * i, NL);
        }
    }

    void bit_reverse(u64* pl) const {
        for (int l = 0; l < L; ++l) {
            u64* p = &pl[(size_t)l * n];
            size_t j = 0;
            for (size_t i = 1; i < n; ++i) {
                size_t bit = n >> 1;
                while (j & bit) { j ^= bit; bit >>= 1; }
                j |= bit;
                if (i < j) { u64 t = p[i]; p[i] = p[j]; p[j] = t; }
            }
        }
    }

    void transform(u64* pl, bool inverse) const {
        bit_reverse(pl);
        int st = 0;
        for (size_t m = 2; m <= n; m <<= 1, ++st) {
            const u64* twt =
                (inverse ? twi.data() : tw.data()) + stage_off[st] * L;
            size_t half = m >> 1;
            if (half >= 8) {
                for (size_t blk = 0; blk < n; blk += m)
                    for (size_t k = 0; k < half; k += 8) {
                        m52::Fv<L> tv = gath52<L>(twt, vidx_iota(k, L));
                        m52::Fv<L> v = at(pl, blk + half + k);
                        m52::Fv<L> t = m52::f_mul(P, v, tv);
                        m52::Fv<L> u = at(pl, blk + k);
                        put(pl, blk + k, m52::f_add(P, u, t));
                        put(pl, blk + half + k, m52::f_sub(P, u, t));
                    }
            } else {
                for (size_t k = 0; k < half; ++k) {
                    m52::Fv<L> tv;
                    for (int l = 0; l < L; ++l)
                        tv.l[l] = _mm512_set1_epi64(
                            (long long)twt[k * L + l]);
                    for (size_t blk = 0; blk < n; blk += 8 * m) {
                        m52::Fv<L> v = at_s(pl, blk + half + k, m);
                        m52::Fv<L> t = m52::f_mul(P, v, tv);
                        m52::Fv<L> u = at_s(pl, blk + k, m);
                        put_s(pl, blk + k, m, m52::f_add(P, u, t));
                        put_s(pl, blk + half + k, m,
                              m52::f_sub(P, u, t));
                    }
                }
            }
        }
    }

    // planes[i] *= base * step^i
    void scale_chain(u64* pl, const T& base_mont, const T& step_mont) const {
        u64 lane0[8 * NL];
        T p8 = base_mont;
        for (int k = 0; k < 8; ++k) {
            memcpy(lane0 + k * NL, p8.v, NL * 8);
            p8 = FR::mul(p8, step_mont);
        }
        u64 s8[L];
        {
            T st8 = FR::mul(FR::mul(step_mont, step_mont),
                            FR::mul(step_mont, step_mont));
            st8 = FR::mul(st8, st8);  // step^8
            auto cv = FR::from_mont(st8);
            to_mont52_value<NL, FP, L>(cv.v, s8);
        }
        // FF-mont rows ARE the sigma encoding; c_fix lifts to m52-mont
        m52::Fv<L> sc = m52::f_mul_const(
            P, m52::load_raw<NL, L>(lane0, NL), c_fix);
        for (size_t i = 0; i < n; i += 8) {
            put(pl, i, m52::f_mul(P, at(pl, i), sc));
            sc = m52::f_mul_const(P, sc, s8);
        }
    }

    // a = (a*b - c) * zinv   (zinv canonical -> m52-mont internally)
    void mul_sub_scale(u64* a, const u64* b, const u64* c,
                       const T& zinv_mont) const {
        u64 zi[L];
        auto cv = FR::from_mont(zinv_mont);
        to_mont52_value<NL, FP, L>(cv.v, zi);
        for (size_t i = 0; i < n; i += 8) {
            m52::Fv<L> ab = m52::f_mul_const(
                P, m52::f_mul(P, at(a, i), at(b, i)), c_fix);
            m52::Fv<L> r = m52::f_sub(P, ab, at(c, i));
            put(a, i, m52::f_mul_const(P, r, zi));
        }
    }
};

#endif  // HAVE_MONT52

template <int NLW, const FieldParams<NLW>* FPW>
static void witness_h_impl(u64 *az, u64 *bz, u64 *cz, u64 n,
                           const u64 *w_limbs, const u64 *shift_limbs,
                           const u64 *zinv_limbs, u64 *out) {
    typedef F<NLW, FPW> FR;
    typedef typename FR::T T;
    T w, shift, zinv;
    memcpy(w.v, w_limbs, 32);
    memcpy(shift.v, shift_limbs, 32);
    memcpy(zinv.v, zinv_limbs, 32);
    w = FR::to_mont(w);
    shift = FR::to_mont(shift);
    zinv = FR::to_mont(zinv);
    T n_fr;
    memset(n_fr.v, 0, 32);
    n_fr.v[0] = n;
    n_fr = FR::to_mont(n_fr);
    T n_inv = FR::inv(n_fr);
    T w_inv = FR::one_mont();
    {
        T cur = w;
        for (u64 k = n - 1; k; k >>= 1) {
            if (k & 1) w_inv = FR::mul(w_inv, cur);
            cur = FR::mul(cur, cur);
        }
    }
#ifdef HAVE_MONT52
    if (have_ifma_ec() && n >= 64) {
        Ntt52<NLW, FPW, 5> ctx(n, w);
        std::vector<u64> pa(5 * n), pb(5 * n), pc(5 * n);
        ctx.load_values(az, pa.data());
        ctx.load_values(bz, pb.data());
        ctx.load_values(cz, pc.data());
        for (u64* pl : {pa.data(), pb.data(), pc.data()}) {
            ctx.transform(pl, true);
            ctx.scale_chain(pl, n_inv, shift);
            ctx.transform(pl, false);
        }
        ctx.mul_sub_scale(pa.data(), pb.data(), pc.data(), zinv);
        ctx.transform(pa.data(), true);
        ctx.scale_chain(pa.data(), n_inv, FR::inv(shift));
        ctx.store_values(out, pa.data());
        return;
    }
#endif
    T *a = new T[n], *b = new T[n], *c = new T[n];
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long i = 0; i < (long long)n; ++i) {
        T t;
        memcpy(t.v, az + 4 * i, 32);
        a[i] = FR::to_mont(t);
        memcpy(t.v, bz + 4 * i, 32);
        b[i] = FR::to_mont(t);
        memcpy(t.v, cz + 4 * i, 32);
        c[i] = FR::to_mont(t);
    }
    auto to_coset = [&](T *arr) {
        ntt_inplace<FR>(arr, n, w_inv);
        T sp = n_inv;
        for (size_t j2 = 0; j2 < n; ++j2) {
            arr[j2] = FR::mul(arr[j2], sp);
            sp = FR::mul(sp, shift);
        }
        ntt_inplace<FR>(arr, n, w);
    };
    to_coset(a);
    to_coset(b);
    to_coset(c);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long i = 0; i < (long long)n; ++i)
        a[i] = FR::mul(FR::sub(FR::mul(a[i], b[i]), c[i]), zinv);
    ntt_inplace<FR>(a, n, w_inv);
    T shift_inv = FR::inv(shift);
    T sp = n_inv;
    for (size_t j2 = 0; j2 < n; ++j2) {
        T r = FR::from_mont(FR::mul(a[j2], sp));
        memcpy(out + 4 * j2, r.v, 32);
        sp = FR::mul(sp, shift_inv);
    }
    delete[] a;
    delete[] b;
    delete[] c;
}

// Sparse R1CS matrix evaluation over F_r: out[j] = sum_k coef_k * w_k for
// CSR rows (indptr/wires/coefs).  Coefs arrive PRE-CONVERTED to Montgomery
// (cached per proving key python-side); witness is converted here once.
template <typename FR>
static void r1cs_eval_impl(const u64 *indptr, const uint32_t *wires,
                           const u64 *coefs_mont, u64 nc,
                           const u64 *witness, u64 nv, u64 *out) {
    typedef typename FR::T T;
    std::vector<T> wm(nv);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long i = 0; i < (long long)nv; ++i) {
        T t;
        memcpy(t.v, witness + 4 * i, 32);
        wm[i] = FR::to_mont(t);
    }
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long j = 0; j < (long long)nc; ++j) {
        T acc;
        memset(acc.v, 0, sizeof(acc.v));
        for (u64 k = indptr[j]; k < indptr[j + 1]; ++k) {
            T c;
            memcpy(c.v, coefs_mont + 4 * k, 32);
            acc = FR::add(acc, FR::mul(c, wm[wires[k]]));
        }
        T r = FR::from_mont(acc);
        memcpy(out + 4 * j, r.v, 32);
    }
}

template <typename FR>
static void fr_to_mont_impl(const u64 *vals, u64 n, u64 *out) {
    typedef typename FR::T T;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long i = 0; i < (long long)n; ++i) {
        T t;
        memcpy(t.v, vals + 4 * i, 32);
        T r = FR::to_mont(t);
        memcpy(out + 4 * i, r.v, 32);
    }
}

typedef F<4, &BN_FR> BNR;
typedef F<4, &BLS_FR> BLSR;

extern "C" {

void bn254_fr_witness_h(u64 *az, u64 *bz, u64 *cz, u64 n, const u64 *w,
                        const u64 *shift, const u64 *zinv, u64 *out) {
    witness_h_impl<4, &BN_FR>(az, bz, cz, n, w, shift, zinv, out);
}

void bls12381_fr_witness_h(u64 *az, u64 *bz, u64 *cz, u64 n, const u64 *w,
                           const u64 *shift, const u64 *zinv, u64 *out) {
    witness_h_impl<4, &BLS_FR>(az, bz, cz, n, w, shift, zinv, out);
}

void bn254_r1cs_eval(const u64 *indptr, const uint32_t *wires,
                     const u64 *coefs_mont, u64 nc, const u64 *witness,
                     u64 nv, u64 *out) {
    r1cs_eval_impl<BNR>(indptr, wires, coefs_mont, nc, witness, nv, out);
}

void bls12381_r1cs_eval(const u64 *indptr, const uint32_t *wires,
                        const u64 *coefs_mont, u64 nc, const u64 *witness,
                        u64 nv, u64 *out) {
    r1cs_eval_impl<BLSR>(indptr, wires, coefs_mont, nc, witness, nv, out);
}

void bn254_fr_to_mont(const u64 *vals, u64 n, u64 *out) {
    fr_to_mont_impl<BNR>(vals, n, out);
}

void bls12381_fr_to_mont(const u64 *vals, u64 n, u64 *out) {
    fr_to_mont_impl<BLSR>(vals, n, out);
}

}  // extern "C"
