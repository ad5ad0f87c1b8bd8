// Native big-field Poseidon (BN254 / BLS12-381 scalar fields), the host
// kernel behind hash/poseidon_big.py (reference semantics:
// starky/src/poseidon_bn128_opt.rs / poseidon_bls12381_opt.rs — circomlib
// "opt" schedule, x^5 sbox, variable state width t = 2..17).
//
// Two engines, runtime-dispatched:
//  - scalar 4x64 Montgomery CIOS (__uint128 products) — portable fallback
//    and the correctness reference for the vector path;
//  - AVX-512 IFMA 5x52-limb Montgomery, 8 independent hashes per vector
//    lane.  MDS rows and the partial-round dot products accumulate raw
//    104-bit vpmadd52 partials into a 10-limb accumulator (limbs < 2^59)
//    and pay ONE Montgomery reduction per output.  Values live in [0, 2p);
//    the partial-round state updates apply a masked conditional subtract
//    of 2p to keep the domain bound.
//
// The Python side passes the modulus and the per-t constant tables in
// 4x64 little-endian value-space limbs once; conversions to both
// Montgomery forms happen here.

#include <cstdint>
#include <cstring>

#include "gl_avx512.h"
#include "mont52_avx512.h"

using u64 = uint64_t;
using u128 = unsigned __int128;

static const int MAX_T = 17;
static const int N_INST = 2;

// ---------------- scalar 4x64 Montgomery ----------------------------------

struct Fe {
    u64 l[4];
};

struct Inst;
static Inst* g_inst[N_INST];

static inline bool fe_gte(const u64* a, const u64* b) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] > b[i]) return true;
        if (a[i] < b[i]) return false;
    }
    return true;  // equal
}

static inline void fe_sub_mod(u64* a, const u64* b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - (u64)borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

struct Inst {
    u64 p[4];
    u64 inv64;        // -p^{-1} mod 2^64
    u64 r2[4];        // 2^512 mod p (scalar-Montgomery squared radix)
    // IFMA form
    u64 p52[5];
    u64 p52_2[5];     // 2p, normalized 5x52 limbs (csub subtrahend)
    u64 pinv52;       // -p^{-1} mod 2^52
    u64 r2_52[4];     // 2^520 mod p, as 4x64 value limbs
#ifdef HAVE_MONT52
    m52::M52Params<5> mp;  // shared vector-core parameter block
#endif
    // tables per t, scalar-Montgomery 4x64: C, M[t][t], P[t][t], S
    Fe* C[MAX_T + 1];
    Fe* M[MAX_T + 1];
    Fe* Pm[MAX_T + 1];
    Fe* S[MAX_T + 1];
    int n_p[MAX_T + 1];
    // tables per t in IFMA-Montgomery 5x52 limbs (same layout, 5 u64 each)
    u64* C52[MAX_T + 1];
    u64* M52[MAX_T + 1];
    u64* Pm52[MAX_T + 1];
    u64* S52[MAX_T + 1];
};

// mont: out = a*b*R^{-1} mod p  (R = 2^256), CIOS
static void mont_mul(const Inst& F, const u64* a, const u64* b, u64* out) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 c = 0;
        for (int j = 0; j < 4; j++) {
            u128 s = (u128)a[i] * b[j] + t[j] + (u64)c;
            t[j] = (u64)s;
            c = s >> 64;
        }
        u128 s = (u128)t[4] + (u64)c;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);
        u64 m = t[0] * F.inv64;
        c = 0;
        for (int j = 0; j < 4; j++) {
            u128 s2 = (u128)m * F.p[j] + t[j] + (u64)c;
            t[j] = (u64)s2;
            c = s2 >> 64;
        }
        s = (u128)t[4] + (u64)c;
        t[4] = (u64)s;
        t[5] += (u64)(s >> 64);
        for (int j = 0; j < 5; j++) t[j] = t[j + 1];
        t[5] = 0;
    }
    if (t[4] || fe_gte(t, F.p)) fe_sub_mod(t, F.p);
    std::memcpy(out, t, 4 * sizeof(u64));
}

static inline void fe_add_mod(const Inst& F, const u64* a, const u64* b,
                              u64* out) {
    u128 carry = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a[i] + b[i] + (u64)carry;
        t[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || fe_gte(t, F.p)) fe_sub_mod(t, F.p);
    std::memcpy(out, t, 4 * sizeof(u64));
}

static void to_mont(const Inst& F, const u64* v, u64* out) {
    mont_mul(F, v, F.r2, out);
}

static void from_mont(const Inst& F, const u64* v, u64* out) {
    u64 one[4] = {1, 0, 0, 0};
    mont_mul(F, v, one, out);
}

static inline void pow5(const Inst& F, const u64* x, u64* out) {
    u64 x2[4], x4[4];
    mont_mul(F, x, x, x2);
    mont_mul(F, x2, x2, x4);
    mont_mul(F, x4, x, out);
}

// one scalar permutation, in/out Montgomery
static void permute_scalar(const Inst& F, int t, Fe* st) {
    const Fe* C = F.C[t];
    const Fe* M = F.M[t];
    const Fe* Pm = F.Pm[t];
    const Fe* S = F.S[t];
    int n_p = F.n_p[t];
    const int half = 4;
    Fe tmp[MAX_T];

    auto mat = [&](const Fe* mt) {
        for (int i = 0; i < t; i++) {
            u64 acc[4] = {0, 0, 0, 0};
            u64 pr[4];
            for (int j = 0; j < t; j++) {
                mont_mul(F, mt[j * t + i].l, st[j].l, pr);
                fe_add_mod(F, acc, pr, acc);
            }
            std::memcpy(tmp[i].l, acc, sizeof(acc));
        }
        std::memcpy(st, tmp, t * sizeof(Fe));
    };

    for (int r = 0; r < half - 1; r++) {
        for (int i = 0; i < t; i++) pow5(F, st[i].l, st[i].l);
        for (int i = 0; i < t; i++)
            fe_add_mod(F, st[i].l, C[(r + 1) * t + i].l, st[i].l);
        mat(M);
    }
    for (int i = 0; i < t; i++) pow5(F, st[i].l, st[i].l);
    for (int i = 0; i < t; i++)
        fe_add_mod(F, st[i].l, C[half * t + i].l, st[i].l);
    mat(Pm);

    for (int r = 0; r < n_p; r++) {
        u64 s0[4];
        pow5(F, st[0].l, s0);
        fe_add_mod(F, s0, C[(half + 1) * t + r].l, s0);
        std::memcpy(st[0].l, s0, sizeof(s0));
        int base = (2 * t - 1) * r;
        u64 new0[4] = {0, 0, 0, 0}, pr[4];
        for (int j = 0; j < t; j++) {
            mont_mul(F, S[base + j].l, st[j].l, pr);
            fe_add_mod(F, new0, pr, new0);
        }
        for (int k = 1; k < t; k++) {
            mont_mul(F, S[base + t + k - 1].l, s0, pr);
            fe_add_mod(F, st[k].l, pr, st[k].l);
        }
        std::memcpy(st[0].l, new0, sizeof(new0));
    }

    int cbase = (half + 1) * t + n_p;
    for (int r = 0; r < half - 1; r++) {
        for (int i = 0; i < t; i++) pow5(F, st[i].l, st[i].l);
        for (int i = 0; i < t; i++)
            fe_add_mod(F, st[i].l, C[cbase + r * t + i].l, st[i].l);
        mat(M);
    }
    for (int i = 0; i < t; i++) pow5(F, st[i].l, st[i].l);
    mat(M);
}

// ---------------- IFMA 5x52 Montgomery, 8 lanes ----------------------------
#ifdef GL_HAVE_IFMA

static bool have_ifma_fr() {
    static const bool ok = __builtin_cpu_supports("avx512ifma")
        && __builtin_cpu_supports("avx512dq");
    return ok;
}

namespace frv {

using glv::u64;

// thin adapters over the shared templated core (mont52_avx512.h):
// everything 5-limb here; the Inst carries its M52Params<5> in `mp`.
using Fv = m52::Fv<5>;

static inline Fv f_mul(const Inst& F, const Fv& a, const Fv& b) {
    return m52::f_mul(F.mp, a, b);
}

static inline Fv f_mul_const(const Inst& F, const Fv& a, const u64* m) {
    return m52::f_mul_const(F.mp, a, m);
}

static inline Fv f_add(const Fv& a, const Fv& b) {
    return m52::f_add_raw(a, b);
}

static inline Fv f_add_const(const Fv& a, const u64* c) {
    Fv cv;
    for (int i = 0; i < 5; i++)
        cv.l[i] = _mm512_set1_epi64((long long)c[i]);
    return m52::f_add_raw(a, cv);
}

static inline Fv f_csub(const Inst& F, const Fv& x, int k) {
    return m52::f_csub(F.mp, x, k);
}

static inline Fv f_pow5(const Inst& F, const Fv& x) {
    Fv x2 = f_mul(F, x, x);
    Fv x4 = f_mul(F, x2, x2);
    return f_mul(F, x4, x);
}



// full vector permutation: st[t] in Montgomery-52 form, values < 2p
static void permute_v8(const Inst& F, int t, Fv* st) {
    const u64* C = F.C52[t];
    const u64* M = F.M52[t];
    const u64* Pm = F.Pm52[t];
    const u64* S = F.S52[t];
    int n_p = F.n_p[t];
    const int half = 4;
    Fv tmp[MAX_T];

    auto mat = [&](const u64* mt) {
        for (int i = 0; i < t; i++) {
            m52::Acc<5> A;
            m52::acc_zero(A);
            for (int j = 0; j < t; j++)
                m52::acc_mul_const(A, st[j], mt + (j * t + i) * 5);
            tmp[i] = m52::acc_reduce(F.mp, A);
        }
        for (int i = 0; i < t; i++) st[i] = tmp[i];
    };

    for (int r = 0; r < half - 1; r++) {
        for (int i = 0; i < t; i++) st[i] = f_pow5(F, st[i]);
        for (int i = 0; i < t; i++)
            st[i] = f_add_const(st[i], C + ((r + 1) * t + i) * 5);
        mat(M);
    }
    for (int i = 0; i < t; i++) st[i] = f_pow5(F, st[i]);
    for (int i = 0; i < t; i++)
        st[i] = f_add_const(st[i], C + (half * t + i) * 5);
    mat(Pm);

    for (int r = 0; r < n_p; r++) {
        Fv s0 = f_add_const(f_pow5(F, st[0]), C + ((half + 1) * t + r) * 5);
        st[0] = s0;
        int base = (2 * t - 1) * r;
        m52::Acc<5> A;
        m52::acc_zero(A);
        for (int j = 0; j < t; j++)
            m52::acc_mul_const(A, st[j], S + (base + j) * 5);
        Fv new0 = m52::acc_reduce(F.mp, A);
        for (int k = 1; k < t; k++) {
            Fv pr = f_mul_const(F, s0, S + (base + t + k - 1) * 5);
            st[k] = f_csub(F, f_add(st[k], pr), 2);
        }
        st[0] = new0;
    }

    int cbase = (half + 1) * t + n_p;
    for (int r = 0; r < half - 1; r++) {
        for (int i = 0; i < t; i++) st[i] = f_pow5(F, st[i]);
        for (int i = 0; i < t; i++)
            st[i] = f_add_const(st[i], C + (cbase + r * t + i) * 5);
        mat(M);
    }
    for (int i = 0; i < t; i++) st[i] = f_pow5(F, st[i]);
    mat(M);
}

}  // namespace frv
#endif  // GL_HAVE_IFMA

// ---------------- C API -----------------------------------------------------

extern "C" {

// p: 4x64 LE limbs.  Computes inv64, r2 (2^512 mod p), p52/pinv52 and the
// IFMA radix constants.
void posfr_set_field(int inst, const u64* p) {
    if (g_inst[inst] == nullptr) g_inst[inst] = new Inst();
    Inst& F = *g_inst[inst];
    std::memset(&F, 0, sizeof(Inst));
    std::memcpy(F.p, p, 4 * sizeof(u64));
    // inv64 = -p^{-1} mod 2^64 (Newton)
    u64 x = 1;
    for (int i = 0; i < 6; i++) x *= 2 - F.p[0] * x;
    F.inv64 = (u64)(0 - x);
    F.pinv52 = F.inv64 & ((1ULL << 52) - 1);
    // r2 = 2^512 mod p by repeated doubling of 1 (512+...)
    auto dbl_mod = [&](u64* v) {
        u64 carry = 0;
        for (int i = 0; i < 4; i++) {
            u64 nv = (v[i] << 1) | carry;
            carry = v[i] >> 63;
            v[i] = nv;
        }
        if (carry || fe_gte(v, F.p)) fe_sub_mod(v, F.p);
    };
    u64 v[4] = {1, 0, 0, 0};
    for (int i = 0; i < 512; i++) dbl_mod(v);
    std::memcpy(F.r2, v, sizeof(v));
    u64 w[4] = {1, 0, 0, 0};
    for (int i = 0; i < 520; i++) dbl_mod(w);
    std::memcpy(F.r2_52, w, sizeof(w));
    // p in 5x52 limbs
    F.p52[0] = F.p[0] & ((1ULL << 52) - 1);
    F.p52[1] = ((F.p[0] >> 52) | (F.p[1] << 12)) & ((1ULL << 52) - 1);
    F.p52[2] = ((F.p[1] >> 40) | (F.p[2] << 24)) & ((1ULL << 52) - 1);
    F.p52[3] = ((F.p[2] >> 28) | (F.p[3] << 36)) & ((1ULL << 52) - 1);
    F.p52[4] = F.p[3] >> 16;
    // 2p in normalized 5x52 limbs (p < 2^255 so 2p fits 4x64)
    u64 p2[4];
    u64 carry = 0;
    for (int i = 0; i < 4; i++) {
        p2[i] = (F.p[i] << 1) | carry;
        carry = F.p[i] >> 63;
    }
    F.p52_2[0] = p2[0] & ((1ULL << 52) - 1);
    F.p52_2[1] = ((p2[0] >> 52) | (p2[1] << 12)) & ((1ULL << 52) - 1);
    F.p52_2[2] = ((p2[1] >> 40) | (p2[2] << 24)) & ((1ULL << 52) - 1);
    F.p52_2[3] = ((p2[2] >> 28) | (p2[3] << 36)) & ((1ULL << 52) - 1);
    F.p52_2[4] = p2[3] >> 16;
#ifdef HAVE_MONT52
    m52::m52_init<4, 5>(F.mp, F.p);
#endif
}

// tables in 4x64 value-space limbs: C[nC], M[t*t], P[t*t], S[nS]
void posfr_set_table(int inst, int t, const u64* C, int nC, const u64* M,
                     const u64* Pm, const u64* S, int nS, int n_p) {
    Inst& F = *g_inst[inst];
    F.n_p[t] = n_p;
    auto conv = [&](const u64* src, int n) {
        Fe* dst = new Fe[n];
        for (int i = 0; i < n; i++) to_mont(F, src + 4 * i, dst[i].l);
        return dst;
    };
    delete[] F.C[t];
    delete[] F.M[t];
    delete[] F.Pm[t];
    delete[] F.S[t];
    F.C[t] = conv(C, nC);
    F.M[t] = conv(M, t * t);
    F.Pm[t] = conv(Pm, t * t);
    F.S[t] = conv(S, nS);
    // 5x52 copies of the scalar-Montgomery values, rescaled to the 2^260
    // radix: mont52(x) = x * 2^260 mod p = mont64(x) * 2^260 * 2^-256 ...
    // simpler: convert from VALUE space with the 52-radix R2 via the
    // scalar engine: m52 = value * 2^260 mod p, computed as
    // mont64(value, r2_52_times ...).  We just compute value*2^260 mod p
    // with schoolbook double-and-add of shifts — table setup is one-off.
    auto conv52 = [&](const u64* src, int n) {
        u64* dst = new u64[(size_t)n * 5];
        for (int i = 0; i < n; i++) {
            // x * 2^260 mod p: start from value, double 260 times
            u64 v[4];
            std::memcpy(v, src + 4 * i, sizeof(v));
            // ensure < p
            if (fe_gte(v, F.p)) fe_sub_mod(v, F.p);
            for (int d = 0; d < 260; d++) {
                u64 carry = 0;
                for (int k2 = 0; k2 < 4; k2++) {
                    u64 nv = (v[k2] << 1) | carry;
                    carry = v[k2] >> 63;
                    v[k2] = nv;
                }
                if (carry || fe_gte(v, F.p)) fe_sub_mod(v, F.p);
            }
            u64* o = dst + (size_t)i * 5;
            o[0] = v[0] & ((1ULL << 52) - 1);
            o[1] = ((v[0] >> 52) | (v[1] << 12)) & ((1ULL << 52) - 1);
            o[2] = ((v[1] >> 40) | (v[2] << 24)) & ((1ULL << 52) - 1);
            o[3] = ((v[2] >> 28) | (v[3] << 36)) & ((1ULL << 52) - 1);
            o[4] = v[3] >> 16;
        }
        return dst;
    };
    delete[] F.C52[t];
    delete[] F.M52[t];
    delete[] F.Pm52[t];
    delete[] F.S52[t];
    F.C52[t] = conv52(C, nC);
    F.M52[t] = conv52(M, t * t);
    F.Pm52[t] = conv52(Pm, t * t);
    F.S52[t] = conv52(S, nS);
}

// Batched sponge: inp [B, t-1, 4] + init [B, 4] -> out [B, n_out, 4]
// (all value-space 4x64 limbs; t = n_inputs + 1)
void posfr_hash_batch(int inst, int t, const u64* inp, const u64* init,
                      u64* out, size_t B, int n_out) {
    const Inst& F = *g_inst[inst];
    size_t b0 = 0;
#ifdef GL_HAVE_IFMA
    if (have_ifma_fr() && B >= 8) {
        using namespace frv;
        const u64 MM = (1ULL << 52) - 1;
        // to-Montgomery-260 factor: R^2 = 2^520 mod p in 5x52 limbs
        // (raw * 2^520 * 2^-260 = raw * 2^260)
        const u64* r520 = F.r2_52;
        u64 r260_52[5];
        r260_52[0] = r520[0] & MM;
        r260_52[1] = ((r520[0] >> 52) | (r520[1] << 12)) & MM;
        r260_52[2] = ((r520[1] >> 40) | (r520[2] << 24)) & MM;
        r260_52[3] = ((r520[2] >> 28) | (r520[3] << 36)) & MM;
        r260_52[4] = r520[3] >> 16;

        for (; b0 + 8 <= B; b0 += 8) {
            Fv st[MAX_T];
            // state[0] = init, state[1..] = inputs; convert to Montgomery
            // by multiplying the raw 52-limb value with 2^260 mod p.
            {
                Fv raw = m52::load_raw<4, 5>(init + b0 * 4, 4);
                st[0] = f_mul_const(F, raw, r260_52);
            }
            for (int i = 0; i < t - 1; i++) {
                Fv raw = m52::load_raw<4, 5>(
                    inp + (b0 * (size_t)(t - 1) + i) * 4,
                    (size_t)(t - 1) * 4);
                st[1 + i] = f_mul_const(F, raw, r260_52);
            }
            // add C[0..t)
            for (int i = 0; i < t; i++)
                st[i] = f_add_const(st[i], F.C52[t] + i * 5);
            permute_v8(F, t, st);
            // outputs: from Montgomery (multiply by 1) then canonical
            for (int o = 0; o < n_out; o++) {
                Fv one;
                for (int i = 0; i < 5; i++)
                    one.l[i] = _mm512_set1_epi64(i == 0 ? 1 : 0);
                Fv v = f_mul(F, st[o], one);
                v = f_csub(F, v, 1);
                // pack 5x52 -> 4x64 and scatter
                __m512i w0 = _mm512_or_si512(v.l[0],
                                             _mm512_slli_epi64(v.l[1], 52));
                __m512i w1 = _mm512_or_si512(_mm512_srli_epi64(v.l[1], 12),
                                             _mm512_slli_epi64(v.l[2], 40));
                __m512i w2 = _mm512_or_si512(_mm512_srli_epi64(v.l[2], 24),
                                             _mm512_slli_epi64(v.l[3], 28));
                __m512i w3 = _mm512_or_si512(_mm512_srli_epi64(v.l[3], 36),
                                             _mm512_slli_epi64(v.l[4], 16));
                const __m512i vidx = _mm512_setr_epi64(
                    0, (long long)(n_out * 4), (long long)(2 * n_out * 4),
                    (long long)(3 * n_out * 4), (long long)(4 * n_out * 4),
                    (long long)(5 * n_out * 4), (long long)(6 * n_out * 4),
                    (long long)(7 * n_out * 4));
                long long* op = (long long*)(out + (b0 * n_out + o) * 4);
                _mm512_i64scatter_epi64(op, vidx, w0, 8);
                _mm512_i64scatter_epi64(op + 1, vidx, w1, 8);
                _mm512_i64scatter_epi64(op + 2, vidx, w2, 8);
                _mm512_i64scatter_epi64(op + 3, vidx, w3, 8);
            }
        }
    }
#endif
    for (; b0 < B; b0++) {
        Fe st[MAX_T];
        to_mont(F, init + b0 * 4, st[0].l);
        for (int i = 0; i < t - 1; i++)
            to_mont(F, inp + (b0 * (size_t)(t - 1) + i) * 4, st[1 + i].l);
        for (int i = 0; i < t; i++)
            fe_add_mod(F, st[i].l, F.C[t][i].l, st[i].l);
        permute_scalar(F, t, st);
        for (int o = 0; o < n_out; o++) {
            u64 v[4];
            from_mont(F, st[o].l, v);
            std::memcpy(out + (b0 * n_out + o) * 4, v, sizeof(v));
        }
    }
}

// debug probe: c = a * b mod p via the IFMA path (value-space 4x64 in/out);
// returns 0 when the IFMA engine is unavailable
int posfr_dbg_mul52(int inst, const u64* a, const u64* b, u64* out) {
#ifdef GL_HAVE_IFMA
    if (!have_ifma_fr()) return 0;
    using namespace frv;
    const Inst& F = *g_inst[inst];
    const u64 MM = (1ULL << 52) - 1;
    const u64* r520 = F.r2_52;
    u64 r520_52[5];
    r520_52[0] = r520[0] & MM;
    r520_52[1] = ((r520[0] >> 52) | (r520[1] << 12)) & MM;
    r520_52[2] = ((r520[1] >> 40) | (r520[2] << 24)) & MM;
    r520_52[3] = ((r520[2] >> 28) | (r520[3] << 36)) & MM;
    r520_52[4] = r520[3] >> 16;
    Fv av = m52::load_raw<4, 5>(a, 0);  // stride 0: lanes share the row
    Fv bv = m52::load_raw<4, 5>(b, 0);
    av = f_mul_const(F, av, r520_52);
    bv = f_mul_const(F, bv, r520_52);
    Fv cv = f_mul(F, av, bv);
    Fv one;
    for (int i = 0; i < 5; i++)
        one.l[i] = _mm512_set1_epi64(i == 0 ? 1 : 0);
    cv = f_mul(F, cv, one);
    cv = f_csub(F, cv, 1);
    u64 l[5];
    for (int i = 0; i < 5; i++) {
        alignas(64) u64 lane[8];
        _mm512_store_si512(lane, cv.l[i]);
        l[i] = lane[0];
    }
    out[0] = l[0] | (l[1] << 52);
    out[1] = (l[1] >> 12) | (l[2] << 40);
    out[2] = (l[2] >> 24) | (l[3] << 28);
    out[3] = (l[3] >> 36) | (l[4] << 16);
    return 1;
#else
    (void)inst; (void)a; (void)b; (void)out;
    return 0;
#endif
}

}  // extern "C"
