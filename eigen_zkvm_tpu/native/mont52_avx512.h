// Shared AVX-512 IFMA Montgomery core: 8 independent field elements per
// vector, 5x52-bit limbs (moduli up to ~2^255), radix R = 2^260.
//
// Used by poseidon_fr.cpp (BN254/BLS scalar-field Poseidon) and
// ec_curves.cpp (BN254 base-field EC batches).  Products accumulate raw
// vpmadd52 partials into a 10-limb accumulator (limbs stay < 2^59 for up
// to ~60 terms) and pay ONE Montgomery reduction per output; values live
// in [0, 2p) with explicit conditional subtracts where chains grow.
//
// All helpers take the modulus constants through M52Params so several
// fields coexist in one binary.
#pragma once

#include "gl_avx512.h"

#if defined(GL_HAVE_AVX512) && defined(__AVX512IFMA__)
#define HAVE_MONT52 1

#include <cstdint>

namespace m52 {

using u64 = uint64_t;

static const u64 MASK52 = (1ULL << 52) - 1;

struct M52Params {
    u64 p52[5];    // modulus, 5x52 LE limbs
    u64 p52_2[5];  // 2p, normalized 5x52 limbs
    u64 pinv52;    // -p^{-1} mod 2^52
    u64 r2_52[5];  // 2^520 mod p in 5x52 limbs (to-Montgomery factor)
};

// fill params from a 4x64 little-endian modulus (p < 2^255)
inline void m52_init(M52Params& P, const u64 p[4]) {
    auto split = [](const u64 v[4], u64 o[5]) {
        o[0] = v[0] & MASK52;
        o[1] = ((v[0] >> 52) | (v[1] << 12)) & MASK52;
        o[2] = ((v[1] >> 40) | (v[2] << 24)) & MASK52;
        o[3] = ((v[2] >> 28) | (v[3] << 36)) & MASK52;
        o[4] = v[3] >> 16;
    };
    split(p, P.p52);
    u64 p2[4];
    u64 carry = 0;
    for (int i = 0; i < 4; i++) {
        p2[i] = (p[i] << 1) | carry;
        carry = p[i] >> 63;
    }
    split(p2, P.p52_2);
    u64 x = 1;
    for (int i = 0; i < 6; i++) x *= 2 - p[0] * x;
    P.pinv52 = (u64)(0 - x) & MASK52;
    // 2^520 mod p by doubling
    u64 v[4] = {1, 0, 0, 0};
    auto gte = [&](const u64* a, const u64* b) {
        for (int i = 3; i >= 0; i--) {
            if (a[i] > b[i]) return true;
            if (a[i] < b[i]) return false;
        }
        return true;
    };
    auto subp = [&](u64* a, const u64* b) {
        unsigned __int128 borrow = 0;
        for (int i = 0; i < 4; i++) {
            unsigned __int128 d = (unsigned __int128)a[i] - b[i]
                - (u64)borrow;
            a[i] = (u64)d;
            borrow = (d >> 64) ? 1 : 0;
        }
    };
    for (int d = 0; d < 520; d++) {
        u64 c2 = 0;
        for (int k = 0; k < 4; k++) {
            u64 nv = (v[k] << 1) | c2;
            c2 = v[k] >> 63;
            v[k] = nv;
        }
        if (c2 || gte(v, p)) subp(v, p);
    }
    split(v, P.r2_52);
}

struct Fv {
    __m512i l[5];
};

struct Acc10 {
    __m512i a[10];
};

static inline void acc_zero(Acc10& A) {
    for (int i = 0; i < 10; i++) A.a[i] = _mm512_setzero_si512();
}

static inline void acc_mul_const(Acc10& A, const Fv& x, const u64* m) {
    for (int j = 0; j < 5; j++) {
        const __m512i mj = _mm512_set1_epi64((long long)m[j]);
        for (int i = 0; i < 5; i++) {
            A.a[i + j] = _mm512_madd52lo_epu64(A.a[i + j], x.l[i], mj);
            A.a[i + j + 1] = _mm512_madd52hi_epu64(A.a[i + j + 1], x.l[i],
                                                   mj);
        }
    }
}

static inline void acc_mul(Acc10& A, const Fv& x, const Fv& y) {
    for (int j = 0; j < 5; j++) {
        for (int i = 0; i < 5; i++) {
            A.a[i + j] = _mm512_madd52lo_epu64(A.a[i + j], x.l[i], y.l[j]);
            A.a[i + j + 1] = _mm512_madd52hi_epu64(A.a[i + j + 1], x.l[i],
                                                   y.l[j]);
        }
    }
}

static inline Fv acc_reduce(const M52Params& P, Acc10& A) {
    const __m512i pinv = _mm512_set1_epi64((long long)P.pinv52);
    const __m512i mask = _mm512_set1_epi64((long long)MASK52);
    for (int i = 0; i < 5; i++) {
        __m512i q = _mm512_and_si512(
            _mm512_madd52lo_epu64(_mm512_setzero_si512(), A.a[i], pinv),
            mask);
        for (int j = 0; j < 5; j++) {
            const __m512i pj = _mm512_set1_epi64((long long)P.p52[j]);
            A.a[i + j] = _mm512_madd52lo_epu64(A.a[i + j], q, pj);
            A.a[i + j + 1] = _mm512_madd52hi_epu64(A.a[i + j + 1], q, pj);
        }
        A.a[i + 1] = _mm512_add_epi64(A.a[i + 1],
                                      _mm512_srli_epi64(A.a[i], 52));
    }
    Fv r;
    __m512i carry = _mm512_setzero_si512();
    for (int i = 0; i < 5; i++) {
        __m512i v = _mm512_add_epi64(A.a[5 + i], carry);
        r.l[i] = _mm512_and_si512(v, mask);
        carry = _mm512_srli_epi64(v, 52);
    }
    r.l[4] = _mm512_or_si512(r.l[4], _mm512_slli_epi64(carry, 52));
    return r;
}

static inline Fv f_mul(const M52Params& P, const Fv& a, const Fv& b) {
    Acc10 A;
    acc_zero(A);
    acc_mul(A, a, b);
    return acc_reduce(P, A);
}

static inline Fv f_mul_const(const M52Params& P, const Fv& a, const u64* m) {
    Acc10 A;
    acc_zero(A);
    acc_mul_const(A, a, m);
    return acc_reduce(P, A);
}

static inline Fv f_sq(const M52Params& P, const Fv& a) {
    return f_mul(P, a, a);
}

// add + carry propagate (limbs < 2^52 after; value NOT reduced mod p)
static inline Fv f_add_raw(const Fv& a, const Fv& b) {
    const __m512i mask = _mm512_set1_epi64((long long)MASK52);
    Fv r;
    __m512i carry = _mm512_setzero_si512();
    for (int i = 0; i < 5; i++) {
        __m512i v = _mm512_add_epi64(_mm512_add_epi64(a.l[i], b.l[i]), carry);
        r.l[i] = _mm512_and_si512(v, mask);
        carry = _mm512_srli_epi64(v, 52);
    }
    r.l[4] = _mm512_or_si512(r.l[4], _mm512_slli_epi64(carry, 52));
    return r;
}

// conditional subtract of kp (k = 1 or 2): x - kp when x >= kp
static inline Fv f_csub(const M52Params& P, const Fv& x, int k) {
    const __m512i mask = _mm512_set1_epi64((long long)MASK52);
    const u64* kp_l = k == 2 ? P.p52_2 : P.p52;
    Fv t;
    __m512i borrow = _mm512_setzero_si512();
    for (int i = 0; i < 5; i++) {
        __m512i sub = _mm512_add_epi64(_mm512_set1_epi64((long long)kp_l[i]),
                                       borrow);
        __m512i diff = _mm512_sub_epi64(x.l[i], sub);
        __mmask8 bo = _mm512_cmplt_epi64_mask(x.l[i], sub);
        t.l[i] = _mm512_and_si512(diff, mask);
        borrow = _mm512_maskz_set1_epi64(bo, 1);
    }
    __mmask8 keep = _mm512_test_epi64_mask(borrow, borrow);
    Fv r;
    for (int i = 0; i < 5; i++)
        r.l[i] = _mm512_mask_blend_epi64(keep, t.l[i], x.l[i]);
    return r;
}

// modular add: inputs < 2p -> output < 2p
static inline Fv f_add(const M52Params& P, const Fv& a, const Fv& b) {
    return f_csub(P, f_add_raw(a, b), 2);
}

// modular sub: (a - b) mod 2p for a < 2p, b < 2p: a + (2p - b)
static inline Fv f_sub(const M52Params& P, const Fv& a, const Fv& b) {
    const __m512i mask = _mm512_set1_epi64((long long)MASK52);
    // t = 2p - b (b < 2p so no borrow out)
    Fv t;
    __m512i borrow = _mm512_setzero_si512();
    for (int i = 0; i < 5; i++) {
        __m512i sub = _mm512_add_epi64(b.l[i], borrow);
        __m512i pi = _mm512_set1_epi64((long long)P.p52_2[i]);
        __m512i diff = _mm512_sub_epi64(pi, sub);
        __mmask8 bo = _mm512_cmplt_epi64_mask(pi, sub);
        t.l[i] = _mm512_and_si512(diff, mask);
        borrow = _mm512_maskz_set1_epi64(bo, 1);
    }
    return f_csub(P, f_add_raw(a, t), 2);
}

static inline Fv f_dbl(const M52Params& P, const Fv& a) {
    return f_add(P, a, a);
}

static inline __mmask8 f_is_zero_mod(const M52Params& P, const Fv& a) {
    // a < 2p: zero mod p iff a == 0 or a == p
    __m512i acc0 = _mm512_setzero_si512();
    __m512i accp = _mm512_setzero_si512();
    for (int i = 0; i < 5; i++) {
        acc0 = _mm512_or_si512(acc0, a.l[i]);
        accp = _mm512_or_si512(
            accp, _mm512_xor_si512(
                      a.l[i], _mm512_set1_epi64((long long)P.p52[i])));
    }
    __mmask8 z0 = _mm512_cmpeq_epu64_mask(acc0, _mm512_setzero_si512());
    __mmask8 zp = _mm512_cmpeq_epu64_mask(accp, _mm512_setzero_si512());
    return (__mmask8)(z0 | zp);
}

static inline Fv f_select(__mmask8 k, const Fv& if0, const Fv& if1) {
    Fv r;
    for (int i = 0; i < 5; i++)
        r.l[i] = _mm512_mask_blend_epi64(k, if0.l[i], if1.l[i]);
    return r;
}

static inline Fv f_zero() {
    Fv r;
    for (int i = 0; i < 5; i++) r.l[i] = _mm512_setzero_si512();
    return r;
}

// 4x64 value limbs (lane-strided gather) -> raw 5x52 (NOT Montgomery)
static inline Fv load_raw_4x64(const u64* vals, size_t stride) {
    __m512i w[4];
    const __m512i vidx = _mm512_setr_epi64(
        0, (long long)stride, (long long)(2 * stride),
        (long long)(3 * stride), (long long)(4 * stride),
        (long long)(5 * stride), (long long)(6 * stride),
        (long long)(7 * stride));
    for (int i = 0; i < 4; i++)
        w[i] = _mm512_i64gather_epi64(vidx, (const long long*)(vals + i), 8);
    const __m512i mask = _mm512_set1_epi64((long long)MASK52);
    Fv r;
    r.l[0] = _mm512_and_si512(w[0], mask);
    r.l[1] = _mm512_and_si512(
        _mm512_or_si512(_mm512_srli_epi64(w[0], 52),
                        _mm512_slli_epi64(w[1], 12)), mask);
    r.l[2] = _mm512_and_si512(
        _mm512_or_si512(_mm512_srli_epi64(w[1], 40),
                        _mm512_slli_epi64(w[2], 24)), mask);
    r.l[3] = _mm512_and_si512(
        _mm512_or_si512(_mm512_srli_epi64(w[2], 28),
                        _mm512_slli_epi64(w[3], 36)), mask);
    r.l[4] = _mm512_srli_epi64(w[3], 16);
    return r;
}

// canonical (< p, via csub) 5x52 -> 4x64 value limbs, lane-strided scatter
static inline void store_4x64(const M52Params& P, const Fv& a_in, u64* out,
                              size_t stride) {
    Fv a = f_csub(P, a_in, 1);
    __m512i w0 = _mm512_or_si512(a.l[0], _mm512_slli_epi64(a.l[1], 52));
    __m512i w1 = _mm512_or_si512(_mm512_srli_epi64(a.l[1], 12),
                                 _mm512_slli_epi64(a.l[2], 40));
    __m512i w2 = _mm512_or_si512(_mm512_srli_epi64(a.l[2], 24),
                                 _mm512_slli_epi64(a.l[3], 28));
    __m512i w3 = _mm512_or_si512(_mm512_srli_epi64(a.l[3], 36),
                                 _mm512_slli_epi64(a.l[4], 16));
    const __m512i vidx = _mm512_setr_epi64(
        0, (long long)stride, (long long)(2 * stride),
        (long long)(3 * stride), (long long)(4 * stride),
        (long long)(5 * stride), (long long)(6 * stride),
        (long long)(7 * stride));
    long long* op = (long long*)out;
    _mm512_i64scatter_epi64(op, vidx, w0, 8);
    _mm512_i64scatter_epi64(op + 1, vidx, w1, 8);
    _mm512_i64scatter_epi64(op + 2, vidx, w2, 8);
    _mm512_i64scatter_epi64(op + 3, vidx, w3, 8);
}

}  // namespace m52

#endif  // GL_HAVE_AVX512 && __AVX512IFMA__
