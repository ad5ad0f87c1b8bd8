// Shared AVX-512 IFMA Montgomery core: 8 independent field elements per
// vector, L x 52-bit limbs (L=5 covers ~255-bit moduli, L=8 covers
// ~381-bit), radix R = 2^(52*L).
//
// Used by ec_curves.cpp (BN254 and BLS12-381 base-field EC batches) and,
// in its specialized form, by poseidon_fr.cpp.  Products accumulate raw
// vpmadd52 partials into a 2L-limb accumulator (limbs stay < 2^59) and
// pay ONE Montgomery reduction per output; values live in [0, 2p) with
// explicit conditional subtracts where chains grow.
//
// All helpers take the modulus constants through M52Params<L> so several
// fields coexist in one binary.
#pragma once

#include "gl_avx512.h"

#if defined(GL_HAVE_AVX512) && defined(__AVX512IFMA__)
#define HAVE_MONT52 1

#include <cstdint>

namespace m52 {

using u64 = uint64_t;

static const u64 MASK52 = (1ULL << 52) - 1;

template <int L>
struct M52Params {
    u64 p52[L];    // modulus, Lx52 LE limbs
    u64 p52_2[L];  // 2p, normalized Lx52 limbs
    u64 pinv52;    // -p^{-1} mod 2^52
    u64 r2_52[L];  // R^2 = 2^(2*52*L) mod p (to-Montgomery factor)
};

// generic NLx64 -> Lx52 bit slice (scalar)
template <int NL, int L>
inline void split52(const u64* v, u64* o) {
    for (int i = 0; i < L; i++) {
        int bit = 52 * i;
        int wd = bit / 64;
        int sh = bit % 64;
        u64 x = wd < NL ? (v[wd] >> sh) : 0;
        if (sh + 52 > 64 && wd + 1 < NL) x |= v[wd + 1] << (64 - sh);
        o[i] = x & MASK52;
    }
}

// fill params from an NLx64 little-endian modulus (p < 2^(52*L - 2))
template <int NL, int L>
inline void m52_init(M52Params<L>& P, const u64* p) {
    split52<NL, L>(p, P.p52);
    u64 p2[NL + 1];
    u64 carry = 0;
    for (int i = 0; i < NL; i++) {
        p2[i] = (p[i] << 1) | carry;
        carry = p[i] >> 63;
    }
    p2[NL] = carry;
    split52<NL + 1, L>(p2, P.p52_2);
    u64 x = 1;
    for (int i = 0; i < 6; i++) x *= 2 - p[0] * x;
    P.pinv52 = (u64)(0 - x) & MASK52;
    // R^2 = 2^(2*52*L) mod p by doubling
    u64 v[NL];
    for (int i = 0; i < NL; i++) v[i] = 0;
    v[0] = 1;
    auto gte = [&](const u64* a, const u64* b) {
        for (int i = NL - 1; i >= 0; i--) {
            if (a[i] > b[i]) return true;
            if (a[i] < b[i]) return false;
        }
        return true;
    };
    auto subp = [&](u64* a, const u64* b) {
        unsigned __int128 borrow = 0;
        for (int i = 0; i < NL; i++) {
            unsigned __int128 d = (unsigned __int128)a[i] - b[i]
                - (u64)borrow;
            a[i] = (u64)d;
            borrow = (d >> 64) ? 1 : 0;
        }
    };
    for (int d = 0; d < 2 * 52 * L; d++) {
        u64 c2 = 0;
        for (int k = 0; k < NL; k++) {
            u64 nv = (v[k] << 1) | c2;
            c2 = v[k] >> 63;
            v[k] = nv;
        }
        if (c2 || gte(v, p)) subp(v, p);
    }
    split52<NL, L>(v, P.r2_52);
}

template <int L>
struct Fv {
    __m512i l[L];
};

template <int L>
struct Acc {
    __m512i a[2 * L];
};

template <int L>
static inline void acc_zero(Acc<L>& A) {
    for (int i = 0; i < 2 * L; i++) A.a[i] = _mm512_setzero_si512();
}

template <int L>
static inline void acc_mul_const(Acc<L>& A, const Fv<L>& x, const u64* m) {
    for (int j = 0; j < L; j++) {
        const __m512i mj = _mm512_set1_epi64((long long)m[j]);
        for (int i = 0; i < L; i++) {
            A.a[i + j] = _mm512_madd52lo_epu64(A.a[i + j], x.l[i], mj);
            A.a[i + j + 1] = _mm512_madd52hi_epu64(A.a[i + j + 1], x.l[i],
                                                   mj);
        }
    }
}

template <int L>
static inline void acc_mul(Acc<L>& A, const Fv<L>& x, const Fv<L>& y) {
    for (int j = 0; j < L; j++) {
        for (int i = 0; i < L; i++) {
            A.a[i + j] = _mm512_madd52lo_epu64(A.a[i + j], x.l[i], y.l[j]);
            A.a[i + j + 1] = _mm512_madd52hi_epu64(A.a[i + j + 1], x.l[i],
                                                   y.l[j]);
        }
    }
}

template <int L>
static inline Fv<L> acc_reduce(const M52Params<L>& P, Acc<L>& A) {
    const __m512i pinv = _mm512_set1_epi64((long long)P.pinv52);
    const __m512i mask = _mm512_set1_epi64((long long)MASK52);
    for (int i = 0; i < L; i++) {
        __m512i q = _mm512_and_si512(
            _mm512_madd52lo_epu64(_mm512_setzero_si512(), A.a[i], pinv),
            mask);
        for (int j = 0; j < L; j++) {
            const __m512i pj = _mm512_set1_epi64((long long)P.p52[j]);
            A.a[i + j] = _mm512_madd52lo_epu64(A.a[i + j], q, pj);
            A.a[i + j + 1] = _mm512_madd52hi_epu64(A.a[i + j + 1], q, pj);
        }
        A.a[i + 1] = _mm512_add_epi64(A.a[i + 1],
                                      _mm512_srli_epi64(A.a[i], 52));
    }
    Fv<L> r;
    __m512i carry = _mm512_setzero_si512();
    for (int i = 0; i < L; i++) {
        __m512i v = _mm512_add_epi64(A.a[L + i], carry);
        r.l[i] = _mm512_and_si512(v, mask);
        carry = _mm512_srli_epi64(v, 52);
    }
    r.l[L - 1] = _mm512_or_si512(r.l[L - 1], _mm512_slli_epi64(carry, 52));
    return r;
}

template <int L>
static inline Fv<L> f_mul(const M52Params<L>& P, const Fv<L>& a,
                          const Fv<L>& b) {
    Acc<L> A;
    acc_zero(A);
    acc_mul(A, a, b);
    return acc_reduce(P, A);
}

template <int L>
static inline Fv<L> f_mul_const(const M52Params<L>& P, const Fv<L>& a,
                                const u64* m) {
    Acc<L> A;
    acc_zero(A);
    acc_mul_const(A, a, m);
    return acc_reduce(P, A);
}

template <int L>
static inline Fv<L> f_sq(const M52Params<L>& P, const Fv<L>& a) {
    return f_mul(P, a, a);
}

// add + carry propagate (limbs < 2^52 after; value NOT reduced mod p)
template <int L>
static inline Fv<L> f_add_raw(const Fv<L>& a, const Fv<L>& b) {
    const __m512i mask = _mm512_set1_epi64((long long)MASK52);
    Fv<L> r;
    __m512i carry = _mm512_setzero_si512();
    for (int i = 0; i < L; i++) {
        __m512i v = _mm512_add_epi64(_mm512_add_epi64(a.l[i], b.l[i]), carry);
        r.l[i] = _mm512_and_si512(v, mask);
        carry = _mm512_srli_epi64(v, 52);
    }
    r.l[L - 1] = _mm512_or_si512(r.l[L - 1], _mm512_slli_epi64(carry, 52));
    return r;
}

// conditional subtract of kp (k = 1 or 2): x - kp when x >= kp
template <int L>
static inline Fv<L> f_csub(const M52Params<L>& P, const Fv<L>& x, int k) {
    const __m512i mask = _mm512_set1_epi64((long long)MASK52);
    const u64* kp_l = k == 2 ? P.p52_2 : P.p52;
    Fv<L> t;
    __m512i borrow = _mm512_setzero_si512();
    for (int i = 0; i < L; i++) {
        __m512i sub = _mm512_add_epi64(_mm512_set1_epi64((long long)kp_l[i]),
                                       borrow);
        __m512i diff = _mm512_sub_epi64(x.l[i], sub);
        __mmask8 bo = _mm512_cmplt_epi64_mask(x.l[i], sub);
        t.l[i] = _mm512_and_si512(diff, mask);
        borrow = _mm512_maskz_set1_epi64(bo, 1);
    }
    __mmask8 keep = _mm512_test_epi64_mask(borrow, borrow);
    Fv<L> r;
    for (int i = 0; i < L; i++)
        r.l[i] = _mm512_mask_blend_epi64(keep, t.l[i], x.l[i]);
    return r;
}

// modular add: inputs < 2p -> output < 2p
template <int L>
static inline Fv<L> f_add(const M52Params<L>& P, const Fv<L>& a,
                          const Fv<L>& b) {
    return f_csub(P, f_add_raw(a, b), 2);
}

// modular sub: (a - b) via a + (2p - b), inputs < 2p -> output < 2p
template <int L>
static inline Fv<L> f_sub(const M52Params<L>& P, const Fv<L>& a,
                          const Fv<L>& b) {
    const __m512i mask = _mm512_set1_epi64((long long)MASK52);
    Fv<L> t;
    __m512i borrow = _mm512_setzero_si512();
    for (int i = 0; i < L; i++) {
        __m512i sub = _mm512_add_epi64(b.l[i], borrow);
        __m512i pi = _mm512_set1_epi64((long long)P.p52_2[i]);
        __m512i diff = _mm512_sub_epi64(pi, sub);
        __mmask8 bo = _mm512_cmplt_epi64_mask(pi, sub);
        t.l[i] = _mm512_and_si512(diff, mask);
        borrow = _mm512_maskz_set1_epi64(bo, 1);
    }
    return f_csub(P, f_add_raw(a, t), 2);
}

template <int L>
static inline Fv<L> f_dbl(const M52Params<L>& P, const Fv<L>& a) {
    return f_add(P, a, a);
}

template <int L>
static inline __mmask8 f_is_zero_mod(const M52Params<L>& P, const Fv<L>& a) {
    // a < 2p: zero mod p iff a == 0 or a == p
    __m512i acc0 = _mm512_setzero_si512();
    __m512i accp = _mm512_setzero_si512();
    for (int i = 0; i < L; i++) {
        acc0 = _mm512_or_si512(acc0, a.l[i]);
        accp = _mm512_or_si512(
            accp, _mm512_xor_si512(
                      a.l[i], _mm512_set1_epi64((long long)P.p52[i])));
    }
    __mmask8 z0 = _mm512_cmpeq_epu64_mask(acc0, _mm512_setzero_si512());
    __mmask8 zp = _mm512_cmpeq_epu64_mask(accp, _mm512_setzero_si512());
    return (__mmask8)(z0 | zp);
}

template <int L>
static inline Fv<L> f_select(__mmask8 k, const Fv<L>& if0, const Fv<L>& if1) {
    Fv<L> r;
    for (int i = 0; i < L; i++)
        r.l[i] = _mm512_mask_blend_epi64(k, if0.l[i], if1.l[i]);
    return r;
}

template <int L>
static inline Fv<L> f_zero() {
    Fv<L> r;
    for (int i = 0; i < L; i++) r.l[i] = _mm512_setzero_si512();
    return r;
}

// NLx64 value limbs (lane-strided gather) -> raw Lx52 (NOT Montgomery)
template <int NL, int L>
static inline Fv<L> load_raw(const u64* vals, size_t stride) {
    __m512i w[NL];
    const __m512i vidx = _mm512_setr_epi64(
        0, (long long)stride, (long long)(2 * stride),
        (long long)(3 * stride), (long long)(4 * stride),
        (long long)(5 * stride), (long long)(6 * stride),
        (long long)(7 * stride));
    for (int i = 0; i < NL; i++)
        w[i] = _mm512_i64gather_epi64(vidx, (const long long*)(vals + i), 8);
    const __m512i mask = _mm512_set1_epi64((long long)MASK52);
    Fv<L> r;
    for (int i = 0; i < L; i++) {
        int bit = 52 * i;
        int wd = bit / 64;
        int sh = bit % 64;
        __m512i v = wd < NL
            ? _mm512_srl_epi64(w[wd], _mm_cvtsi32_si128(sh))
            : _mm512_setzero_si512();
        if (sh + 52 > 64 && wd + 1 < NL)
            v = _mm512_or_si512(
                v, _mm512_sll_epi64(w[wd + 1], _mm_cvtsi32_si128(64 - sh)));
        r.l[i] = _mm512_and_si512(v, mask);
    }
    return r;
}

// canonical (< p, via csub) Lx52 -> NLx64 value limbs, lane-strided scatter
template <int NL, int L>
static inline void store_4x64(const M52Params<L>& P, const Fv<L>& a_in,
                              u64* out, size_t stride) {
    Fv<L> a = f_csub(P, a_in, 1);
    __m512i w[NL];
    for (int j = 0; j < NL; j++) w[j] = _mm512_setzero_si512();
    for (int i = 0; i < L; i++) {
        int bit = 52 * i;
        int wd = bit / 64;
        int sh = bit % 64;
        if (wd < NL)
            w[wd] = _mm512_or_si512(
                w[wd], _mm512_sll_epi64(a.l[i], _mm_cvtsi32_si128(sh)));
        if (sh + 52 > 64 && wd + 1 < NL)
            w[wd + 1] = _mm512_or_si512(
                w[wd + 1],
                _mm512_srl_epi64(a.l[i], _mm_cvtsi32_si128(64 - sh)));
    }
    const __m512i vidx = _mm512_setr_epi64(
        0, (long long)stride, (long long)(2 * stride),
        (long long)(3 * stride), (long long)(4 * stride),
        (long long)(5 * stride), (long long)(6 * stride),
        (long long)(7 * stride));
    long long* op = (long long*)out;
    for (int j = 0; j < NL; j++)
        _mm512_i64scatter_epi64(op + j, vidx, w[j], 8);
}

}  // namespace m52

#endif  // GL_HAVE_AVX512 && __AVX512IFMA__
