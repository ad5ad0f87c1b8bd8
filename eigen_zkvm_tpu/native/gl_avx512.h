// AVX-512 Goldilocks field primitives: 8 field elements per __m512i.
//
// The playbook (analog of the reference's fields/src/arch/x86_64/avx512_*
// role, written from scratch for this framework): 64x64 products are built
// from four vpmuludq 32x32 halves, every carry/overflow fixup is a
// compare-mask + masked add/sub (branchless by construction), and the
// Goldilocks reduction uses 2^64 = 2^32 - 1, 2^96 = -1 (mod p).
//
// Guarded so the scalar fallback still builds on non-AVX512 hosts; callers
// dispatch at runtime via __builtin_cpu_supports("avx512dq").
#pragma once

#if defined(__AVX512F__) && defined(__AVX512DQ__)
#define GL_HAVE_AVX512 1

#include <immintrin.h>
#include <cstdint>

namespace glv {

using u64 = uint64_t;

static const u64 GL_P = 0xFFFFFFFF00000001ULL;
static const u64 GL_EPS = 0xFFFFFFFFULL;

static inline __m512i vP() { return _mm512_set1_epi64((long long)GL_P); }
static inline __m512i vEPS() { return _mm512_set1_epi64((long long)GL_EPS); }

// canonical add: a, b < p
static inline __m512i v_add(__m512i a, __m512i b) {
    __m512i r = _mm512_add_epi64(a, b);
    __mmask8 wrap = _mm512_cmplt_epu64_mask(r, a);
    r = _mm512_mask_add_epi64(r, wrap, r, vEPS());
    __mmask8 ge = _mm512_cmpge_epu64_mask(r, vP());
    return _mm512_mask_sub_epi64(r, ge, r, vP());
}

static inline __m512i v_sub(__m512i a, __m512i b) {
    __m512i d = _mm512_sub_epi64(a, b);
    __mmask8 borrow = _mm512_cmplt_epu64_mask(a, b);
    return _mm512_mask_sub_epi64(d, borrow, d, vEPS());
}

// full 64x64 -> 128 product; returns lo, writes hi
static inline __m512i v_mul_wide(__m512i a, __m512i b, __m512i* hi_out) {
    __m512i a_hi = _mm512_srli_epi64(a, 32);
    __m512i b_hi = _mm512_srli_epi64(b, 32);
    __m512i ll = _mm512_mul_epu32(a, b);      // lo32(a) * lo32(b)
    __m512i lh = _mm512_mul_epu32(a, b_hi);
    __m512i hl = _mm512_mul_epu32(a_hi, b);
    __m512i hh = _mm512_mul_epu32(a_hi, b_hi);
    __m512i mid = _mm512_add_epi64(lh, hl);
    __mmask8 mid_c = _mm512_cmplt_epu64_mask(mid, lh);
    __m512i lo = _mm512_add_epi64(ll, _mm512_slli_epi64(mid, 32));
    __mmask8 lo_c = _mm512_cmplt_epu64_mask(lo, ll);
    __m512i hi = _mm512_add_epi64(hh, _mm512_srli_epi64(mid, 32));
    hi = _mm512_mask_add_epi64(hi, mid_c, hi,
                               _mm512_set1_epi64(1LL << 32));
    hi = _mm512_mask_add_epi64(hi, lo_c, hi, _mm512_set1_epi64(1));
    *hi_out = hi;
    return lo;
}

// reduce hi*2^64 + lo mod p, canonical result
static inline __m512i v_reduce128(__m512i hi, __m512i lo) {
    __m512i hi_hi = _mm512_srli_epi64(hi, 32);
    __m512i hi_lo = _mm512_and_si512(hi, vEPS());
    __mmask8 borrow = _mm512_cmplt_epu64_mask(lo, hi_hi);
    __m512i t = _mm512_sub_epi64(lo, hi_hi);
    t = _mm512_mask_sub_epi64(t, borrow, t, vEPS());
    __m512i t1 = _mm512_sub_epi64(_mm512_slli_epi64(hi_lo, 32), hi_lo);
    __m512i r = _mm512_add_epi64(t, t1);
    __mmask8 carry = _mm512_cmplt_epu64_mask(r, t);
    r = _mm512_mask_add_epi64(r, carry, r, vEPS());
    __mmask8 ge = _mm512_cmpge_epu64_mask(r, vP());
    return _mm512_mask_sub_epi64(r, ge, r, vP());
}

static inline __m512i v_mul(__m512i a, __m512i b) {
    __m512i hi;
    __m512i lo = v_mul_wide(a, b, &hi);
    return v_reduce128(hi, lo);
}

static inline __m512i v_pow7(__m512i x) {
    __m512i x2 = v_mul(x, x);
    __m512i x3 = v_mul(x2, x);
    __m512i x6 = v_mul(x3, x3);
    return v_mul(x6, x);
}

// Lazy dot-product accumulator (12-term safe): lo + hi*2^64 + hi2*2^128,
// hi2 counts wraps (<= 24).  One reduction at the end:
//   value = lo + hi*(2^32-1) + hi2*EPS2 (mod p), EPS2 = (2^32-1)^2 mod p.
struct VAcc {
    __m512i lo, hi, hi2;
};

static inline VAcc v_acc_zero() {
    VAcc a;
    a.lo = a.hi = a.hi2 = _mm512_setzero_si512();
    return a;
}

static inline void v_acc_mul(VAcc& acc, __m512i x, __m512i m) {
    __m512i hi;
    __m512i lo = v_mul_wide(x, m, &hi);
    acc.lo = _mm512_add_epi64(acc.lo, lo);
    __mmask8 c0 = _mm512_cmplt_epu64_mask(acc.lo, lo);
    __m512i one = _mm512_set1_epi64(1);
    __m512i hic = _mm512_mask_add_epi64(hi, c0, hi, one);
    // hi + carry cannot wrap: hi <= (p-1)^2 >> 64 < 2^64 - 2^33
    acc.hi = _mm512_add_epi64(acc.hi, hic);
    __mmask8 c1 = _mm512_cmplt_epu64_mask(acc.hi, hic);
    acc.hi2 = _mm512_mask_add_epi64(acc.hi2, c1, acc.hi2, one);
}

static inline __m512i v_acc_reduce(const VAcc& acc) {
    // v = lo + hi*EPS + hi2*EPS2; hi*EPS < 2^96 so build it as a 128-bit
    // pair and fold with one reduce128.  hi2*EPS2 <= 24*(p-2^32) < 2^69.
    const __m512i EPS2 = _mm512_set1_epi64(0xFFFFFFFE00000001LL);
    __m512i h_hi;
    __m512i h_lo = v_mul_wide(acc.hi, vEPS(), &h_hi);
    __m512i h2_hi;
    __m512i h2_lo = v_mul_wide(acc.hi2, EPS2, &h2_hi);
    __m512i lo = _mm512_add_epi64(acc.lo, h_lo);
    __mmask8 c0 = _mm512_cmplt_epu64_mask(lo, h_lo);
    __m512i hi = _mm512_mask_add_epi64(h_hi, c0, h_hi,
                                       _mm512_set1_epi64(1));
    lo = _mm512_add_epi64(lo, h2_lo);
    __mmask8 c1 = _mm512_cmplt_epu64_mask(lo, h2_lo);
    hi = _mm512_mask_add_epi64(hi, c1, hi, _mm512_set1_epi64(1));
    hi = _mm512_add_epi64(hi, h2_hi);
    return v_reduce128(hi, lo);
}

#if defined(__AVX512IFMA__)
#define GL_HAVE_IFMA 1

// 52-bit-radix lazy dot products on the vpmadd52 units: operand x < 2^64
// splits as x0 + x1*2^52, constant m as m0 + m1*2^52, and each product
// accumulates into three 52-bit-chunk accumulators (r0 + r1*2^52 +
// r2*2^104) with SEVEN fused multiply-adds and no other ALU work.  Up to
// ~60 terms fit before the 64-bit accumulators can overflow (12-term MDS
// rows use it).  Final fold reuses v_acc_reduce via 2^64 = EPS, 2^128 =
// EPS^2 (mod p).
struct IAcc {
    __m512i r0, r1, r2;
};

static inline IAcc i_acc_zero() {
    IAcc a;
    a.r0 = a.r1 = a.r2 = _mm512_setzero_si512();
    return a;
}

static inline void i_split(__m512i x, __m512i* x0, __m512i* x1) {
    const __m512i M52 = _mm512_set1_epi64((1LL << 52) - 1);
    *x0 = _mm512_and_si512(x, M52);
    *x1 = _mm512_srli_epi64(x, 52);
}

static inline void i_acc_mul(IAcc& a, __m512i x0, __m512i x1, __m512i m0,
                             __m512i m1) {
    a.r0 = _mm512_madd52lo_epu64(a.r0, x0, m0);
    a.r1 = _mm512_madd52hi_epu64(a.r1, x0, m0);
    a.r1 = _mm512_madd52lo_epu64(a.r1, x0, m1);
    a.r1 = _mm512_madd52lo_epu64(a.r1, x1, m0);
    a.r2 = _mm512_madd52hi_epu64(a.r2, x0, m1);
    a.r2 = _mm512_madd52hi_epu64(a.r2, x1, m0);
    a.r2 = _mm512_madd52lo_epu64(a.r2, x1, m1);  // x1*m1 < 2^24, lo is exact
}

static inline __m512i i_acc_reduce(const IAcc& a) {
    // value = r0 + r1*2^52 + r2*2^104  ->  (lo, hi, hi2) base-2^64 limbs,
    // with explicit wrap carries on the middle limb
    const __m512i one = _mm512_set1_epi64(1);
    __m512i lo = _mm512_add_epi64(a.r0, _mm512_slli_epi64(a.r1, 52));
    __mmask8 c1 = _mm512_cmplt_epu64_mask(lo, a.r0);
    __m512i t = _mm512_slli_epi64(a.r2, 40);       // (r2 mod 2^24) << 40
    __m512i hi = _mm512_add_epi64(_mm512_srli_epi64(a.r1, 12), t);
    __mmask8 w1 = _mm512_cmplt_epu64_mask(hi, t);
    __m512i hi_c = _mm512_mask_add_epi64(hi, c1, hi, one);
    __mmask8 w2 = (__mmask8)(c1 & _mm512_cmpeq_epu64_mask(
        hi_c, _mm512_setzero_si512()));
    __m512i hi2 = _mm512_srli_epi64(a.r2, 24);
    hi2 = _mm512_mask_add_epi64(hi2, w1, hi2, one);
    hi2 = _mm512_mask_add_epi64(hi2, w2, hi2, one);
    VAcc v;
    v.lo = lo;
    v.hi = hi_c;
    v.hi2 = hi2;
    return v_acc_reduce(v);
}
#endif  // __AVX512IFMA__

}  // namespace glv

#endif  // __AVX512F__ && __AVX512DQ__
