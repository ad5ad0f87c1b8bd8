// Native vectorized Goldilocks field ops + batched radix-2 NTT.
//
// Host-side hot kernels backing fields/gl64.py and poly/ntt.py: the numpy
// reference path spends ~100x the arithmetic cost on temporaries and
// 32-bit-split emulation of the 64x64->128 multiply; here each product is one
// mulx and every carry/overflow fixup is branchless (data-dependent branches
// are ~50/50 random -> mispredict storms; see poseidon_gl.cpp).
// Role analog in the reference: fields/src/arch/x86_64/* SIMD field ops and
// starky/src/fft.rs / fft_p.rs blocked FFTs.
//
// Layout contracts: all arrays are contiguous u64, canonical (< p) on entry
// and exit.  NTT operates in place on [N, K] row-major (column-batched,
// natural order in/out), twiddles are passed from Python's cached
// root-powers table so both engines share one table.

#include <cstdint>
#include <cstring>

#include "gl_avx512.h"

using u64 = uint64_t;
using u128 = unsigned __int128;

#ifdef GL_HAVE_AVX512
static bool have_avx512() {
    static const bool ok = __builtin_cpu_supports("avx512f")
        && __builtin_cpu_supports("avx512dq");
    return ok;
}
#endif

static const u64 P = 0xFFFFFFFF00000001ULL;
static const u64 EPS = 0xFFFFFFFFULL;  // 2^64 mod p

static inline u64 gl_add(u64 a, u64 b) {
    u64 r = a + b;
    u64 wrap = (u64)(r < a);
    r += wrap * EPS;
    u64 ge = (u64)(r >= P);
    return r - ge * P;
}

static inline u64 gl_sub(u64 a, u64 b) {
    u64 d = a - b;
    u64 borrow = (u64)(a < b);
    return d - borrow * EPS;
}

static inline u64 gl_mul(u64 a, u64 b) {
    u128 w = (u128)a * b;
    u64 lo = (u64)w;
    u64 hi = (u64)(w >> 64);
    u64 hi_lo = hi & EPS;
    u64 hi_hi = hi >> 32;
    u64 borrow = (u64)(lo < hi_hi);
    u64 t = lo - hi_hi - borrow * EPS;
    u64 t1 = (hi_lo << 32) - hi_lo;
    u64 r = t + t1;
    u64 carry = (u64)(r < t);
    r += carry * EPS;
    u64 ge = (u64)(r >= P);
    return r - ge * P;
}

extern "C" {

void gl_vec_add(const u64* a, const u64* b, u64* out, size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512())
        for (; i + 8 <= n; i += 8)
            _mm512_storeu_si512(out + i, glv::v_add(
                _mm512_loadu_si512(a + i), _mm512_loadu_si512(b + i)));
#endif
    for (; i < n; i++) out[i] = gl_add(a[i], b[i]);
}

void gl_vec_sub(const u64* a, const u64* b, u64* out, size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512())
        for (; i + 8 <= n; i += 8)
            _mm512_storeu_si512(out + i, glv::v_sub(
                _mm512_loadu_si512(a + i), _mm512_loadu_si512(b + i)));
#endif
    for (; i < n; i++) out[i] = gl_sub(a[i], b[i]);
}

void gl_vec_mul(const u64* a, const u64* b, u64* out, size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512())
        for (; i + 8 <= n; i += 8)
            _mm512_storeu_si512(out + i, glv::v_mul(
                _mm512_loadu_si512(a + i), _mm512_loadu_si512(b + i)));
#endif
    for (; i < n; i++) out[i] = gl_mul(a[i], b[i]);
}

void gl_vec_add_scalar(const u64* a, u64 s, u64* out, size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        const __m512i vs = _mm512_set1_epi64((long long)s);
        for (; i + 8 <= n; i += 8)
            _mm512_storeu_si512(out + i,
                                glv::v_add(_mm512_loadu_si512(a + i), vs));
    }
#endif
    for (; i < n; i++) out[i] = gl_add(a[i], s);
}

void gl_vec_sub_scalar(const u64* a, u64 s, u64* out, size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        const __m512i vs = _mm512_set1_epi64((long long)s);
        for (; i + 8 <= n; i += 8)
            _mm512_storeu_si512(out + i,
                                glv::v_sub(_mm512_loadu_si512(a + i), vs));
    }
#endif
    for (; i < n; i++) out[i] = gl_sub(a[i], s);
}

void gl_vec_rsub_scalar(u64 s, const u64* a, u64* out, size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        const __m512i vs = _mm512_set1_epi64((long long)s);
        for (; i + 8 <= n; i += 8)
            _mm512_storeu_si512(out + i,
                                glv::v_sub(vs, _mm512_loadu_si512(a + i)));
    }
#endif
    for (; i < n; i++) out[i] = gl_sub(s, a[i]);
}

void gl_vec_mul_scalar(const u64* a, u64 s, u64* out, size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        const __m512i vs = _mm512_set1_epi64((long long)s);
        for (; i + 8 <= n; i += 8)
            _mm512_storeu_si512(out + i,
                                glv::v_mul(_mm512_loadu_si512(a + i), vs));
    }
#endif
    for (; i < n; i++) out[i] = gl_mul(a[i], s);
}

// out[i] = a[i] * b[i] + c[i]
void gl_vec_muladd(const u64* a, const u64* b, const u64* c, u64* out,
                   size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512())
        for (; i + 8 <= n; i += 8)
            _mm512_storeu_si512(out + i, glv::v_add(
                glv::v_mul(_mm512_loadu_si512(a + i),
                           _mm512_loadu_si512(b + i)),
                _mm512_loadu_si512(c + i)));
#endif
    for (; i < n; i++) out[i] = gl_add(gl_mul(a[i], b[i]), c[i]);
}

// ---- GF(p^3) extension ops on interleaved [n, 3] triples ------------------
// One call replaces the ~12 Python-level base-field calls (plus the strided
// component copies) of fields/f3g.py mul — the dominant overhead of the FRI
// fold and opening passes at small N.  Karatsuba-style schedule matches
// f3g.py / the reference's f3g.rs exactly.

void gl_f3_mul(const u64* a, const u64* b, u64* out, size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        const __m512i tidx = _mm512_setr_epi64(0, 3, 6, 9, 12, 15, 18, 21);
        for (; i + 8 <= n; i += 8) {
            const long long* ap = (const long long*)(a + 3 * i);
            const long long* bp = (const long long*)(b + 3 * i);
            __m512i a0 = _mm512_i64gather_epi64(tidx, ap, 8);
            __m512i a1 = _mm512_i64gather_epi64(tidx, ap + 1, 8);
            __m512i a2 = _mm512_i64gather_epi64(tidx, ap + 2, 8);
            __m512i b0 = _mm512_i64gather_epi64(tidx, bp, 8);
            __m512i b1 = _mm512_i64gather_epi64(tidx, bp + 1, 8);
            __m512i b2 = _mm512_i64gather_epi64(tidx, bp + 2, 8);
            __m512i aa = glv::v_mul(glv::v_add(a0, a1), glv::v_add(b0, b1));
            __m512i bb = glv::v_mul(glv::v_add(a0, a2), glv::v_add(b0, b2));
            __m512i cc = glv::v_mul(glv::v_add(a1, a2), glv::v_add(b1, b2));
            __m512i dd = glv::v_mul(a0, b0);
            __m512i ee = glv::v_mul(a1, b1);
            __m512i ff = glv::v_mul(a2, b2);
            __m512i gg = glv::v_sub(dd, ee);
            __m512i c0 = glv::v_sub(glv::v_add(cc, gg), ff);
            __m512i c1 = glv::v_sub(glv::v_add(aa, cc),
                                    glv::v_add(glv::v_add(ee, ee), dd));
            __m512i c2 = glv::v_sub(bb, gg);
            long long* op = (long long*)(out + 3 * i);
            _mm512_i64scatter_epi64(op, tidx, c0, 8);
            _mm512_i64scatter_epi64(op + 1, tidx, c1, 8);
            _mm512_i64scatter_epi64(op + 2, tidx, c2, 8);
        }
    }
#endif
    for (; i < n; i++) {
        const u64* x = a + 3 * i;
        const u64* y = b + 3 * i;
        u64 aa = gl_mul(gl_add(x[0], x[1]), gl_add(y[0], y[1]));
        u64 bb = gl_mul(gl_add(x[0], x[2]), gl_add(y[0], y[2]));
        u64 cc = gl_mul(gl_add(x[1], x[2]), gl_add(y[1], y[2]));
        u64 dd = gl_mul(x[0], y[0]);
        u64 ee = gl_mul(x[1], y[1]);
        u64 ff = gl_mul(x[2], y[2]);
        u64 gg = gl_sub(dd, ee);
        out[3 * i + 0] = gl_sub(gl_add(cc, gg), ff);
        out[3 * i + 1] = gl_sub(gl_add(aa, cc), gl_add(gl_add(ee, ee), dd));
        out[3 * i + 2] = gl_sub(bb, gg);
    }
}

// out[i, :] = a[i, :] * s[i]  (base-field scale of each triple)
void gl_f3_mul_base(const u64* a, const u64* s, u64* out, size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        const __m512i tidx = _mm512_setr_epi64(0, 3, 6, 9, 12, 15, 18, 21);
        for (; i + 8 <= n; i += 8) {
            const long long* ap = (const long long*)(a + 3 * i);
            long long* op = (long long*)(out + 3 * i);
            __m512i sc = _mm512_loadu_si512(s + i);
            for (int c = 0; c < 3; c++) {
                __m512i v = _mm512_i64gather_epi64(tidx, ap + c, 8);
                _mm512_i64scatter_epi64(op + c, tidx, glv::v_mul(v, sc), 8);
            }
        }
    }
#endif
    for (; i < n; i++) {
        u64 sc = s[i];
        out[3 * i + 0] = gl_mul(a[3 * i + 0], sc);
        out[3 * i + 1] = gl_mul(a[3 * i + 1], sc);
        out[3 * i + 2] = gl_mul(a[3 * i + 2], sc);
    }
}

// out[i, :] = a[i, :] * t  for one fixed triple t (challenge/eval operand)
void gl_f3_mul_triple(const u64* a, const u64* t, u64* out, size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        const __m512i tidx = _mm512_setr_epi64(0, 3, 6, 9, 12, 15, 18, 21);
        const __m512i b0 = _mm512_set1_epi64((long long)t[0]);
        const __m512i b1 = _mm512_set1_epi64((long long)t[1]);
        const __m512i b2 = _mm512_set1_epi64((long long)t[2]);
        const __m512i b01 = glv::v_add(b0, b1);
        const __m512i b02 = glv::v_add(b0, b2);
        const __m512i b12 = glv::v_add(b1, b2);
        for (; i + 8 <= n; i += 8) {
            const long long* ap = (const long long*)(a + 3 * i);
            __m512i a0 = _mm512_i64gather_epi64(tidx, ap, 8);
            __m512i a1 = _mm512_i64gather_epi64(tidx, ap + 1, 8);
            __m512i a2 = _mm512_i64gather_epi64(tidx, ap + 2, 8);
            __m512i aa = glv::v_mul(glv::v_add(a0, a1), b01);
            __m512i bb = glv::v_mul(glv::v_add(a0, a2), b02);
            __m512i cc = glv::v_mul(glv::v_add(a1, a2), b12);
            __m512i dd = glv::v_mul(a0, b0);
            __m512i ee = glv::v_mul(a1, b1);
            __m512i ff = glv::v_mul(a2, b2);
            __m512i gg = glv::v_sub(dd, ee);
            __m512i c0 = glv::v_sub(glv::v_add(cc, gg), ff);
            __m512i c1 = glv::v_sub(glv::v_add(aa, cc),
                                    glv::v_add(glv::v_add(ee, ee), dd));
            __m512i c2 = glv::v_sub(bb, gg);
            long long* op = (long long*)(out + 3 * i);
            _mm512_i64scatter_epi64(op, tidx, c0, 8);
            _mm512_i64scatter_epi64(op + 1, tidx, c1, 8);
            _mm512_i64scatter_epi64(op + 2, tidx, c2, 8);
        }
    }
#endif
    for (; i < n; i++) {
        const u64* x = a + 3 * i;
        u64 aa = gl_mul(gl_add(x[0], x[1]), gl_add(t[0], t[1]));
        u64 bb = gl_mul(gl_add(x[0], x[2]), gl_add(t[0], t[2]));
        u64 cc = gl_mul(gl_add(x[1], x[2]), gl_add(t[1], t[2]));
        u64 dd = gl_mul(x[0], t[0]);
        u64 ee = gl_mul(x[1], t[1]);
        u64 ff = gl_mul(x[2], t[2]);
        u64 gg = gl_sub(dd, ee);
        out[3 * i + 0] = gl_sub(gl_add(cc, gg), ff);
        out[3 * i + 1] = gl_sub(gl_add(aa, cc), gl_add(gl_add(ee, ee), dd));
        out[3 * i + 2] = gl_sub(bb, gg);
    }
}

// out[i, j] = a[i, j] * s[i] — row scaling for any row width k (the
// [.., k] x [.., 1] broadcast of coefficient/quotient scaling).  Contiguous
// single pass; the k >= 8 inner loop vectorizes, small k relies on
// cross-iteration ILP of the branchless scalar mul.
void gl_vec_mul_rows(const u64* a, const u64* s, u64* out, size_t n,
                     size_t k) {
    for (size_t i = 0; i < n; i++) {
        u64 sc = s[i];
        const u64* row = a + i * k;
        u64* orow = out + i * k;
        size_t j = 0;
#ifdef GL_HAVE_AVX512
        if (k >= 8 && have_avx512()) {
            const __m512i vs = _mm512_set1_epi64((long long)sc);
            for (; j + 8 <= k; j += 8)
                _mm512_storeu_si512(orow + j,
                                    glv::v_mul(_mm512_loadu_si512(row + j),
                                               vs));
        }
#endif
        for (; j < k; j++) orow[j] = gl_mul(row[j], sc);
    }
}

// out[i] = p - a[i] (0 -> 0)
void gl_vec_neg(const u64* a, u64* out, size_t n) {
    size_t i = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        const __m512i vp = glv::vP();
        const __m512i z = _mm512_setzero_si512();
        for (; i + 8 <= n; i += 8) {
            __m512i v = _mm512_loadu_si512(a + i);
            __mmask8 nz = _mm512_cmpneq_epu64_mask(v, z);
            _mm512_storeu_si512(out + i,
                                _mm512_maskz_sub_epi64(nz, vp, v));
        }
    }
#endif
    for (; i < n; i++) out[i] = a[i] ? P - a[i] : 0;
}

// Inclusive prefix product along a flat array (serial dependency).
void gl_vec_prefix_product(const u64* a, u64* out, size_t n) {
    u64 acc = 1;
    for (size_t i = 0; i < n; i++) {
        acc = gl_mul(acc, a[i]);
        out[i] = acc;
    }
}

// In-place batched NTT: data [n, k] row-major, natural order in/out.
// pows = [w^0 .. w^(n-1)] for the canonical 2^nbits root, rev = bit-reverse
// permutation of 0..n-1 (both from Python's cached tables).
// One DIT stage (size m) over rows [row_lo, row_hi) of the [n, k]
// buffer.  Twiddle stride is n/m into the full `pows` table, so the
// blocked caller produces bit-identical results to the breadth-first
// form (same butterflies, same order within a stage).
static void gl_ntt_stage(u64* data, size_t n, size_t k, const u64* pows,
                         size_t m, size_t row_lo, size_t row_hi) {
    {
        size_t half = m >> 1;
        size_t step = n / m;  // twiddle stride
        for (size_t base = row_lo; base < row_hi; base += m) {
            size_t j = 0;
#ifdef GL_HAVE_AVX512
            if (have_avx512() && k == 1 && half >= 8) {
                // column count 1: rows are single u64s, so lo/hi runs are
                // contiguous across j; twiddles gathered with stride `step`.
                const __m512i tidx = _mm512_setr_epi64(
                    0, (long long)step, (long long)(2 * step),
                    (long long)(3 * step), (long long)(4 * step),
                    (long long)(5 * step), (long long)(6 * step),
                    (long long)(7 * step));
                for (; j + 8 <= half; j += 8) {
                    u64* lo = data + base + j;
                    u64* hi = data + base + j + half;
                    __m512i tw = _mm512_i64gather_epi64(
                        tidx, (const long long*)(pows + j * step), 8);
                    __m512i t = glv::v_mul(_mm512_loadu_si512(hi), tw);
                    __m512i l = _mm512_loadu_si512(lo);
                    _mm512_storeu_si512(lo, glv::v_add(l, t));
                    _mm512_storeu_si512(hi, glv::v_sub(l, t));
                }
            } else if (have_avx512() && k < 8 && half >= 8) {
                // small column counts (F3 triples etc.): gather each column
                // across 8 butterflies with stride k.
                const __m512i tidx = _mm512_setr_epi64(
                    0, (long long)step, (long long)(2 * step),
                    (long long)(3 * step), (long long)(4 * step),
                    (long long)(5 * step), (long long)(6 * step),
                    (long long)(7 * step));
                const __m512i ridx = _mm512_setr_epi64(
                    0, (long long)k, (long long)(2 * k), (long long)(3 * k),
                    (long long)(4 * k), (long long)(5 * k),
                    (long long)(6 * k), (long long)(7 * k));
                for (; j + 8 <= half; j += 8) {
                    __m512i tw = _mm512_i64gather_epi64(
                        tidx, (const long long*)(pows + j * step), 8);
                    for (size_t c = 0; c < k; c++) {
                        u64* lo = data + (base + j) * k + c;
                        u64* hi = data + (base + j + half) * k + c;
                        __m512i hv = _mm512_i64gather_epi64(
                            ridx, (const long long*)hi, 8);
                        __m512i lv = _mm512_i64gather_epi64(
                            ridx, (const long long*)lo, 8);
                        __m512i t = glv::v_mul(hv, tw);
                        _mm512_i64scatter_epi64((long long*)lo, ridx,
                                                glv::v_add(lv, t), 8);
                        _mm512_i64scatter_epi64((long long*)hi, ridx,
                                                glv::v_sub(lv, t), 8);
                    }
                }
            } else if (have_avx512() && k >= 8) {
                for (; j < half; j++) {
                    const __m512i tw =
                        _mm512_set1_epi64((long long)pows[j * step]);
                    u64* lo = data + (base + j) * k;
                    u64* hi = data + (base + j + half) * k;
                    size_t c = 0;
                    for (; c + 8 <= k; c += 8) {
                        __m512i t = glv::v_mul(_mm512_loadu_si512(hi + c), tw);
                        __m512i l = _mm512_loadu_si512(lo + c);
                        _mm512_storeu_si512(lo + c, glv::v_add(l, t));
                        _mm512_storeu_si512(hi + c, glv::v_sub(l, t));
                    }
                    for (; c < k; c++) {
                        u64 t = gl_mul(hi[c], pows[j * step]);
                        u64 l = lo[c];
                        lo[c] = gl_add(l, t);
                        hi[c] = gl_sub(l, t);
                    }
                }
            }
#endif
            for (; j < half; j++) {
                u64 tw = pows[j * step];
                u64* lo = data + (base + j) * k;
                u64* hi = data + (base + j + half) * k;
                for (size_t c = 0; c < k; c++) {
                    u64 t = gl_mul(hi[c], tw);
                    u64 l = lo[c];
                    lo[c] = gl_add(l, t);
                    hi[c] = gl_sub(l, t);
                }
            }
        }
    }
}

static u64 gl_exp_scalar(u64 b, u64 e) {
    u64 r = 1;
    while (e) {
        if (e & 1) r = gl_mul(r, b);
        b = gl_mul(b, b);
        e >>= 1;
    }
    return r;
}

// out[i] = x[i] / (x[i] - point) over GF(p^3) with x base-field [n] and
// point = (p0, p1, p2): den_i = (x_i - p0, -p1, -p2).  The prover's
// xDivXSubXi/xDivXSubWXi pass (stark_gen.rs:487-522 role) — adjugate
// numerators per element, ONE Montgomery-batched norm inversion, then
// out_c = adj_c * t^-1 * x.  Bit-identical to fields/f3g.py inv +
// mul_base (canonical values; same formula).  `scratch`: caller-provided
// [2n] u64 workspace.
void gl_f3_xdiv(const u64* x, const u64* point, u64* out, u64* scratch,
                size_t n) {
    u64 p0 = point[0];
    u64 a1 = gl_sub(0, point[1]);
    u64 a2 = gl_sub(0, point[2]);
    u64 bb = gl_mul(a1, a1);
    u64 cc = gl_mul(a2, a2);
    u64 bc = gl_mul(a1, a2);
    u64 bbb = gl_mul(bb, a1);
    u64 bcc = gl_mul(bc, a2);
    u64 ccc = gl_mul(cc, a2);
    u64* tbuf = scratch;
    u64* pre = scratch + n;
    u64 acc = 1;
    for (size_t i = 0; i < n; i++) {
        u64 a0 = gl_sub(x[i], p0);
        u64 aa = gl_mul(a0, a0);
        u64 ac = gl_mul(a0, a2);
        u64 ba = gl_mul(a1, a0);
        u64 aaa = gl_mul(aa, a0);
        u64 aac = gl_mul(aa, a2);
        u64 abc = gl_mul(ba, a2);
        u64 abb = gl_mul(ba, a1);
        u64 acc2 = gl_mul(ac, a2);
        u64 t = gl_sub(0, aaa);
        t = gl_sub(t, aac);
        t = gl_sub(t, aac);
        t = gl_add(t, abc);
        t = gl_add(t, abc);
        t = gl_add(t, abc);
        t = gl_add(t, abb);
        t = gl_sub(t, acc2);
        t = gl_sub(t, bbb);
        t = gl_add(t, bcc);
        t = gl_sub(t, ccc);
        u64 i1 = gl_sub(0, aa);
        i1 = gl_sub(i1, ac);
        i1 = gl_sub(i1, ac);
        i1 = gl_add(i1, bc);
        i1 = gl_add(i1, bb);
        i1 = gl_sub(i1, cc);
        u64 i2 = gl_sub(ba, cc);
        u64 i3 = gl_add(gl_sub(ac, bb), cc);
        out[3 * i] = i1;
        out[3 * i + 1] = i2;
        out[3 * i + 2] = i3;
        tbuf[i] = t;
        acc = gl_mul(acc, t);
        pre[i] = acc;
    }
    if (acc == 0) {
        // a zero norm somewhere (x == xi, measure-zero): per-element
        // inverses so the poisoned batch does not corrupt the rest
        for (size_t i = 0; i < n; i++) {
            u64 s = gl_mul(gl_exp_scalar(tbuf[i], P - 2), x[i]);
            out[3 * i] = gl_mul(out[3 * i], s);
            out[3 * i + 1] = gl_mul(out[3 * i + 1], s);
            out[3 * i + 2] = gl_mul(out[3 * i + 2], s);
        }
        return;
    }
    u64 invall = gl_exp_scalar(acc, P - 2);
    for (size_t i = n; i-- > 0;) {
        u64 tinv = i ? gl_mul(invall, pre[i - 1]) : invall;
        invall = gl_mul(invall, tbuf[i]);
        u64 s = gl_mul(tinv, x[i]);
        out[3 * i] = gl_mul(out[3 * i], s);
        out[3 * i + 1] = gl_mul(out[3 * i + 1], s);
        out[3 * i + 2] = gl_mul(out[3 * i + 2], s);
    }
}

// Openings dot product (stark_gen evals): out3 = sum_i L[i] * v_i where
// L is [n, 3] extension rows and v_i is row i*stride + off of a [.., w]
// buffer — dim 1 (base column: 3 base muls/row) or dim 3 (full F3
// product).  Accumulates in five 64-bit lanes mod p (gl_add per row).
void gl_f3_dot(const u64* l, const u64* buf, size_t stride, size_t off,
               size_t w, size_t n, int dim, u64* out3) {
    u64 acc0 = 0, acc1 = 0, acc2 = 0;
    if (dim == 1) {
        for (size_t i = 0; i < n; i++) {
            u64 v = buf[i * stride * w + off];
            acc0 = gl_add(acc0, gl_mul(l[3 * i], v));
            acc1 = gl_add(acc1, gl_mul(l[3 * i + 1], v));
            acc2 = gl_add(acc2, gl_mul(l[3 * i + 2], v));
        }
    } else {
        for (size_t i = 0; i < n; i++) {
            const u64* v = buf + i * stride * w + off;
            u64 a0 = v[0], a1 = v[1], a2 = v[2];
            u64 b0 = l[3 * i], b1 = l[3 * i + 1], b2 = l[3 * i + 2];
            // f3g.mul (Karatsuba form, fields/f3g.py)
            u64 aa = gl_mul(gl_add(a0, a1), gl_add(b0, b1));
            u64 bb = gl_mul(gl_add(a0, a2), gl_add(b0, b2));
            u64 cc = gl_mul(gl_add(a1, a2), gl_add(b1, b2));
            u64 dd = gl_mul(a0, b0);
            u64 ee = gl_mul(a1, b1);
            u64 ff = gl_mul(a2, b2);
            u64 gg = gl_sub(dd, ee);
            acc0 = gl_add(acc0, gl_sub(gl_add(cc, gg), ff));
            acc1 = gl_add(acc1, gl_sub(gl_add(aa, cc),
                                       gl_add(gl_add(ee, ee), dd)));
            acc2 = gl_add(acc2, gl_sub(bb, gg));
        }
    }
    out3[0] = acc0;
    out3[1] = acc1;
    out3[2] = acc2;
}

void gl_ntt(u64* data, size_t n, size_t k, const u64* pows, const u64* rev) {
    // bit-reverse permute rows (rev is an involution: swap i < rev[i])
    for (size_t i = 0; i < n; i++) {
        size_t j = (size_t)rev[i];
        if (j > i) {
            for (size_t c = 0; c < k; c++) {
                u64 t = data[i * k + c];
                data[i * k + c] = data[j * k + c];
                data[j * k + c] = t;
            }
        }
    }
    // Cache blocking: after the bit-reverse, a stage of size m only
    // couples rows within aligned m-row groups, so every stage with
    // m <= BLOCK runs inside one BLOCK-row window while it is hot in
    // L2 — ONE pass over the array for the first log2(BLOCK) stages
    // instead of one pass per stage (the breadth-first form's 2^23-row
    // transform paid ~13 avoidable DRAM sweeps).  Butterfly order
    // within each stage is unchanged -> bit-identical results.
    size_t block_rows = 1;
    {
        // target ~1 MB of row data per window (half of a 2 MB L2)
        size_t target = (1u << 20) / (k * sizeof(u64));
        while (block_rows * 2 <= target && block_rows * 2 <= n)
            block_rows <<= 1;
    }
    if (block_rows >= 2 && block_rows <= n) {
        for (size_t blk = 0; blk < n; blk += block_rows)
            for (size_t m = 2; m <= block_rows; m <<= 1)
                gl_ntt_stage(data, n, k, pows, m, blk, blk + block_rows);
    }
    for (size_t m = block_rows << 1; m <= n; m <<= 1)
        gl_ntt_stage(data, n, k, pows, m, 0, n);
}

}  // extern "C"
