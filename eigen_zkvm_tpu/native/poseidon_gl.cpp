// Native batched Poseidon-GL permutation (t=12, opt schedule) + Merkle levels.
//
// Host-side hot kernel: the CPU analog of the reference's AVX2/AVX512 packed
// Poseidon (fields/src/arch/x86_64/*, starky/src/arch/x86_64/*), written as
// plain C++ with __uint128_t multiplies so it builds anywhere g++ runs.
// Exposed via ctypes (see native/__init__.py); constants are passed in from
// Python once at load time so the binary carries no tables.
//
// Performance notes (2.1 GHz Xeon, 1 core): field ops are BRANCHLESS
// (data-dependent branches on carry/overflow are ~50/50 random -> ~20-cycle
// mispredicts that put the whole permutation on the dependent-latency path),
// and the permutation runs LANES=4 independent states interleaved so the
// 64x64->128 multiplier pipeline stays full across states.  ~7x over the
// naive scalar loop.
//
// Layout contracts match hash/poseidon_gl.py: state rows are [B, 12] u64,
// canonical (< p); C has 118 entries, M/P are [12][12] row-major with
// out[i] = sum_j mat[j][i] * state[j], S has 22*(2*12-1) entries.

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "gl_avx512.h"

using u64 = uint64_t;
using u128 = unsigned __int128;

static const u64 P = 0xFFFFFFFF00000001ULL;
static const u64 EPS = 0xFFFFFFFFULL;  // 2^64 mod p
static const int T = 12;
static const int HALF_F = 4;      // N_ROUNDS_F / 2
static const int N_P = 22;
static const int LANES = 4;       // states interleaved per call (ILP width)

static u64 g_C[118];
static u64 g_M[T][T];
static u64 g_Pm[T][T];
static u64 g_S[N_P * (2 * T - 1)];

// Branchless canonical add: inputs < p, output < p.  a+b < 2p < 2^65; on a
// 2^64 wrap the value is < 2^64 - 2^32 so the +EPS fixup cannot wrap again.
static inline u64 gl_add_bl(u64 a, u64 b) {
    u64 r = a + b;
    u64 wrap = (u64)(r < a);           // setc
    r += wrap * EPS;                   // no branch: flag * constant
    u64 ge = (u64)(r >= P);
    return r - ge * P;
}

// Branchless Goldilocks reduce of a 128-bit product, then canonical.
// 2^64 = 2^32 - 1 (mod p), 2^96 = -1 (mod p).
static inline u64 gl_mul(u64 a, u64 b) {
    u128 w = (u128)a * b;
    u64 lo = (u64)w;
    u64 hi = (u64)(w >> 64);
    u64 hi_lo = hi & EPS;
    u64 hi_hi = hi >> 32;
    u64 borrow = (u64)(lo < hi_hi);
    u64 t = lo - hi_hi - borrow * EPS;     // t = lo - hi_hi (mod p), < 2^64
    u64 t1 = (hi_lo << 32) - hi_lo;        // hi_lo * (2^32 - 1) < 2^64
    u64 r = t + t1;
    u64 carry = (u64)(r < t);
    r += carry * EPS;
    u64 ge = (u64)(r >= P);
    return r - ge * P;
}

static inline u64 gl_pow7(u64 x) {
    u64 x2 = gl_mul(x, x);
    u64 x3 = gl_mul(x2, x);
    u64 x6 = gl_mul(x3, x3);
    return gl_mul(x6, x);
}

// ---- lazy dot products -----------------------------------------------------
// A 12-term dot product accumulates raw 128-bit products into (lo: u64,
// hi: u128) WITHOUT per-term reduction: hi grows to at most 12 * 2^64 ~ 2^68.
// One final reduction folds the ~160-bit value:  with E = 2^32 - 1
// (2^64 mod p) and E2 = E^2 mod p = p - 2^32,
//   v = lo + hi_lo * E + hi_hi * E2   (< 2^97)   then one 128-bit reduce.
static const u64 EPS2 = 0xFFFFFFFE00000001ULL;  // (2^32-1)^2 mod p

struct Acc {
    u64 lo;
    u128 hi;
};

static inline void acc_mul(Acc& a, u64 x, u64 m) {
    u128 w = (u128)x * m;
    u64 wl = (u64)w;
    a.lo += wl;
    a.hi += (u64)(w >> 64);
    a.hi += (u64)(a.lo < wl);
}

static inline u64 reduce128(u128 w) {
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

static inline u64 acc_reduce(const Acc& a) {
    u64 hi_lo = (u64)a.hi;
    u64 hi_hi = (u64)(a.hi >> 64);            // <= ~16
    u128 v = (u128)a.lo + (u128)hi_lo * EPS + (u128)hi_hi * EPS2;
    return reduce128(v);
}

// ---------------------------------------------------------------------------
// Lane-interleaved permutation: st[i][l] = element i of state l.  Every inner
// loop runs the SAME op over LANES independent states so the multiplier
// pipelines instead of serializing on one state's dependency chain.
// ---------------------------------------------------------------------------

typedef u64 Lst[T][LANES];

static inline void mat_layer_lanes(Lst st, const u64 mat[T][T]) {
    u64 out[T][LANES];
    for (int i = 0; i < T; i++) {
        Acc acc[LANES] = {};
        for (int j = 0; j < T; j++) {
            const u64 m = mat[j][i];
            for (int l = 0; l < LANES; l++) acc_mul(acc[l], st[j][l], m);
        }
        for (int l = 0; l < LANES; l++) out[i][l] = acc_reduce(acc[l]);
    }
    std::memcpy(st, out, sizeof(out));
}

static void permute_lanes(Lst st) {
    for (int i = 0; i < T; i++)
        for (int l = 0; l < LANES; l++) st[i][l] = gl_add_bl(st[i][l], g_C[i]);

    for (int r = 0; r < HALF_F - 1; r++) {
        for (int i = 0; i < T; i++)
            for (int l = 0; l < LANES; l++) st[i][l] = gl_pow7(st[i][l]);
        for (int i = 0; i < T; i++)
            for (int l = 0; l < LANES; l++)
                st[i][l] = gl_add_bl(st[i][l], g_C[(r + 1) * T + i]);
        mat_layer_lanes(st, g_M);
    }
    for (int i = 0; i < T; i++)
        for (int l = 0; l < LANES; l++) st[i][l] = gl_pow7(st[i][l]);
    for (int i = 0; i < T; i++)
        for (int l = 0; l < LANES; l++)
            st[i][l] = gl_add_bl(st[i][l], g_C[HALF_F * T + i]);
    mat_layer_lanes(st, g_Pm);

    for (int r = 0; r < N_P; r++) {
        const u64* srow = &g_S[(2 * T - 1) * r];
        const u64* scol = &g_S[(2 * T - 1) * r + T];
        u64 s0[LANES];
        Acc new0[LANES] = {};
        for (int l = 0; l < LANES; l++)
            s0[l] = gl_add_bl(gl_pow7(st[0][l]), g_C[(HALF_F + 1) * T + r]);
        for (int l = 0; l < LANES; l++) acc_mul(new0[l], s0[l], srow[0]);
        for (int j = 1; j < T; j++)
            for (int l = 0; l < LANES; l++)
                acc_mul(new0[l], st[j][l], srow[j]);
        for (int k = 1; k < T; k++)
            for (int l = 0; l < LANES; l++)
                st[k][l] = gl_add_bl(st[k][l], gl_mul(s0[l], scol[k - 1]));
        for (int l = 0; l < LANES; l++) st[0][l] = acc_reduce(new0[l]);
    }

    int base = (HALF_F + 1) * T + N_P;
    for (int r = 0; r < HALF_F - 1; r++) {
        for (int i = 0; i < T; i++)
            for (int l = 0; l < LANES; l++) st[i][l] = gl_pow7(st[i][l]);
        for (int i = 0; i < T; i++)
            for (int l = 0; l < LANES; l++)
                st[i][l] = gl_add_bl(st[i][l], g_C[base + r * T + i]);
        mat_layer_lanes(st, g_M);
    }
    for (int i = 0; i < T; i++)
        for (int l = 0; l < LANES; l++) st[i][l] = gl_pow7(st[i][l]);
    mat_layer_lanes(st, g_M);
}

// ---------------------------------------------------------------------------
// AVX-512 path: 8 states per __m512i element vector (st[i] = element i of 8
// states).  Same schedule as permute_lanes; products via four vpmuludq
// halves, every fixup a compare-mask + masked add/sub (gl_avx512.h).
// ---------------------------------------------------------------------------
#ifdef GL_HAVE_AVX512

static bool have_avx512() {
    static const bool ok = __builtin_cpu_supports("avx512f")
        && __builtin_cpu_supports("avx512dq");
    return ok;
}

#ifdef GL_HAVE_IFMA
static bool have_ifma() {
    static const bool ok = __builtin_cpu_supports("avx512ifma");
    return ok;
}

// 52-bit splits of the matrix/sparse constants, filled by set_constants
static u64 g_M0[T][T], g_M1[T][T];
static u64 g_Pm0[T][T], g_Pm1[T][T];
static u64 g_S0[N_P * (2 * T - 1)], g_S1[N_P * (2 * T - 1)];

static inline void mat_v8_ifma(__m512i st[T], const u64 m0[T][T],
                               const u64 m1[T][T]) {
    __m512i xs0[T], xs1[T], out[T];
    for (int j = 0; j < T; j++) glv::i_split(st[j], &xs0[j], &xs1[j]);
    for (int i = 0; i < T; i++) {
        glv::IAcc acc = glv::i_acc_zero();
        for (int j = 0; j < T; j++)
            glv::i_acc_mul(acc, xs0[j], xs1[j],
                           _mm512_set1_epi64((long long)m0[j][i]),
                           _mm512_set1_epi64((long long)m1[j][i]));
        out[i] = glv::i_acc_reduce(acc);
    }
    std::memcpy(st, out, sizeof(out));
}
#endif

static inline void mat_v8(__m512i st[T], const u64 mat[T][T]) {
#ifdef GL_HAVE_IFMA
    if (have_ifma()) {
        if (mat == g_M) return mat_v8_ifma(st, g_M0, g_M1);
        if (mat == g_Pm) return mat_v8_ifma(st, g_Pm0, g_Pm1);
    }
#endif
    __m512i out[T];
    for (int i = 0; i < T; i++) {
        glv::VAcc acc = glv::v_acc_zero();
        for (int j = 0; j < T; j++)
            glv::v_acc_mul(acc, st[j],
                           _mm512_set1_epi64((long long)mat[j][i]));
        out[i] = glv::v_acc_reduce(acc);
    }
    std::memcpy(st, out, sizeof(out));
}

static void permute_v8(__m512i st[T]) {
    using namespace glv;
    for (int i = 0; i < T; i++)
        st[i] = v_add(st[i], _mm512_set1_epi64((long long)g_C[i]));

    for (int r = 0; r < HALF_F - 1; r++) {
        for (int i = 0; i < T; i++) st[i] = v_pow7(st[i]);
        for (int i = 0; i < T; i++)
            st[i] = v_add(st[i],
                          _mm512_set1_epi64((long long)g_C[(r + 1) * T + i]));
        mat_v8(st, g_M);
    }
    for (int i = 0; i < T; i++) st[i] = v_pow7(st[i]);
    for (int i = 0; i < T; i++)
        st[i] = v_add(st[i],
                      _mm512_set1_epi64((long long)g_C[HALF_F * T + i]));
    mat_v8(st, g_Pm);

    for (int r = 0; r < N_P; r++) {
        const u64* srow = &g_S[(2 * T - 1) * r];
        const u64* scol = &g_S[(2 * T - 1) * r + T];
        __m512i s0 = v_add(v_pow7(st[0]),
                           _mm512_set1_epi64(
                               (long long)g_C[(HALF_F + 1) * T + r]));
        __m512i new0_v;
#ifdef GL_HAVE_IFMA
        if (have_ifma()) {
            const u64* s0row = &g_S0[(2 * T - 1) * r];
            const u64* s1row = &g_S1[(2 * T - 1) * r];
            IAcc acc = i_acc_zero();
            __m512i a0, a1;
            i_split(s0, &a0, &a1);
            i_acc_mul(acc, a0, a1, _mm512_set1_epi64((long long)s0row[0]),
                      _mm512_set1_epi64((long long)s1row[0]));
            for (int j = 1; j < T; j++) {
                i_split(st[j], &a0, &a1);
                i_acc_mul(acc, a0, a1,
                          _mm512_set1_epi64((long long)s0row[j]),
                          _mm512_set1_epi64((long long)s1row[j]));
            }
            new0_v = i_acc_reduce(acc);
        } else
#endif
        {
            VAcc new0 = v_acc_zero();
            v_acc_mul(new0, s0, _mm512_set1_epi64((long long)srow[0]));
            for (int j = 1; j < T; j++)
                v_acc_mul(new0, st[j], _mm512_set1_epi64((long long)srow[j]));
            new0_v = v_acc_reduce(new0);
        }
        for (int k = 1; k < T; k++)
            st[k] = v_add(st[k],
                          v_mul(s0, _mm512_set1_epi64((long long)scol[k - 1])));
        st[0] = new0_v;
    }

    int base = (HALF_F + 1) * T + N_P;
    for (int r = 0; r < HALF_F - 1; r++) {
        for (int i = 0; i < T; i++) st[i] = v_pow7(st[i]);
        for (int i = 0; i < T; i++)
            st[i] = v_add(st[i],
                          _mm512_set1_epi64((long long)g_C[base + r * T + i]));
        mat_v8(st, g_M);
    }
    for (int i = 0; i < T; i++) st[i] = v_pow7(st[i]);
    mat_v8(st, g_M);
}

// rows: 8 state rows of `rowlen` u64 each; element i < n_el gathered across
// rows (never reads past row `rowlen` — callers zero the remaining st[i]).
static inline void load_v8(__m512i st[T], const u64* rows, size_t rowlen,
                           int n_el) {
    const __m512i vidx = _mm512_setr_epi64(
        0, (long long)rowlen, (long long)(2 * rowlen),
        (long long)(3 * rowlen), (long long)(4 * rowlen),
        (long long)(5 * rowlen), (long long)(6 * rowlen),
        (long long)(7 * rowlen));
    for (int i = 0; i < n_el; i++)
        st[i] = _mm512_i64gather_epi64(vidx, (const long long*)(rows + i), 8);
}

static inline void store_v8(const __m512i st[T], u64* rows, size_t rowlen,
                            int n_el) {
    const __m512i vidx = _mm512_setr_epi64(
        0, (long long)rowlen, (long long)(2 * rowlen),
        (long long)(3 * rowlen), (long long)(4 * rowlen),
        (long long)(5 * rowlen), (long long)(6 * rowlen),
        (long long)(7 * rowlen));
    for (int i = 0; i < n_el; i++)
        _mm512_i64scatter_epi64((long long*)(rows + i), vidx, st[i], 8);
}

#else
static bool have_avx512() { return false; }
#endif  // GL_HAVE_AVX512

// Scalar fallback for batch tails: one state = lane 0, rest zero-padded.
static void permute_one(u64* s) {
    Lst st;
    std::memset(st, 0, sizeof(st));
    for (int i = 0; i < T; i++) st[i][0] = s[i];
    permute_lanes(st);
    for (int i = 0; i < T; i++) s[i] = st[i][0];
}

// Gather/scatter between row-major [B, 12] and the lane layout.
static inline void load_lanes(Lst st, const u64* rows, size_t nl) {
    for (int i = 0; i < T; i++)
        for (size_t l = 0; l < (size_t)LANES; l++)
            st[i][l] = l < nl ? rows[l * T + i] : 0;
}

static inline void store_lanes(const Lst st, u64* rows, size_t nl) {
    for (size_t l = 0; l < nl; l++)
        for (int i = 0; i < T; i++) rows[l * T + i] = st[i][l];
}

extern "C" {

void poseidon_gl_set_constants(const u64* C, const u64* M, const u64* Pm,
                               const u64* S) {
    std::memcpy(g_C, C, sizeof(g_C));
    std::memcpy(g_M, M, sizeof(g_M));
    std::memcpy(g_Pm, Pm, sizeof(g_Pm));
    std::memcpy(g_S, S, sizeof(g_S));
#ifdef GL_HAVE_IFMA
    const u64 M52 = (1ULL << 52) - 1;
    for (int j = 0; j < T; j++)
        for (int i = 0; i < T; i++) {
            g_M0[j][i] = g_M[j][i] & M52;
            g_M1[j][i] = g_M[j][i] >> 52;
            g_Pm0[j][i] = g_Pm[j][i] & M52;
            g_Pm1[j][i] = g_Pm[j][i] >> 52;
        }
    for (int k = 0; k < N_P * (2 * T - 1); k++) {
        g_S0[k] = g_S[k] & M52;
        g_S1[k] = g_S[k] >> 52;
    }
#endif
}

// state: [B, 12] in-place permute
void poseidon_gl_permute_batch(u64* state, size_t B) {
    size_t b0 = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        size_t nb = B / 8;
        #pragma omp parallel for schedule(static) if (nb > 512 && omp_get_max_threads() > 1)
        for (size_t blk = 0; blk < nb; blk++) {
            __m512i st[T];
            load_v8(st, state + blk * 8 * T, T, T);
            permute_v8(st);
            store_v8(st, state + blk * 8 * T, T, T);
        }
        b0 = nb * 8;
    }
#endif
    for (; b0 < B; b0 += LANES) {
        size_t nl = B - b0 < (size_t)LANES ? B - b0 : LANES;
        Lst st;
        load_lanes(st, state + b0 * T, nl);
        permute_lanes(st);
        store_lanes(st, state + b0 * T, nl);
    }
}

// inp [B, 8], init [B, 4] -> out [B, 4]
void poseidon_gl_hash_n(const u64* inp, const u64* init, u64* out, size_t B) {
    size_t start = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        size_t nb = B / 8;
        #pragma omp parallel for schedule(static) if (nb > 512 && omp_get_max_threads() > 1)
        for (size_t blk = 0; blk < nb; blk++) {
            __m512i st[T];
            load_v8(st, inp + blk * 8 * 8, 8, 8);       // fills st[0..7]
            __m512i init4[4];
            load_v8(init4, init + blk * 8 * 4, 4, 4);
            for (int i = 0; i < 4; i++) st[8 + i] = init4[i];
            permute_v8(st);
            store_v8(st, out + blk * 8 * 4, 4, 4);
        }
        start = nb * 8;
    }
#endif
    for (size_t b0 = start; b0 < B; b0 += LANES) {
        size_t nl = B - b0 < (size_t)LANES ? B - b0 : LANES;
        Lst st;
        for (int i = 0; i < T; i++)
            for (size_t l = 0; l < (size_t)LANES; l++) {
                size_t b = b0 + l;
                st[i][l] = l < nl
                    ? (i < 8 ? inp[b * 8 + i] : init[b * 4 + (i - 8)]) : 0;
            }
        permute_lanes(st);
        for (size_t l = 0; l < nl; l++)
            for (int i = 0; i < 4; i++) out[(b0 + l) * 4 + i] = st[i][l];
    }
}

// Sponge-fold rows [B, w] -> digests [B, 4] (linearhash _hash semantics).
// All rows share w, so the chunk schedule is lane-uniform.
static void hash_rows(const u64* rows, size_t B, size_t w, u64* out) {
    if (w <= 4) {  // short rows: zero-padded copy, no permutation
        for (size_t b = 0; b < B; b++)
            for (size_t i = 0; i < 4; i++)
                out[b * 4 + i] = i < w ? rows[b * w + i] : 0;
        return;
    }
    size_t start = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        size_t nb = B / 8;
        #pragma omp parallel for schedule(static) if (nb > 512 && omp_get_max_threads() > 1)
        for (size_t blk = 0; blk < nb; blk++) {
            __m512i carry[4];
            for (int i = 0; i < 4; i++) carry[i] = _mm512_setzero_si512();
            size_t done = 0;
            while (done < w) {
                size_t take = w - done < 8 ? w - done : 8;
                __m512i st[T];
                load_v8(st, rows + blk * 8 * w + done, w, (int)take);
                for (size_t i = take; i < 8; i++)
                    st[i] = _mm512_setzero_si512();
                for (int i = 0; i < 4; i++) st[8 + i] = carry[i];
                permute_v8(st);
                for (int i = 0; i < 4; i++) carry[i] = st[i];
                done += take;
            }
            store_v8(carry, out + blk * 8 * 4, 4, 4);
        }
        start = nb * 8;
    }
#endif
    #pragma omp parallel for schedule(static) if (B > 4096 && omp_get_max_threads() > 1)
    for (size_t b0 = start; b0 < B; b0 += LANES) {
        size_t nl = B - b0 < (size_t)LANES ? B - b0 : LANES;
        u64 carry[LANES][4] = {};
        size_t done = 0;
        while (done < w) {
            size_t take = w - done < 8 ? w - done : 8;
            Lst st;
            for (int i = 0; i < 8; i++)
                for (size_t l = 0; l < (size_t)LANES; l++)
                    st[i][l] = (l < nl && (size_t)i < take)
                        ? rows[(b0 + l) * w + done + i] : 0;
            for (int i = 0; i < 4; i++)
                for (size_t l = 0; l < (size_t)LANES; l++)
                    st[8 + i][l] = carry[l][i];
            permute_lanes(st);
            for (size_t l = 0; l < nl; l++)
                for (int i = 0; i < 4; i++) carry[l][i] = st[i][l];
            done += take;
        }
        for (size_t l = 0; l < nl; l++)
            for (int i = 0; i < 4; i++) out[(b0 + l) * 4 + i] = carry[l][i];
    }
}

// Leaf hash rows [B, w] -> [B, 4] (linearhash.rs LinearHash::hash semantics)
void poseidon_gl_hash_leaves(const u64* rows, size_t B, size_t w, u64* out) {
    if (w == 0) {
        std::memset(out, 0, B * 4 * sizeof(u64));
        return;
    }
    if (w <= 4) {
        for (size_t b = 0; b < B; b++) {
            for (size_t i = 0; i < 4; i++)
                out[b * 4 + i] = i < w ? rows[b * w + i] : 0;
        }
        return;
    }
    size_t bs = (w + 3) / 4;             // ceil(w/4)
    if (bs < 8) bs = 8;
    size_t hsz = (w + bs - 1) / bs;      // number of chunks
    if (hsz == 1) {
        hash_rows(rows, B, w, out);
        return;
    }
    // chunked: hash each chunk, then fold the concatenated digests.
    // Chunk c has the same size for every row, so each chunk is one
    // lane-parallel hash_rows pass over a strided view; we copy the chunk
    // columns into a dense scratch to keep hash_rows' layout contract.
    u64* chunks = new u64[B * hsz * 4];
    u64* scratch = new u64[B * bs];
    for (size_t c = 0; c < hsz; c++) {
        size_t lo = c * bs;
        size_t csz = (c + 1) * bs < w ? bs : w - lo;
        for (size_t b = 0; b < B; b++)
            std::memcpy(scratch + b * csz, rows + b * w + lo,
                        csz * sizeof(u64));
        u64* cout = new u64[B * 4];
        hash_rows(scratch, B, csz, cout);
        for (size_t b = 0; b < B; b++)
            std::memcpy(chunks + (b * hsz + c) * 4, cout + b * 4,
                        4 * sizeof(u64));
        delete[] cout;
    }
    delete[] scratch;
    hash_rows(chunks, B, hsz * 4, out);
    delete[] chunks;
}

void poseidon_gl_merkle_level(const u64* nodes, size_t n_pairs, u64* out);

// Whole binary Merkle tree in one call: leaf rows [h, w] -> `out` packed
// as [leaf digests h x4][level1 n1 x4][...][root 1 x4], each level
// ceil(n/2) nodes with odd levels padded by a zero-digest sibling
// (hash/merkle_gl.py layout).  `out` must hold the full packed size.
void poseidon_gl_merkle_tree(const u64* rows, size_t h, size_t w, u64* out) {
    poseidon_gl_hash_leaves(rows, h, w, out);
    u64* cur = out;
    size_t n = h;
    u64 zero4[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    while (n > 1) {
        size_t next_n = (n - 1) / 2 + 1;
        u64* nxt = cur + n * 4;
        size_t pairs = n / 2;
        poseidon_gl_merkle_level(cur, pairs, nxt);
        if (n % 2) {  // odd: last node hashes against the zero digest
            u64 st[8];
            std::memcpy(st, cur + (n - 1) * 4, 4 * sizeof(u64));
            std::memcpy(st + 4, zero4, 4 * sizeof(u64));
            u64 one_out[4];
            poseidon_gl_merkle_level(st, 1, one_out);
            std::memcpy(nxt + pairs * 4, one_out, 4 * sizeof(u64));
        }
        cur = nxt;
        n = next_n;
    }
}

// One binary tree level: nodes [n, 4] (n even) -> out [n/2, 4]
void poseidon_gl_merkle_level(const u64* nodes, size_t n_pairs, u64* out) {
    size_t start = 0;
#ifdef GL_HAVE_AVX512
    if (have_avx512()) {
        size_t nb = n_pairs / 8;
        #pragma omp parallel for schedule(static) if (nb > 512 && omp_get_max_threads() > 1)
        for (size_t blk = 0; blk < nb; blk++) {
            __m512i st[T];
            load_v8(st, nodes + blk * 8 * 8, 8, 8);
            for (int i = 8; i < T; i++) st[i] = _mm512_setzero_si512();
            permute_v8(st);
            store_v8(st, out + blk * 8 * 4, 4, 4);
        }
        start = nb * 8;
    }
#endif
    #pragma omp parallel for schedule(static) if (n_pairs > 4096 && omp_get_max_threads() > 1)
    for (size_t p0 = start; p0 < n_pairs; p0 += LANES) {
        size_t nl = n_pairs - p0 < (size_t)LANES ? n_pairs - p0 : LANES;
        Lst st;
        for (int i = 0; i < T; i++)
            for (size_t l = 0; l < (size_t)LANES; l++)
                st[i][l] = (l < nl && i < 8) ? nodes[(p0 + l) * 8 + i] : 0;
        permute_lanes(st);
        for (size_t l = 0; l < nl; l++)
            for (int i = 0; i < 4; i++) out[(p0 + l) * 4 + i] = st[i][l];
    }
}

}  // extern "C"
