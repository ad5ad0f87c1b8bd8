// Native batched Poseidon-GL permutation (t=12, opt schedule) + Merkle levels.
//
// Host-side hot kernel: the CPU analog of the reference's AVX2/AVX512 packed
// Poseidon (fields/src/arch/x86_64/*, starky/src/arch/x86_64/*), written as
// plain C++ with __uint128_t multiplies so it builds anywhere g++ runs.
// Exposed via ctypes (see native/build.py); constants are passed in from
// Python once at load time so the binary carries no tables.
//
// Layout contracts match hash/poseidon_gl.py: state rows are [B, 12] u64,
// canonical (< p); C has 118 entries, M/P are [12][12] row-major with
// out[i] = sum_j mat[j][i] * state[j], S has 22*(2*12-1) entries.

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

using u64 = uint64_t;
using u128 = unsigned __int128;

static const u64 P = 0xFFFFFFFF00000001ULL;
static const int T = 12;
static const int HALF_F = 4;      // N_ROUNDS_F / 2
static const int N_P = 22;

static u64 g_C[118];
static u64 g_M[T][T];
static u64 g_Pm[T][T];
static u64 g_S[N_P * (2 * T - 1)];

static inline u64 gl_add(u64 a, u64 b) {
    u64 r = a + b;
    if (r < a) r += 0xFFFFFFFFULL;  // wrapped past 2^64: add 2^64 - p
    else if (r >= P) r -= P;
    return r;
}

static inline u64 gl_mul(u64 a, u64 b) {
    u128 w = (u128)a * b;
    u64 lo = (u64)w;
    u64 hi = (u64)(w >> 64);
    u64 hi_lo = hi & 0xFFFFFFFFULL;
    u64 hi_hi = hi >> 32;
    // n mod p with 2^64 = 2^32 - 1, 2^96 = -1
    u64 t = lo - hi_hi;
    if (lo < hi_hi) t -= 0xFFFFFFFFULL;  // borrow: subtract 2^32-1 (mod 2^64 wrap)
    u64 t1 = (hi_lo << 32) - hi_lo;
    u64 r = t + t1;
    if (r < t) r += 0xFFFFFFFFULL;       // carry: add 2^32-1
    if (r >= P) r -= P;
    return r;
}

static inline u64 gl_pow7(u64 x) {
    u64 x2 = gl_mul(x, x);
    u64 x3 = gl_mul(x2, x);
    u64 x6 = gl_mul(x3, x3);
    return gl_mul(x6, x);
}

static inline void mat_layer(u64* st, const u64 mat[T][T]) {
    u64 out[T];
    for (int i = 0; i < T; i++) {
        u64 acc = 0;
        for (int j = 0; j < T; j++) acc = gl_add(acc, gl_mul(st[j], mat[j][i]));
        out[i] = acc;
    }
    std::memcpy(st, out, sizeof(out));
}

static void permute_one(u64* st) {
    for (int i = 0; i < T; i++) st[i] = gl_add(st[i], g_C[i]);

    for (int r = 0; r < HALF_F - 1; r++) {
        for (int i = 0; i < T; i++) st[i] = gl_pow7(st[i]);
        for (int i = 0; i < T; i++) st[i] = gl_add(st[i], g_C[(r + 1) * T + i]);
        mat_layer(st, g_M);
    }
    for (int i = 0; i < T; i++) st[i] = gl_pow7(st[i]);
    for (int i = 0; i < T; i++) st[i] = gl_add(st[i], g_C[HALF_F * T + i]);
    mat_layer(st, g_Pm);

    for (int r = 0; r < N_P; r++) {
        u64 s0 = gl_pow7(st[0]);
        s0 = gl_add(s0, g_C[(HALF_F + 1) * T + r]);
        st[0] = s0;
        const u64* srow = &g_S[(2 * T - 1) * r];
        u64 new0 = 0;
        for (int j = 0; j < T; j++) new0 = gl_add(new0, gl_mul(st[j], srow[j]));
        const u64* scol = &g_S[(2 * T - 1) * r + T];
        for (int k = 1; k < T; k++)
            st[k] = gl_add(st[k], gl_mul(s0, scol[k - 1]));
        st[0] = new0;
    }

    int base = (HALF_F + 1) * T + N_P;
    for (int r = 0; r < HALF_F - 1; r++) {
        for (int i = 0; i < T; i++) st[i] = gl_pow7(st[i]);
        for (int i = 0; i < T; i++) st[i] = gl_add(st[i], g_C[base + r * T + i]);
        mat_layer(st, g_M);
    }
    for (int i = 0; i < T; i++) st[i] = gl_pow7(st[i]);
    mat_layer(st, g_M);
}

extern "C" {

void poseidon_gl_set_constants(const u64* C, const u64* M, const u64* Pm,
                               const u64* S) {
    std::memcpy(g_C, C, sizeof(g_C));
    std::memcpy(g_M, M, sizeof(g_M));
    std::memcpy(g_Pm, Pm, sizeof(g_Pm));
    std::memcpy(g_S, S, sizeof(g_S));
}

// state: [B, 12] in-place permute
void poseidon_gl_permute_batch(u64* state, size_t B) {
    #pragma omp parallel for schedule(static) if (B > 256)
    for (size_t b = 0; b < B; b++) permute_one(state + b * T);
}

// inp [B, 8], init [B, 4] -> out [B, 4]
void poseidon_gl_hash_n(const u64* inp, const u64* init, u64* out, size_t B) {
    #pragma omp parallel for schedule(static) if (B > 256)
    for (size_t b = 0; b < B; b++) {
        u64 st[T];
        std::memcpy(st, inp + b * 8, 8 * sizeof(u64));
        std::memcpy(st + 8, init + b * 4, 4 * sizeof(u64));
        permute_one(st);
        std::memcpy(out + b * 4, st, 4 * sizeof(u64));
    }
}

// Sponge-fold rows [B, w] -> digests [B, 4] (linearhash _hash semantics, w > 4)
static void hash_rows(const u64* rows, size_t B, size_t w, u64* out) {
    if (w <= 4) {  // short rows: zero-padded copy, no permutation
        for (size_t b = 0; b < B; b++)
            for (size_t i = 0; i < 4; i++)
                out[b * 4 + i] = i < w ? rows[b * w + i] : 0;
        return;
    }
    #pragma omp parallel for schedule(static) if (B > 256)
    for (size_t b = 0; b < B; b++) {
        u64 st[T] = {0};
        const u64* row = rows + b * w;
        size_t done = 0;
        u64 carry[4] = {0, 0, 0, 0};
        while (done < w) {
            size_t take = w - done < 8 ? w - done : 8;
            for (size_t i = 0; i < 8; i++) st[i] = i < take ? row[done + i] : 0;
            std::memcpy(st + 8, carry, 4 * sizeof(u64));
            permute_one(st);
            std::memcpy(carry, st, 4 * sizeof(u64));
            done += take;
        }
        std::memcpy(out + b * 4, carry, 4 * sizeof(u64));
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
    // chunked: hash each chunk, then fold the concatenated digests
    u64* chunks = new u64[B * hsz * 4];
    #pragma omp parallel for schedule(static) if (B > 256)
    for (size_t b = 0; b < B; b++) {
        u64 tmp[4];
        const u64* row = rows + b * w;
        for (size_t c = 0; c < hsz; c++) {
            size_t lo = c * bs;
            size_t hisz = (c + 1) * bs < w ? bs : w - lo;
            hash_rows(row + lo, 1, hisz, tmp);
            std::memcpy(chunks + (b * hsz + c) * 4, tmp, 4 * sizeof(u64));
        }
    }
    hash_rows(chunks, B, hsz * 4, out);
    delete[] chunks;
}

// One binary tree level: nodes [n, 4] (n even) -> out [n/2, 4]
void poseidon_gl_merkle_level(const u64* nodes, size_t n_pairs, u64* out) {
    #pragma omp parallel for schedule(static) if (n_pairs > 256)
    for (size_t i = 0; i < n_pairs; i++) {
        u64 st[T];
        std::memcpy(st, nodes + i * 8, 8 * sizeof(u64));
        std::memset(st + 8, 0, 4 * sizeof(u64));
        permute_one(st);
        std::memcpy(out + i * 4, st, 4 * sizeof(u64));
    }
}

}  // extern "C"
