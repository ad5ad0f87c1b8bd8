// Native host segment executor: the C++ twin of stark/vm.py.
//
// Executes a compiled constraint Segment (3-address section stream) over the
// whole domain in CACHE-BLOCKED row chunks: every instruction processes the
// same B=64 rows before moving on, so intermediate values live in L1/L2
// scratch instead of materializing [n, 3] numpy temporaries per op.  This is
// the host analog of ops/vm_jax.py (where XLA does the same fusion for the
// TPU) and plays the role of the reference's row interpreter
// (starky/src/interpreter.rs) — but vectorized 8 rows per AVX-512 op.
//
// The Python encoder (stark/vm_native.py) lowers a Segment to a flat
// [n_instr, 30] int64 instruction table + a buffer pointer table, and
// guarantees (by falling back to the column VM) that no instruction reads a
// column written earlier in the SAME segment with a different row shift —
// the one pattern block execution cannot honor.
//
// Scratch layout is component-major [3][B] per operand/tmp so every field op
// runs on contiguous B-length arrays.

#include <cstdint>
#include <cstring>

#include "gl_avx512.h"

using u64 = uint64_t;
using i64 = int64_t;
using u128 = unsigned __int128;

static const u64 P = 0xFFFFFFFF00000001ULL;
static const u64 EPS = 0xFFFFFFFFULL;
static const int B = 64;  // rows per block

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

// ---- [B]-wide primitives (contiguous, B a multiple of 8) ------------------

static inline void vb_add(const u64* a, const u64* b, u64* o) {
#ifdef GL_HAVE_AVX512
    for (int i = 0; i < B; i += 8)
        _mm512_storeu_si512(o + i, glv::v_add(_mm512_loadu_si512(a + i),
                                              _mm512_loadu_si512(b + i)));
#else
    for (int i = 0; i < B; i++) o[i] = gl_add(a[i], b[i]);
#endif
}

static inline void vb_sub(const u64* a, const u64* b, u64* o) {
#ifdef GL_HAVE_AVX512
    for (int i = 0; i < B; i += 8)
        _mm512_storeu_si512(o + i, glv::v_sub(_mm512_loadu_si512(a + i),
                                              _mm512_loadu_si512(b + i)));
#else
    for (int i = 0; i < B; i++) o[i] = gl_sub(a[i], b[i]);
#endif
}

static inline void vb_mul(const u64* a, const u64* b, u64* o) {
#ifdef GL_HAVE_AVX512
    for (int i = 0; i < B; i += 8)
        _mm512_storeu_si512(o + i, glv::v_mul(_mm512_loadu_si512(a + i),
                                              _mm512_loadu_si512(b + i)));
#else
    for (int i = 0; i < B; i++) o[i] = gl_mul(a[i], b[i]);
#endif
}

static inline void vb_neg_into0(const u64* a, u64* o) {
    // o = p - a (0 -> 0)
    for (int i = 0; i < B; i++) o[i] = a[i] ? P - a[i] : 0;
}

// ---- instruction encoding (must match stark/vm_native.py) ------------------
// Instr (30 i64): op, dst[7], nsrc, src0[7], src1[7], src2[7]
//   op: 0 add, 1 sub, 2 mul, 3 copy, 4 muladd
//   dst: kind(0 section,1 tmp), buf, off, stride, width, shift, tmp_id
//   src: kind(0 section,1 tmp,2 number,3 bcast-row), dim, buf, off, stride,
//        shift, imm   (bcast-row: value row at buf[off*stride .. +dim))
enum { OP_ADD = 0, OP_SUB = 1, OP_MUL = 2, OP_COPY = 3, OP_MULADD = 4 };
enum { K_SEC = 0, K_TMP = 1, K_NUM = 2, K_BCAST = 3 };

struct Dst {
    i64 kind, buf, off, stride, width, shift, tmp_id;
};
struct Src {
    i64 kind, dim, buf, off, stride, shift, imm;
};
struct Instr {
    i64 op;
    Dst d;
    i64 nsrc;
    Src s[3];
};

// Load one operand into comp-major scratch v[3][B]; returns dim.
static int load_src(const Src& s, u64* const* bufs, const u64* tmp_scratch,
                    const i64* tmp_dim, size_t r0, size_t n, bool linear,
                    u64 v[3][B]) {
    switch (s.kind) {
    case K_NUM:
        for (int i = 0; i < B; i++) v[0][i] = (u64)s.imm;
        return 1;
    case K_TMP: {
        const u64* t = tmp_scratch + (size_t)s.imm * 3 * B;
        int d = (int)tmp_dim[s.imm];
        std::memcpy(v, t, (size_t)d * B * sizeof(u64));
        return d;
    }
    case K_BCAST: {
        const u64* row = bufs[s.buf] + (size_t)s.off * s.stride;
        for (int c = 0; c < (int)s.dim; c++)
            for (int i = 0; i < B; i++) v[c][i] = row[c];
        return (int)s.dim;
    }
    default: {  // K_SEC
        const u64* base = bufs[s.buf];
        size_t stride = (size_t)s.stride, off = (size_t)s.off;
        if (linear && s.shift == 0) {
            const u64* p = base + (r0)*stride + off;
            for (int c = 0; c < (int)s.dim; c++)
                for (int i = 0; i < B; i++) v[c][i] = p[(size_t)i * stride + c];
        } else if (linear) {
            const u64* p = base + (r0 + (size_t)s.shift) * stride + off;
            for (int c = 0; c < (int)s.dim; c++)
                for (int i = 0; i < B; i++) v[c][i] = p[(size_t)i * stride + c];
        } else {
            for (int i = 0; i < B; i++) {
                size_t r = (r0 + (size_t)i + (size_t)s.shift) % n;
                for (int c = 0; c < (int)s.dim; c++)
                    v[c][i] = base[r * stride + off + c];
            }
        }
        return (int)s.dim;
    }
    }
}

// F3 karatsuba product of comp-major triples (matches fields/f3g.py mul)
static void vb_f3_mul(const u64 a[3][B], const u64 b[3][B], u64 o[3][B]) {
    u64 t1[B], t2[B], aa[B], bb[B], cc[B], dd[B], ee[B], ff[B], gg[B];
    vb_add(a[0], a[1], t1);
    vb_add(b[0], b[1], t2);
    vb_mul(t1, t2, aa);
    vb_add(a[0], a[2], t1);
    vb_add(b[0], b[2], t2);
    vb_mul(t1, t2, bb);
    vb_add(a[1], a[2], t1);
    vb_add(b[1], b[2], t2);
    vb_mul(t1, t2, cc);
    vb_mul(a[0], b[0], dd);
    vb_mul(a[1], b[1], ee);
    vb_mul(a[2], b[2], ff);
    vb_sub(dd, ee, gg);
    vb_add(cc, gg, t1);
    vb_sub(t1, ff, o[0]);
    vb_add(aa, cc, t1);
    vb_add(ee, ee, t2);
    vb_add(t2, dd, t2);
    vb_sub(t1, t2, o[1]);
    vb_sub(bb, gg, o[2]);
}

// binop with F3G dim-mixing semantics (matches stark/vm.py _binop)
static int exec_binop(int op, const u64 a[3][B], int da, const u64 b[3][B],
                      int db, u64 o[3][B]) {
    if (op == OP_MUL) {
        if (da == 1 && db == 1) {
            vb_mul(a[0], b[0], o[0]);
            return 1;
        }
        if (da == 3 && db == 3) {
            vb_f3_mul(a, b, o);
            return 3;
        }
        const u64(*e)[B] = da == 3 ? a : b;  // extension operand
        const u64* s = da == 3 ? b[0] : a[0];
        for (int c = 0; c < 3; c++) vb_mul(e[c], s, o[c]);
        return 3;
    }
    if (op == OP_ADD) {
        if (da == db) {
            for (int c = 0; c < da; c++) vb_add(a[c], b[c], o[c]);
            return da;
        }
        const u64(*e)[B] = da == 3 ? a : b;
        const u64* s = da == 3 ? b[0] : a[0];
        vb_add(e[0], s, o[0]);
        std::memcpy(o[1], e[1], B * sizeof(u64));
        std::memcpy(o[2], e[2], B * sizeof(u64));
        return 3;
    }
    // OP_SUB
    if (da == db) {
        for (int c = 0; c < da; c++) vb_sub(a[c], b[c], o[c]);
        return da;
    }
    if (da == 3) {  // ext - base: adjust c0 only
        vb_sub(a[0], b[0], o[0]);
        std::memcpy(o[1], a[1], B * sizeof(u64));
        std::memcpy(o[2], a[2], B * sizeof(u64));
        return 3;
    }
    // base - ext: negate b, c0 = a - b0
    vb_sub(a[0], b[0], o[0]);
    vb_neg_into0(b[1], o[1]);
    vb_neg_into0(b[2], o[2]);
    return 3;
}

extern "C" {

// instrs: [n_instr, 30] i64; bufs: table of buffer base pointers;
// n: domain size; n_tmp: number of tmp slots.  Rows are processed in blocks
// of B; the final partial/wrapping blocks take the modular slow path.
void vm_exec_segment(const i64* instrs, size_t n_instr, u64* const* bufs,
                     size_t n, size_t n_tmp, size_t max_shift,
                     u64* tmp_scratch, i64* tmp_dim) {
    for (size_t r0 = 0; r0 < n; r0 += B) {
        bool full = r0 + B <= n;
        bool linear = full && (r0 + B + max_shift <= n);
        size_t rows = full ? (size_t)B : n - r0;
        u64 va[3][B], vc[3][B], vo[3][B];
        u64 vbuf[3][B];
        for (size_t k = 0; k < n_instr; k++) {
            const Instr* ins = (const Instr*)(instrs + k * 30);
            int dv;
            if (ins->op == OP_COPY) {
                dv = load_src(ins->s[0], bufs, tmp_scratch, tmp_dim, r0, n,
                              linear, vo);
            } else if (ins->op == OP_MULADD) {
                int da = load_src(ins->s[0], bufs, tmp_scratch, tmp_dim, r0,
                                  n, linear, va);
                int db = load_src(ins->s[1], bufs, tmp_scratch, tmp_dim, r0,
                                  n, linear, vbuf);
                int dm = exec_binop(OP_MUL, va, da, vbuf, db, vo);
                int dc = load_src(ins->s[2], bufs, tmp_scratch, tmp_dim, r0,
                                  n, linear, vc);
                std::memcpy(va, vo, sizeof(va));
                dv = exec_binop(OP_ADD, va, dm, vc, dc, vo);
            } else {
                int da = load_src(ins->s[0], bufs, tmp_scratch, tmp_dim, r0,
                                  n, linear, va);
                int db = load_src(ins->s[1], bufs, tmp_scratch, tmp_dim, r0,
                                  n, linear, vbuf);
                dv = exec_binop((int)ins->op, va, da, vbuf, db, vo);
            }

            const Dst& d = ins->d;
            if (d.kind == K_TMP) {
                std::memcpy(tmp_scratch + (size_t)d.tmp_id * 3 * B, vo,
                            (size_t)dv * B * sizeof(u64));
                tmp_dim[d.tmp_id] = dv;
                continue;
            }
            u64* base = bufs[d.buf];
            size_t stride = (size_t)d.stride, off = (size_t)d.off;
            size_t width = (size_t)d.width;
            if (linear && d.shift == 0) {
                u64* p = base + r0 * stride + off;
                for (size_t c = 0; c < width; c++)
                    for (size_t i = 0; i < rows; i++)
                        p[i * stride + c] = c < (size_t)dv ? vo[c][i] : 0;
            } else {
                for (size_t i = 0; i < rows; i++) {
                    size_t r = (r0 + i + (size_t)d.shift) % n;
                    for (size_t c = 0; c < width; c++)
                        base[r * stride + off + c] =
                            c < (size_t)dv ? vo[c][i] : 0;
                }
            }
        }
    }
}

}  // extern "C"
