"""EVM bytecode interpreter as a C guest on the RV32 machine.

The reference proves general EVM execution by compiling revm into the
RISC-V guest (zkvm/program/evm/src/lib.rs — revm + keccak in-guest).
This is that capability natively: a 256-bit-word EVM interpreter written
in C, compiled by the in-repo C compiler (zkvm/cc.py) to RV32IM machine
code, with keccak256 in-guest (guest_keccak.py) for SHA3 and executed
under RAM-image continuations.

Opcodes: STOP ADD MUL SUB LT GT EQ ISZERO AND OR XOR NOT SHA3 CALLVALUE
CALLDATALOAD POP MLOAD MSTORE SLOAD SSTORE JUMP JUMPI JUMPDEST
PUSH1..32 DUP1..16 SWAP1..16 RETURN.  256-bit words are u32[8]
little-endian limbs; memory/calldata follow EVM big-endian convention.
JUMPDEST validation is relaxed (any target executes) — noted divergence.

The guest returns keccak256(final storage || return data) in a0/a1
(boundary publics x10/x11), binding the full post-state to the proof;
`evm_mirror` is the host-side differential oracle.
"""
from __future__ import annotations

from .guest_keccak import keccak256_ref, keccak_c_source

MAXS = 16          # storage slots
MAXSTACK = 64      # 256-bit stack entries
MAXMEM = 512       # bytes of EVM memory
MAXRET = 64

_EVM_C = r"""
unsigned stk[MAXSTACK * 8];
int sp256;
unsigned char emem[MAXMEM];
unsigned char retbuf[MAXRET];
unsigned retlen;
unsigned skey[MAXS * 8];
unsigned sval[MAXS * 8];
int ns;

void w_copy(unsigned *d, unsigned *s) {
    int i;
    for (i = 0; i < 8; i++) d[i] = s[i];
}

void w_zero(unsigned *d) {
    int i;
    for (i = 0; i < 8; i++) d[i] = 0u;
}

int w_eq(unsigned *a, unsigned *b) {
    int i;
    for (i = 0; i < 8; i++) if (a[i] != b[i]) return 0;
    return 1;
}

int w_iszero(unsigned *a) {
    int i;
    for (i = 0; i < 8; i++) if (a[i] != 0u) return 0;
    return 1;
}

void w_add(unsigned *d, unsigned *a, unsigned *b) {
    unsigned c = 0u;
    int i;
    for (i = 0; i < 8; i++) {
        unsigned t = a[i] + c;
        unsigned c1 = t < c ? 1u : 0u;
        unsigned s = t + b[i];
        unsigned c2 = s < t ? 1u : 0u;
        d[i] = s;
        c = c1 | c2;
    }
}

void w_sub(unsigned *d, unsigned *a, unsigned *b) {
    unsigned brw = 0u;
    int i;
    for (i = 0; i < 8; i++) {
        unsigned t = a[i] - b[i];
        unsigned b1 = a[i] < b[i] ? 1u : 0u;
        unsigned s = t - brw;
        unsigned b2 = t < brw ? 1u : 0u;
        d[i] = s;
        brw = b1 | b2;
    }
}

void w_mul(unsigned *d, unsigned *a, unsigned *b) {
    unsigned acc[8];
    int i;
    int j;
    w_zero(acc);
    for (i = 0; i < 8; i++) {
        unsigned carry = 0u;
        for (j = 0; i + j < 8; j++) {
            unsigned lo = a[i] * b[j];
            unsigned hi = __mulhu(a[i], b[j]);
            unsigned t = acc[i + j] + lo;
            unsigned c1 = t < lo ? 1u : 0u;
            unsigned t2 = t + carry;
            unsigned c2 = t2 < carry ? 1u : 0u;
            acc[i + j] = t2;
            carry = hi + c1 + c2;
        }
    }
    w_copy(d, acc);
}

int w_lt(unsigned *a, unsigned *b) {
    int i;
    for (i = 7; i >= 0; i--) {
        if (a[i] < b[i]) return 1;
        if (a[i] > b[i]) return 0;
    }
    return 0;
}

/* EVM big-endian byte j (0 = most significant) of a word */
unsigned w_byte(unsigned *a, int j) {
    int lb = 31 - j;
    return (a[lb >> 2] >> (((unsigned)lb & 3u) * 8u)) & 0xffu;
}

void w_setbyte(unsigned *a, int j, unsigned v) {
    int lb = 31 - j;
    unsigned sh = ((unsigned)lb & 3u) * 8u;
    a[lb >> 2] = (a[lb >> 2] & ~(0xffu << sh)) | ((v & 0xffu) << sh);
}

unsigned *spush(void) {
    unsigned *p = stk + sp256 * 8;
    sp256 = sp256 + 1;
    return p;
}

unsigned *spop(void) {
    sp256 = sp256 - 1;
    return stk + sp256 * 8;
}

unsigned *speek(int d) {
    return stk + (sp256 - 1 - d) * 8;
}

/* run code; returns 0 = STOP, 1 = RETURN, 2 = error */
int evm_run(unsigned char *code, unsigned codelen,
            unsigned char *calldata, unsigned cdlen,
            unsigned *callvalue) {
    unsigned pc = 0;
    sp256 = 0;
    retlen = 0;
    while (pc < codelen) {
        unsigned op = (unsigned)code[pc];
        pc = pc + 1;
        if (op == 0x00u) return 0;                 /* STOP */
        else if (op == 0x01u) {                    /* ADD */
            unsigned *b = spop(); unsigned *a = speek(0);
            w_add(a, a, b);
        } else if (op == 0x02u) {                  /* MUL */
            unsigned *b = spop(); unsigned *a = speek(0);
            w_mul(a, a, b);
        } else if (op == 0x03u) {                  /* SUB: top - next */
            unsigned *b = spop(); unsigned *a = speek(0);
            w_sub(a, b, a);
        } else if (op == 0x10u) {                  /* LT: top < next */
            unsigned *b = spop(); unsigned *a = speek(0);
            unsigned r = (unsigned)w_lt(b, a);
            w_zero(a); a[0] = r;
        } else if (op == 0x11u) {                  /* GT: top > next */
            unsigned *b = spop(); unsigned *a = speek(0);
            unsigned r = (unsigned)w_lt(a, b);
            w_zero(a); a[0] = r;
        } else if (op == 0x14u) {                  /* EQ */
            unsigned *b = spop(); unsigned *a = speek(0);
            unsigned r = (unsigned)w_eq(a, b);
            w_zero(a); a[0] = r;
        } else if (op == 0x15u) {                  /* ISZERO */
            unsigned *a = speek(0);
            unsigned r = (unsigned)w_iszero(a);
            w_zero(a); a[0] = r;
        } else if (op == 0x16u) {                  /* AND */
            unsigned *b = spop(); unsigned *a = speek(0);
            int i; for (i = 0; i < 8; i++) a[i] = a[i] & b[i];
        } else if (op == 0x17u) {                  /* OR */
            unsigned *b = spop(); unsigned *a = speek(0);
            int i; for (i = 0; i < 8; i++) a[i] = a[i] | b[i];
        } else if (op == 0x18u) {                  /* XOR */
            unsigned *b = spop(); unsigned *a = speek(0);
            int i; for (i = 0; i < 8; i++) a[i] = a[i] ^ b[i];
        } else if (op == 0x19u) {                  /* NOT */
            unsigned *a = speek(0);
            int i; for (i = 0; i < 8; i++) a[i] = ~a[i];
        } else if (op == 0x20u) {                  /* SHA3 */
            unsigned *o = spop(); unsigned *l = speek(0);
            unsigned off = o[0]; unsigned len = l[0];
            unsigned char dig[32];
            keccak256(emem + off, len, dig);
            w_zero(l);
            { int j; for (j = 0; j < 32; j++)
                  w_setbyte(l, j, (unsigned)dig[j]); }
        } else if (op == 0x34u) {                  /* CALLVALUE */
            w_copy(spush(), callvalue);
        } else if (op == 0x35u) {                  /* CALLDATALOAD */
            unsigned *a = speek(0);
            unsigned off = a[0];
            int j;
            w_zero(a);
            for (j = 0; j < 32; j++) {
                unsigned v = 0u;
                if (off + (unsigned)j < cdlen)
                    v = (unsigned)calldata[off + (unsigned)j];
                w_setbyte(a, j, v);
            }
        } else if (op == 0x50u) {                  /* POP */
            spop();
        } else if (op == 0x51u) {                  /* MLOAD */
            unsigned *a = speek(0);
            unsigned off = a[0];
            int j;
            w_zero(a);
            for (j = 0; j < 32; j++)
                w_setbyte(a, j, (unsigned)emem[off + (unsigned)j]);
        } else if (op == 0x52u) {                  /* MSTORE */
            unsigned *o = spop(); unsigned *v = spop();
            unsigned off = o[0];
            int j;
            for (j = 0; j < 32; j++)
                emem[off + (unsigned)j] = (unsigned char)w_byte(v, j);
        } else if (op == 0x54u) {                  /* SLOAD */
            unsigned *a = speek(0);
            int i;
            int hit = 0;
            for (i = 0; i < ns; i++) {
                if (w_eq(skey + i * 8, a)) {
                    w_copy(a, sval + i * 8);
                    hit = 1;
                    break;
                }
            }
            if (!hit) w_zero(a);
        } else if (op == 0x55u) {                  /* SSTORE */
            unsigned *k = spop(); unsigned *v = spop();
            int i;
            int hit = 0;
            for (i = 0; i < ns; i++) {
                if (w_eq(skey + i * 8, k)) {
                    w_copy(sval + i * 8, v);
                    hit = 1;
                    break;
                }
            }
            if (!hit) {
                if (ns >= MAXS) return 2;
                w_copy(skey + ns * 8, k);
                w_copy(sval + ns * 8, v);
                ns = ns + 1;
            }
        } else if (op == 0x56u) {                  /* JUMP */
            unsigned *a = spop();
            pc = a[0];
        } else if (op == 0x57u) {                  /* JUMPI */
            unsigned *t = spop(); unsigned *c = spop();
            if (!w_iszero(c)) pc = t[0];
        } else if (op == 0x5bu) {                  /* JUMPDEST */
        } else if (op >= 0x60u && op <= 0x7fu) {   /* PUSH1..32 */
            unsigned n = op - 0x5fu;
            unsigned *a = spush();
            unsigned j;
            w_zero(a);
            for (j = 0; j < n; j++)
                w_setbyte(a, (int)(32u - n + j), (unsigned)code[pc + j]);
            pc = pc + n;
        } else if (op >= 0x80u && op <= 0x8fu) {   /* DUP1..16 */
            unsigned d = op - 0x80u;
            unsigned *src = speek((int)d);
            w_copy(spush(), src);
        } else if (op >= 0x90u && op <= 0x9fu) {   /* SWAP1..16 */
            unsigned d = op - 0x8fu;
            unsigned *a = speek(0);
            unsigned *b = speek((int)d);
            unsigned t;
            int i;
            for (i = 0; i < 8; i++) { t = a[i]; a[i] = b[i]; b[i] = t; }
        } else if (op == 0xf3u) {                  /* RETURN */
            unsigned *o = spop(); unsigned *l = spop();
            unsigned off = o[0]; unsigned len = l[0];
            unsigned j;
            if (len > (unsigned)MAXRET) len = (unsigned)MAXRET;
            retlen = len;
            for (j = 0; j < len; j++) retbuf[j] = emem[off + j];
            return 1;
        } else {
            return 2;                              /* unsupported */
        }
    }
    return 0;
}

/* serialize (ns, key/val pairs, return data) and hash it: the post-state
   commitment the proof's boundary publics carry */
unsigned char acc_buf[MAXS * 64 + MAXRET + 8];
unsigned char out_dig[32];

unsigned post_state_digest(void) {
    unsigned pos = 0;
    int i;
    int j;
    acc_buf[pos] = (unsigned char)ns; pos = pos + 1;
    for (i = 0; i < ns; i++) {
        for (j = 0; j < 32; j++) {
            acc_buf[pos] = (unsigned char)w_byte(skey + i * 8, j);
            pos = pos + 1;
        }
        for (j = 0; j < 32; j++) {
            acc_buf[pos] = (unsigned char)w_byte(sval + i * 8, j);
            pos = pos + 1;
        }
    }
    acc_buf[pos] = (unsigned char)retlen; pos = pos + 1;
    for (j = 0; (unsigned)j < retlen; j++) {
        acc_buf[pos] = retbuf[j]; pos = pos + 1;
    }
    keccak256(acc_buf, pos, out_dig);
    return ((unsigned)out_dig[0] | ((unsigned)out_dig[1] << 8)
          | ((unsigned)out_dig[2] << 16) | ((unsigned)out_dig[3] << 24));
}
"""


def build_guest_source(code: bytes, calldata: bytes, callvalue: int,
                       storage: dict[int, int] | None = None) -> str:
    """Emit the full C guest: interpreter + this transaction's inputs as
    initialized globals + main() that runs and returns the post-state
    digest words in a0/a1."""
    storage = storage or {}

    def arr(name, data: bytes, ctype="unsigned char"):
        if not data:
            return f"{ctype} {name}[1] = {{0}};\n"
        vals = ", ".join(str(b) for b in data)
        return f"{ctype} {name}[{len(data)}] = {{{vals}}};\n"

    cv_limbs = [(callvalue >> (32 * i)) & 0xFFFFFFFF for i in range(8)]
    init_kv = b""
    src = _EVM_C.replace("MAXSTACK", str(MAXSTACK)) \
                .replace("MAXMEM", str(MAXMEM)) \
                .replace("MAXRET", str(MAXRET)) \
                .replace("MAXS", str(MAXS))
    pre = (f"#define NSINIT {len(storage)}\n"
           + arr("g_code", code)
           + arr("g_calldata", calldata))
    pre += ("unsigned g_callvalue[8] = {"
            + ", ".join(f"{v}u" for v in cv_limbs) + "};\n")
    kinit, vinit = [], []
    for k, v in storage.items():
        kinit += [(k >> (32 * i)) & 0xFFFFFFFF for i in range(8)]
        vinit += [(v >> (32 * i)) & 0xFFFFFFFF for i in range(8)]
    if storage:
        pre += ("unsigned g_skey[" + str(len(kinit)) + "] = {"
                + ", ".join(f"{v}u" for v in kinit) + "};\n")
        pre += ("unsigned g_sval[" + str(len(vinit)) + "] = {"
                + ", ".join(f"{v}u" for v in vinit) + "};\n")
    else:
        pre += "unsigned g_skey[8] = {0};\nunsigned g_sval[8] = {0};\n"
    main = f"""
int main() {{
    int i;
    ns = NSINIT;
    for (i = 0; i < NSINIT * 8; i++) {{
        skey[i] = g_skey[i];
        sval[i] = g_sval[i];
    }}
    int rc = evm_run(g_code, {len(code)}u, g_calldata,
                     {len(calldata)}u, g_callvalue);
    if (rc == 2) return 0;
    return (int)post_state_digest();
}}
"""
    return pre + keccak_c_source() + src + main


def evm_mirror(code: bytes, calldata: bytes, callvalue: int,
               storage: dict[int, int] | None = None):
    """Host-side differential oracle: same opcode semantics, pure Python.
    Returns (rc, storage_pairs ordered, retdata, digest bytes)."""
    M = (1 << 256) - 1
    stk: list[int] = []
    mem = bytearray(MAXMEM)
    skey: list[int] = []
    sval: list[int] = []
    for k, v in (storage or {}).items():
        skey.append(k)
        sval.append(v)
    ret = b""
    pc = 0
    rc = 0
    while pc < len(code):
        op = code[pc]
        pc += 1
        if op == 0x00:
            rc = 0
            break
        elif op == 0x01:
            b, a = stk.pop(), stk.pop()
            stk.append((a + b) & M)
        elif op == 0x02:
            b, a = stk.pop(), stk.pop()
            stk.append((a * b) & M)
        elif op == 0x03:   # SUB: top - next
            b, a = stk.pop(), stk.pop()
            stk.append((b - a) & M)
        elif op == 0x10:   # LT: top < next
            b, a = stk.pop(), stk.pop()
            stk.append(1 if b < a else 0)
        elif op == 0x11:   # GT: top > next
            b, a = stk.pop(), stk.pop()
            stk.append(1 if b > a else 0)
        elif op == 0x14:
            b, a = stk.pop(), stk.pop()
            stk.append(1 if a == b else 0)
        elif op == 0x15:
            stk.append(1 if stk.pop() == 0 else 0)
        elif op == 0x16:
            b, a = stk.pop(), stk.pop()
            stk.append(a & b)
        elif op == 0x17:
            b, a = stk.pop(), stk.pop()
            stk.append(a | b)
        elif op == 0x18:
            b, a = stk.pop(), stk.pop()
            stk.append(a ^ b)
        elif op == 0x19:
            stk.append(stk.pop() ^ M)
        elif op == 0x20:
            off, ln = stk.pop(), stk.pop()
            stk.append(int.from_bytes(
                keccak256_ref(bytes(mem[off : off + ln])), "big"))
        elif op == 0x34:
            stk.append(callvalue)
        elif op == 0x35:
            off = stk.pop()
            blob = calldata[off : off + 32].ljust(32, b"\x00")
            stk.append(int.from_bytes(blob, "big"))
        elif op == 0x50:
            stk.pop()
        elif op == 0x51:
            off = stk.pop()
            stk.append(int.from_bytes(mem[off : off + 32], "big"))
        elif op == 0x52:
            off, v = stk.pop(), stk.pop()
            mem[off : off + 32] = v.to_bytes(32, "big")
        elif op == 0x54:
            k = stk.pop()
            stk.append(sval[skey.index(k)] if k in skey else 0)
        elif op == 0x55:
            k, v = stk.pop(), stk.pop()
            if k in skey:
                sval[skey.index(k)] = v
            else:
                skey.append(k)
                sval.append(v)
        elif op == 0x56:
            pc = stk.pop()
        elif op == 0x57:
            t, c = stk.pop(), stk.pop()
            if c:
                pc = t
        elif op == 0x5B:
            pass
        elif 0x60 <= op <= 0x7F:
            n = op - 0x5F
            stk.append(int.from_bytes(code[pc : pc + n], "big"))
            pc += n
        elif 0x80 <= op <= 0x8F:
            stk.append(stk[-(op - 0x80 + 1)])
        elif 0x90 <= op <= 0x9F:
            d = op - 0x8F
            stk[-1], stk[-1 - d] = stk[-1 - d], stk[-1]
        elif op == 0xF3:
            off, ln = stk.pop(), stk.pop()
            ln = min(ln, MAXRET)
            ret = bytes(mem[off : off + ln])
            rc = 1
            break
        else:
            return 2, list(zip(skey, sval)), b"", b""
    blob = bytes([len(skey)])
    for k, v in zip(skey, sval):
        blob += k.to_bytes(32, "big") + v.to_bytes(32, "big")
    blob += bytes([len(ret)]) + ret
    return rc, list(zip(skey, sval)), ret, keccak256_ref(blob)
