"""C compiler -> RV32 guests: compiler-produced binaries (VERDICT r2 #4)
and EVM bytecode execution with in-guest keccak256 (VERDICT r2 #5).

The toolchain is eigen_zkvm_tpu/zkvm/cc.py (pycparser front-end, register
promotion, branch relaxation, absolute-addressed globals); the reference
counterpart is powdr compile_rust + the revm/keccak guest
(zkvm/src/lib.rs:172, zkvm/program/evm/src/lib.rs)."""
import numpy as np
import pytest

from eigen_zkvm_tpu.zkvm.cc import c_execute, c_to_elf, load_c_elf
from eigen_zkvm_tpu.zkvm.guest_evm_c import build_guest_source, evm_mirror
from eigen_zkvm_tpu.zkvm.guest_keccak import keccak256_ref, keccak_c_source
from eigen_zkvm_tpu.zkvm.rv32_isa import execute

# slot = keccak256(K || 0); balances[slot] += A; counter at slot 1 += 1;
# round 5: slot7 = A/3, slot8 = A >> 5, slot9 = sar(NOT A, 3) — the
# extended arithmetic/shift opcodes INSIDE the proven vector;
# RETURN mem[0:32] — PUSH/DUP/SWAP/MSTORE/SHA3/SLOAD/SSTORE/ADD/DIV/
# SHR/SAR/NOT/RETURN
TOKEN_CODE = bytes.fromhex(
    "600035" "600052" "6000602052" "6040600020"
    "8054" "602035" "01" "90" "55"
    "600154" "600101" "600155"
    "6003" "602035" "04" "600755"      # PUSH1 3, CDL(32), DIV, SSTORE 7
    "602035" "6005" "1c" "600855"      # CDL(32), PUSH1 5, SHR, SSTORE 8
    "602035" "19" "6003" "1d" "600955"  # CDL(32), NOT, SAR 3, SSTORE 9
    "60206000f3")


def test_compiler_produces_working_binaries():
    """Recursion, loops, arrays, pointers, unsigned div/rem, casts —
    classic compiler codegen patterns the hand assembler never emits."""
    SRC = r"""
int fib(int n) { if (n < 2) return n; return fib(n-1) + fib(n-2); }
unsigned gcd(unsigned a, unsigned b) {
    while (b != 0) { unsigned t = a % b; a = b; b = t; }
    return a;
}
int arr[8] = {3, 1, 4, 1, 5, 9, 2, 6};
int main() {
    int i; int sum = 0;
    for (i = 0; i < 8; i++) sum += arr[i];
    unsigned char *p = (unsigned char *)0;  /* NULL-ish unused */
    return sum * 1000000 + fib(10) * 1000 + (int)gcd(252u, 198u);
}
"""
    _final, a0 = c_execute(SRC)
    assert a0 == 31 * 1000000 + 55 * 1000 + 18


def test_guest_keccak256_bit_exact():
    """The in-guest keccak (unrolled rounds, u32 lane pairs) matches the
    host reference, which matches the known empty-string digest."""
    assert keccak256_ref(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    for msg in (b"abc", b"x" * 135, b"y" * 136, b"z" * 200):
        blob = ", ".join(str(b) for b in msg)
        src = keccak_c_source() + f"""
unsigned char msg[{len(msg)}] = {{{blob}}};
unsigned char dig[32];
int main() {{
    keccak256(msg, {len(msg)}u, dig);
    return (int)((unsigned)dig[0] | ((unsigned)dig[1] << 8)
         | ((unsigned)dig[2] << 16) | ((unsigned)dig[3] << 24));
}}
"""
        _f, a0 = c_execute(src, max_cycles=1 << 24)
        assert a0 == int.from_bytes(keccak256_ref(msg)[:4], "little"), msg


def _run_guest(code, calldata, callvalue, storage, gas_limit=30_000_000):
    src = build_guest_source(code, calldata, callvalue, storage,
                             gas_limit=gas_limit)
    program, entry, image0, ram_words, mem_base = load_c_elf(c_to_elf(src))
    mem = {mem_base + i: int(w) for i, w in enumerate(image0) if w}
    states, final = execute(program, entry, mem=mem, max_cycles=1 << 24)
    return states, final


def test_evm_bytecode_with_keccak_differential():
    """Real EVM bytecode (mapping-slot keccak, storage read/write,
    stack ops) interpreted by the compiled guest == the Python mirror."""
    K, A = 0xDEADBEEF, 12345
    calldata = K.to_bytes(32, "big") + A.to_bytes(32, "big")
    storage = {1: 41}
    rc, pairs, ret, dig, _gas = evm_mirror(TOKEN_CODE, calldata, 0, storage)
    assert rc == 1 and dict(pairs)[1] == 42
    slot = int.from_bytes(keccak256_ref(
        K.to_bytes(32, "big") + (0).to_bytes(32, "big")), "big")
    assert dict(pairs)[slot] == A
    # the round-5 arithmetic/shift section of the vector
    M = (1 << 256) - 1
    assert dict(pairs)[7] == A // 3
    assert dict(pairs)[8] == A >> 5
    assert dict(pairs)[9] == ((A ^ M) >> 3) | (M ^ (M >> 3))  # sar(neg)
    states, final = _run_guest(TOKEN_CODE, calldata, 0, storage)
    assert final.regs[10] == int.from_bytes(dig[:4], "little")


def test_evm_branching_and_arithmetic():
    """JUMPI/JUMP, LT/GT/EQ/ISZERO, MUL/SUB and CALLVALUE paths."""
    # if (callvalue < 100) { sstore(5, callvalue*3) } else { sstore(5, 7) }
    code = bytes.fromhex(
        "34"        # CALLVALUE            [v]
        "6064"      # PUSH1 100            [v, 100]
        "9010"      # SWAP1 LT             [v<100]
        "6011"      # PUSH1 0x11 (then)
        "57"        # JUMPI
        "6007600555"  # PUSH1 7 PUSH1 5 SSTORE
        "601a56"    # PUSH1 0x1a JUMP (end)
        "5b"        # 0x11: JUMPDEST
        "34600302"  # CALLVALUE PUSH1 3 MUL
        "600555"    # PUSH1 5 SSTORE
        "5b"        # 0x1a: JUMPDEST
        "00")       # STOP
    for cv, want in ((40, 120), (250, 7)):
        rc, pairs, _ret, dig, _gas = evm_mirror(code, b"", cv, {})
        assert rc == 0 and dict(pairs)[5] == want
        states, final = _run_guest(code, b"", cv, {})
        assert final.regs[10] == int.from_bytes(dig[:4], "little"), cv


def _push32(v: int) -> bytes:
    return bytes([0x7F]) + (v & ((1 << 256) - 1)).to_bytes(32, "big")


def test_evm_extended_arithmetic_differential():
    """DIV/SDIV/MOD/SMOD/ADDMOD/MULMOD/EXP/SIGNEXTEND/SLT/SGT/BYTE/
    SHL/SHR/SAR over randomized 256-bit operands: guest == mirror ==
    Python big-int semantics (VERDICT r4 #7)."""
    import random

    rng = random.Random(0xE5D)
    M = (1 << 256) - 1
    MIN = 1 << 255
    ops2 = [0x04, 0x05, 0x06, 0x07, 0x12, 0x13, 0x1A, 0x1B, 0x1C, 0x1D]
    ops3 = [0x08, 0x09]
    code = b""
    slot = 0
    cases = []
    for _ in range(12):
        op = rng.choice(ops2)
        a = rng.choice([rng.getrandbits(256), rng.getrandbits(64),
                        MIN, M, 0, 1])
        b = rng.choice([rng.getrandbits(256), rng.getrandbits(32),
                        M, 0, 1, 7, 255, 256])
        # stack [b, a]: top = a = first operand
        code += _push32(b) + _push32(a) + bytes([op])
        code += _push32(slot) + bytes([0x55])          # SSTORE slot
        cases.append((op, a, b))
        slot += 1
    for _ in range(2):
        op = rng.choice(ops3)
        n = rng.getrandbits(200) | 1
        b, c = rng.getrandbits(256), rng.getrandbits(256)
        code += _push32(n) + _push32(c) + _push32(b) + bytes([op])
        code += _push32(slot) + bytes([0x55])
        cases.append((op, b, c, n))
        slot += 1
    # EXP and SIGNEXTEND with controlled operands
    code += _push32(3) + _push32(123456789) + bytes([0x0A])   # 123456789^3
    code += _push32(slot) + bytes([0x55]); slot += 1
    code += _push32(0xFF80) + _push32(0) + bytes([0x0B])      # signext k=0
    code += _push32(slot) + bytes([0x55]); slot += 1
    code += bytes([0x00])                                     # STOP
    rc, pairs, _ret, dig, gas = evm_mirror(code, b"", 0, {})
    assert rc == 0
    vals = dict(pairs)

    def s2c(v):
        return v - (1 << 256) if v & MIN else v

    for i, cs in enumerate(cases):
        if cs[0] == 0x04:
            want = cs[1] // cs[2] if cs[2] else 0
        elif cs[0] == 0x05:
            sa, sb = s2c(cs[1]), s2c(cs[2])
            want = 0 if sb == 0 else (
                (abs(sa) // abs(sb)) * (-1 if (sa < 0) != (sb < 0) else 1)
                & M)
        elif cs[0] == 0x06:
            want = cs[1] % cs[2] if cs[2] else 0
        elif cs[0] == 0x07:
            sa, sb = s2c(cs[1]), s2c(cs[2])
            want = 0 if sb == 0 else (
                (abs(sa) % abs(sb)) * (-1 if sa < 0 else 1)) & M
        elif cs[0] == 0x08:
            want = (cs[1] + cs[2]) % cs[3] if cs[3] else 0
        elif cs[0] == 0x09:
            want = (cs[1] * cs[2]) % cs[3] if cs[3] else 0
        elif cs[0] == 0x12:
            want = 1 if s2c(cs[1]) < s2c(cs[2]) else 0
        elif cs[0] == 0x13:
            want = 1 if s2c(cs[1]) > s2c(cs[2]) else 0
        elif cs[0] == 0x1A:
            want = (cs[2] >> (8 * (31 - cs[1]))) & 0xFF if cs[1] < 32 else 0
        elif cs[0] == 0x1B:
            want = (cs[2] << cs[1]) & M if cs[1] < 256 else 0
        elif cs[0] == 0x1C:
            want = cs[2] >> cs[1] if cs[1] < 256 else 0
        elif cs[0] == 0x1D:
            want = ((s2c(cs[2]) >> min(cs[1], 255)) & M if cs[1] < 256
                    else (M if cs[2] & MIN else 0))
        assert vals[i] == want, f"case {i} op {cs[0]:#x}"
    assert vals[slot - 2] == pow(123456789, 3, 1 << 256)
    assert vals[slot - 1] == (1 << 256) - 0x80  # 0x80 sign-extended (k=0)
    # the compiled guest reproduces the mirror's post-state digest
    states, final = _run_guest(code, b"", 0, {})
    assert final.regs[10] == int.from_bytes(dig[:4], "little")


def test_evm_env_copy_and_log_opcodes():
    """CALLDATASIZE/CALLDATACOPY/CODESIZE/CODECOPY/PC/MSIZE/GAS and
    LOG0..LOG2: guest == mirror, logs bound into the digest."""
    cd = bytes(range(1, 41))
    code = (
        _push32(8) + _push32(4) + _push32(0) + bytes([0x37])   # CDCOPY 8B
        + _push32(32) + _push32(0) + _push32(64) + bytes([0x39])  # CODECOPY
        + bytes([0x36]) + _push32(0) + bytes([0x55])           # slot0=cdsize
        + bytes([0x38]) + _push32(1) + bytes([0x55])           # slot1=codesz
        + bytes([0x58]) + _push32(2) + bytes([0x55])           # slot2=pc
        + bytes([0x59]) + _push32(3) + bytes([0x55])           # slot3=msize
        + bytes([0x5A]) + _push32(4) + bytes([0x55])           # slot4=gas
        # LOG1 topic=0x77, data = mem[0:8] (the copied calldata)
        + _push32(0x77) + _push32(8) + _push32(0) + bytes([0xA1])
        # LOG0 data = mem[64:4]
        + _push32(4) + _push32(64) + bytes([0xA0])
        + bytes([0x00]))
    rc, pairs, _ret, dig, gas = evm_mirror(code, cd, 0, {})
    assert rc == 0
    vals = dict(pairs)
    assert vals[0] == len(cd) and vals[1] == len(code)
    assert vals[3] == 96  # high-water: CODECOPY to 64+32
    assert vals[4] < 30_000_000
    states, final = _run_guest(code, cd, 0, {})
    assert final.regs[10] == int.from_bytes(dig[:4], "little")
    # digest must change if a log is dropped (binding check, mirror-side)
    code_nolog = code[: -len(_push32(4) + _push32(64) + b"\xa0\x00")] \
        + bytes([0x00])
    _rc2, _p2, _r2, dig2, _g2 = evm_mirror(code_nolog, cd, 0, {})
    assert dig2 != dig


def test_evm_random_program_fuzz_differential():
    """Randomized EVM programs (stack-depth-tracked sampling over the
    full supported op set, tight gas) interpreted by the compiled guest
    must agree with the mirror on the post-state digest for every
    terminating outcome, and on a0 == 0 for error/OOG outcomes."""
    import random

    rng = random.Random(0xF122)
    OPS0 = [0x34, 0x36, 0x38, 0x58, 0x59, 0x5A]           # push 1
    OPS2 = [0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x0B, 0x10, 0x11,
            0x12, 0x13, 0x14, 0x16, 0x17, 0x18, 0x1A, 0x1B, 0x1C, 0x1D]
    OPS3 = [0x08, 0x09]
    calldata = bytes(rng.randrange(256) for _ in range(64))
    n_ok = 0
    for trial in range(12):
        code = b""
        depth = 0
        for _ in range(rng.randrange(4, 16)):
            r = rng.random()
            if depth == 0 or r < 0.35:
                v = rng.choice([rng.getrandbits(256), rng.getrandbits(32),
                                rng.getrandbits(8), 0, 1])
                code += _push32(v)
                depth += 1
            elif depth >= 3 and r < 0.45:
                code += bytes([rng.choice(OPS3)])
                depth -= 2
            elif depth >= 2 and r < 0.75:
                code += bytes([rng.choice(OPS2)])
                depth -= 1
            elif r < 0.85:
                code += bytes([rng.choice(OPS0)])
                depth += 1
            else:
                code += bytes([0x15])  # ISZERO
        # store whatever remains (bounded slots), then stop
        for s in range(min(depth, 4)):
            code += _push32(s) + bytes([0x55])
            depth -= 1
        code += bytes([0x00])
        res = evm_mirror(code, calldata, 7, {}, gas_limit=200_000)
        rc, _pairs, _ret, dig, _gas = res
        states, final = _run_guest(code, calldata, 7, {},
                                   gas_limit=200_000)
        if rc in (0, 1):
            assert final.regs[10] == int.from_bytes(dig[:4], "little"), \
                f"trial {trial} digest diverges (code={code.hex()})"
            n_ok += 1
        else:
            assert final.regs[10] == 0, \
                f"trial {trial} error path diverges (code={code.hex()})"
    assert n_ok >= 6  # most sampled programs terminate cleanly


def test_evm_gas_metering_and_oog():
    """Gas: a storage-writing program leaves the same gas_left in guest
    and mirror (bound via the digest), and a tight limit out-of-gasses
    both (rc=3 mirror, a0=0 guest)."""
    code = (_push32(7) + _push32(5) + bytes([0x55])          # SSTORE 5<-7
            + _push32(2) + _push32(10) + bytes([0x0A])       # 10^2
            + _push32(6) + bytes([0x55])                     # SSTORE 6<-100
            + bytes([0x00]))
    rc, pairs, _r, dig, gas = evm_mirror(code, b"", 0, {})
    assert rc == 0 and dict(pairs) == {5: 7, 6: 100}
    assert gas < 30_000_000  # something was charged
    states, final = _run_guest(code, b"", 0, {})
    assert final.regs[10] == int.from_bytes(dig[:4], "little")
    # starve it: 20000 (SSTORE) won't fit in 1000 gas
    rc2, _p, _r2, _d, gas2 = evm_mirror(code, b"", 0, {}, gas_limit=1000)
    assert rc2 == 3
    src = build_guest_source(code, b"", 0, {}, gas_limit=1000)
    _f, a0 = c_execute(src, max_cycles=1 << 24)
    assert a0 == 0


@pytest.mark.slow
def test_compiled_binary_proves_end_to_end():
    """A compiler-produced ELF (C fib + array walk) proves through the
    full pipeline with RAM-image continuation digests — the
    zkvm/src/lib.rs:172 compile->prove analog with a real front-end."""
    from eigen_zkvm_tpu.zkvm.elf import elf_execute_and_prove
    from eigen_zkvm_tpu.zkvm.rv32_lib import check_chain_publics

    SRC = r"""
int acc[16];
int main() {
    int i;
    for (i = 0; i < 16; i++) acc[i] = i * i + 1;
    int s = 0;
    for (i = 0; i < 16; i++) s += acc[i];
    return s;
}
"""
    elf = c_to_elf(SRC)
    proofs, pubs, machine, setup, ss = elf_execute_and_prove(
        elf, n_bits=15, n_queries=2, include_exec_in_image=False)
    assert pubs[-1]["x10_out"] == sum(i * i + 1 for i in range(16))
    assert check_chain_publics(pubs)


@pytest.mark.slow
def test_evm_contract_proves_with_continuations():
    """The FULL capability in one proof chain: real EVM bytecode (mapping
    -slot keccak + storage updates) interpreted by the C-compiled guest,
    proven across RAM-image continuation chunks, with the post-state
    digest bound to the boundary publics (x10 = digest word0).
    Reference: zkvm/program/evm + zkvm/src/lib.rs:231."""
    from eigen_zkvm_tpu.zkvm.elf import elf_execute_and_prove
    from eigen_zkvm_tpu.zkvm.guest_keccak import keccak256_ref
    from eigen_zkvm_tpu.zkvm.rv32_lib import check_chain_publics

    K, A = 0xDEADBEEF, 12345
    calldata = K.to_bytes(32, "big") + A.to_bytes(32, "big")
    storage = {1: 41}
    rc, pairs, ret, dig, _gas = evm_mirror(TOKEN_CODE, calldata, 0, storage)
    src = build_guest_source(TOKEN_CODE, calldata, 0, storage)
    proofs, pubs, machine, setup, ss = elf_execute_and_prove(
        c_to_elf(src), n_bits=16, n_queries=2,
        include_exec_in_image=False)
    assert len(proofs) >= 2, "should cross chunk boundaries"
    assert check_chain_publics(pubs)
    # post-state digest word0 (the guest's return value) in the publics
    assert pubs[-1]["x10_out"] == int.from_bytes(dig[:4], "little")
    # slot value provable end to end: the mirror says balances[slot] == A
    slot = int.from_bytes(keccak256_ref(
        K.to_bytes(32, "big") + (0).to_bytes(32, "big")), "big")
    assert dict(pairs)[slot] == A
