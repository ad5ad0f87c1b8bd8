"""Native (C++) RV32IM executor vs the Python semantic authority.

The reference runs guests through compiled Rust (powdr executor,
zkvm/src/lib.rs:168-231); native/rv32_exec.cpp is that runtime here.
These tests drive both executors over the same guests and assert
state-for-state equality, plus chunk-boundary equality of the native
continuation chunker against rv32_lib.rv32_generate_chunks."""
import numpy as np
import pytest

from eigen_zkvm_tpu.zkvm import rv32_native as rn
from eigen_zkvm_tpu.zkvm.cc import c_to_elf, load_c_elf
from eigen_zkvm_tpu.zkvm.rv32_isa import execute
from eigen_zkvm_tpu.zkvm.rv32_lib import program_from_asm, \
    rv32_generate_chunks

pytestmark = pytest.mark.skipif(not rn.available(),
                                reason="native executor unavailable")

# exercises every op class incl. RV32IM edge cases the spec calls out
EDGE_ASM = """
    li   x5, -2147483648
    li   x6, -1
    div  x7, x5, x6          # overflow -> MIN_INT
    rem  x8, x5, x6          # overflow -> 0
    li   x6, 0
    div  x9, x5, x6          # by zero -> -1
    rem  x10, x5, x6         # by zero -> a
    divu x11, x5, x6
    remu x12, x5, x6
    li   x6, 3
    mulh x13, x5, x6
    mulhu x14, x5, x6
    mulhsu x15, x5, x6
    li   x20, 0x100
    li   x21, 0x87654321
    sw   x21, 0(x20)
    lb   x22, 1(x20)         # sign-extended 0x43
    lbu  x23, 3(x20)         # 0x87
    lh   x24, 2(x20)         # sign-extended 0x8765
    lhu  x25, 2(x20)
    sb   x22, 5(x20)
    sh   x24, 6(x20)
    lw   x26, 4(x20)
    sra  x27, x21, x6
    srl  x28, x21, x6
    jal  x1, past
    addi x29, x29, 99        # skipped by the jal
past:
    sltiu x30, x21, -1       # unsigned imm compare
    ecall
"""


def _diff_states(program, mem=None, n_words=1 << 12, mem_base=0):
    states, final_py = execute(program, 0, mem=dict(mem or {}))
    ctx = rn.NativeRun(program, 0, n_words=n_words, mem_base=mem_base)
    if mem:
        for a, v in mem.items():
            ctx.mem[a - mem_base] = v
    rc, ncyc, _rows, trace = ctx.run(capture=True, max_cycles=1 << 22)
    st_nat = rn.materialize_states([0] * 32, 0, trace, ncyc,
                                   int(ctx.pc[0]), rc == rn.RV_HALTED)
    assert len(st_nat) == len(states)
    for i, (a, b) in enumerate(zip(states, st_nat)):
        assert (a.pc, a.regs, a.mem_op, a.halted) == \
            (b.pc, b.regs, b.mem_op, b.halted), f"state {i} diverges"
    return final_py


def test_edge_ops_state_for_state():
    _diff_states(program_from_asm(EDGE_ASM))


def test_c_guest_state_for_state():
    src = r"""
int fib(int n) { if (n < 2) return n; return fib(n-1) + fib(n-2); }
int main() { return fib(12); }
"""
    program, entry, image0, ram_words, mem_base = load_c_elf(c_to_elf(src))
    mem = {mem_base + i: int(w) for i, w in enumerate(image0) if w}
    states, final_py = execute(program, entry, mem=dict(mem))
    final_nat, cycles = rn.execute_native(
        program, entry, mem=dict(mem), n_words=ram_words,
        mem_base=mem_base)
    assert cycles + 1 == len(states)
    assert final_nat.regs == final_py.regs and final_nat.pc == final_py.pc
    assert final_nat.regs[10] == 144


def test_native_chunker_matches_python_chunker():
    """Identical chunk boundaries, images, and per-chunk states."""
    src = r"""
unsigned acc[16];
int main() {
    int i; int j; unsigned s = 1u;
    for (i = 0; i < 40; i++) {
        s = s * 1103515245u + 12345u;
        acc[i & 15] = acc[i & 15] ^ s;
        for (j = 0; j < 3; j++) s = s ^ (s >> 7);
    }
    return (int)(acc[5] & 0x7FFFFFFFu);
}
"""
    program, entry, image0, ram_words, mem_base = load_c_elf(c_to_elf(src))
    chunks, final = rv32_generate_chunks(
        program, entry, n_bits=8, ram_words=ram_words,
        image0=image0, mem_base=mem_base)
    nc = rn.NativeChunker(program, entry, n_bits=8, ram_words=ram_words,
                          image0=image0, mem_base=mem_base)
    assert len(nc.chunks) == len(chunks)
    assert nc.final.regs == final.regs and nc.final.pc == final.pc
    for k, (states_py, image_py) in enumerate(chunks):
        states_nat, image_nat = nc.states_for(k)
        assert np.array_equal(image_py, image_nat), f"chunk {k} image"
        assert len(states_nat) == len(states_py), f"chunk {k} length"
        for i, (a, b) in enumerate(zip(states_py, states_nat)):
            assert (a.pc, a.regs, a.mem_op, a.halted) == \
                (b.pc, b.regs, b.mem_op, b.halted), f"chunk {k} state {i}"


def test_jump_into_gap_slot_errors():
    """A jump into an inter-instruction gap must fail in BOTH executors:
    the Python authority raises (unmapped pc), and the native executor
    returns RV_ERR_PC (gap slots are op id 255, not silent NOPs)."""
    from eigen_zkvm_tpu.zkvm.rv32_isa import RvInstr

    program = {0: RvInstr("jal", rd=0, imm=4),   # jump to pc 4 (a gap)
               8: RvInstr("ecall")}              # never reached
    with pytest.raises(KeyError):
        execute(program, 0)
    ctx = rn.NativeRun(program, 0, n_words=64)
    with pytest.raises(AssertionError, match="rc=-1"):
        ctx.run(max_cycles=16)


def test_chunker_halt_on_exact_budget_boundary():
    """An ecall landing exactly on the row budget: the replay's cycle cap
    exits with RV_CYCLES before re-fetching the ecall, so states_for must
    take haltedness from the authoritative first run (ADVICE r4)."""
    budget = 8
    # 7 addis + ecall: the first chunk's rows hit the budget (budget-1=7
    # non-ecall rows) with the ecall exactly on the boundary row
    asm = "\n".join(["addi x5, x5, 1"] * (budget - 1)) + "\n    ecall\n"
    program = program_from_asm(asm)
    chunks_py, final_py = rv32_generate_chunks(program, 0, n_bits=3,
                                               ram_words=64)
    nc = rn.NativeChunker(program, 0, n_bits=3, ram_words=64)
    assert nc.chunks[-1].halted
    assert len(nc.chunks) == len(chunks_py)
    for k, (states_py, image_py) in enumerate(chunks_py):
        states_nat, image_nat = nc.states_for(k)
        assert len(states_nat) == len(states_py)
        assert states_nat[-1].halted == states_py[-1].halted, f"chunk {k}"
    assert states_nat[-1].halted  # the final chunk really is final


def test_throughput_is_native_class():
    """The executor must be orders of magnitude past the interpreter —
    a >=10M instr/s floor keeps accidental Python fallbacks visible."""
    import time

    src = "int main(){unsigned i;unsigned s=0u;" \
          "for(i=0u;i<400000u;i++)s+=i^(s>>3);return (int)(s&1023u);}"
    program, entry, image0, ram_words, mem_base = load_c_elf(c_to_elf(src))
    t0 = time.time()
    final, cycles = rn.execute_native(
        program, entry,
        mem={mem_base + i: int(w) for i, w in enumerate(image0) if w},
        n_words=ram_words, mem_base=mem_base, max_cycles=1 << 26)
    dt = time.time() - t0
    assert cycles > 2_000_000
    assert cycles / dt > 10e6, f"only {cycles/dt/1e6:.1f}M instr/s"
