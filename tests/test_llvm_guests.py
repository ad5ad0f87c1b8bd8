"""Foreign-toolchain (LLVM RISC-V backend) guest fixtures.

The committed ELFs under eigen_zkvm_tpu/data/llvm_guests were produced
by the system libLLVM-15's own RV32 instruction selector at -O2
(scripts/dev/build_llvm_guests.py) — codegen patterns the in-repo
toolchain never emits (auipc-relative data access, magic-number signed
division, optimizer branch shapes, mulh/mulhu from widening i64
multiplies).  Reference analog: powdr compile_rust guests,
/root/reference/zkvm/src/lib.rs:172.
"""
import pytest

from eigen_zkvm_tpu.zkvm import guests_llvm as gl
from eigen_zkvm_tpu.zkvm import llvm_backend as lb
from eigen_zkvm_tpu.zkvm.elf import load_elf
from eigen_zkvm_tpu.zkvm.rv32_isa import execute


def _run_elf(elf):
    program, entry, image0, ram_words, mem_base = load_elf(
        elf, include_exec_in_image=False)
    mem = {mem_base + i: int(w) for i, w in enumerate(image0) if w}
    states, final = execute(program, entry, mem=mem, max_cycles=1 << 23)
    return program, states, final


@pytest.mark.parametrize("name", sorted(gl.GUESTS))
def test_committed_fixture_executes_correctly(name):
    elf = gl.load_fixture(name)
    program, states, final = _run_elf(elf)
    want = gl.GUESTS[name][1]()
    assert final.regs[10] == want & 0xFFFFFFFF, name


def test_fixtures_exercise_foreign_codegen_patterns():
    """The fixtures must contain encodings cc.py never emits: auipc
    -relative addressing beyond the _start stub, and (muldiv) the
    mulh/mulhu selections from widening multiplies."""
    from eigen_zkvm_tpu.zkvm.cc import Compiler  # noqa: F401 (doc anchor)

    prog_crc, _, _ = _run_elf(gl.load_fixture("crc32"))
    auipcs = [pc for pc, ins in prog_crc.items() if ins.op == "auipc"]
    # one auipc belongs to the _start call stub; data access needs more
    assert len(auipcs) >= 2, "expected auipc-relative data addressing"
    prog_md, _, _ = _run_elf(gl.load_fixture("muldiv"))
    ops = {ins.op for ins in prog_md.values()}
    assert "mulhu" in ops and "mulh" in ops, ops


@pytest.mark.skipif(not lb.available(), reason="libLLVM unavailable")
def test_fixtures_rebuild_byte_identical():
    """Rebuilding from the committed IR through the pinned libLLVM-15
    reproduces the committed bytes exactly (provenance check)."""
    for name, (ir, _exp) in gl.GUESTS.items():
        assert lb.ir_to_elf(ir) == gl.load_fixture(name), name


@pytest.mark.skipif(not lb.available(), reason="libLLVM unavailable")
def test_linker_handles_pcrel_pairs():
    """A fresh compile exercises the PCREL_HI20/LO12 pairing in the
    linker (auipc+addi across a >4K text/data distance)."""
    IR = """
@big = internal global [32 x i32] zeroinitializer, align 4
define i32 @main() {
entry:
  %p = getelementptr [32 x i32], [32 x i32]* @big, i32 0, i32 5
  store i32 777, i32* %p
  %v = load i32, i32* %p
  ret i32 %v
}
"""
    _prog, _st, final = _run_elf(lb.ir_to_elf(IR))
    assert final.regs[10] == 777


@pytest.mark.slow
def test_llvm_guest_proves_with_continuations():
    """A foreign-codegen binary proven through the full pipeline with
    RAM-image continuation digests — decode/semantics facing optimizer
    output end to end."""
    from eigen_zkvm_tpu.zkvm.elf import elf_execute_and_prove
    from eigen_zkvm_tpu.zkvm.rv32_lib import check_chain_publics

    elf = gl.load_fixture("crc32")
    # 2^16 rows: the 4096-word RAM image needs 39936 coprocessor rows
    proofs, pubs, machine, setup, ss = elf_execute_and_prove(
        elf, n_bits=16, n_queries=2, include_exec_in_image=False)
    assert len(proofs) >= 1
    assert check_chain_publics(pubs)
    assert pubs[-1]["x10_out"] == gl.crc32_expected()
