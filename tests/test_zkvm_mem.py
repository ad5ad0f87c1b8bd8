"""zkVM RAM: lw/sw semantics, the sorted-memory argument, and the
EVM-subset interpreter guest (reference zkvm/program/evm analog)."""
import numpy as np
import pytest

from eigen_zkvm_tpu.zkvm import guests, isa
from eigen_zkvm_tpu.zkvm.lib import default_struct, zkvm_execute_and_prove
from eigen_zkvm_tpu.zkvm.machine import MiniRVMachine


def test_lw_sw_executor():
    prog = isa.assemble("""
        li x1, 0x40
        li x2, 123
        sw x2, x1, 0
        sw x2, x1, 1
        lw x3, x1, 0
        lw x4, x1, 7    # never written: zero-initialized RAM
        halt
    """)
    _, final = isa.execute(prog, [])
    assert final.regs[3] == 123
    assert final.regs[4] == 0


def test_memsum_proof():
    proofs, pubs, *_ = zkvm_execute_and_prove(
        guests.MEMSUM, [4, 10, 20, 30, 40], n_bits=10)
    assert len(proofs) == 1
    assert pubs[-1]["x7_out"] == 100


def test_evm_guest_proof():
    # EVM bytecode (one byte per word): 5 * (3 + 4) - 2 = 33
    code = [0x60, 2, 0x60, 4, 0x60, 3, 0x01, 0x60, 5, 0x02, 0x03, 0x00]
    proofs, pubs, *_ = zkvm_execute_and_prove(
        guests.EVM, [len(code)] + code, n_bits=10)
    assert pubs[-1]["x10_out"] == 33


def test_tampered_memory_read_rejected():
    """Changing a loaded value breaks the memory permutation argument."""
    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.stark_verify import stark_verify

    tape = [2, 10, 20]
    prog = isa.assemble(guests.MEMSUM)
    machine = MiniRVMachine(prog, n_bits=10)
    machine.set_tape(tape)
    states, _ = isa.execute(prog, tape)
    cm = machine.trace(states, tape)
    # find a lw row (sel col for "lw") and bump its loaded value
    lw_sel = machine.m_sel + isa.OPS.index("lw")
    rows = np.nonzero(cm.buffer[:, lw_sel])[0]
    assert len(rows)
    cm.buffer[rows[0], machine.m_rdv] += 1
    ss = default_struct(10, n_queries=8)
    setup = StarkSetup(machine.const_pols, machine.pil, ss)
    ok = True
    try:
        proof = stark_gen(cm, machine.const_pols, setup.const_tree,
                          setup.starkinfo, setup.program, ss)
        ok = stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                          setup.program)
    except Exception:
        ok = False
    assert not ok, "tampered memory read produced a verifying proof"


def test_ram_multi_chunk_rejected():
    prog = isa.assemble(guests.MEMSUM)
    machine = MiniRVMachine(prog, n_bits=10)
    # a fake non-halted chunk of exactly N states must be refused
    states, _ = isa.execute(prog, [4, 1, 2, 3, 4])
    fake = [states[0]] * machine.N
    with pytest.raises(NotImplementedError):
        machine.trace(fake, [4, 1, 2, 3, 4])


BITWISE_GUEST = """
    in   x1
    in   x2
    and  x3, x1, x2
    or   x4, x1, x2
    xor  x5, x1, x2
    mulh x6, x1, x2
    halt
"""


def test_bitwise_mulh_proof():
    a, b = 0xDEADBEEF, 0x12345678
    proofs, pubs, *_ = zkvm_execute_and_prove(BITWISE_GUEST, [a, b],
                                              n_bits=10)
    assert pubs[-1]["x3_out"] == a & b
    assert pubs[-1]["x4_out"] == a | b
    assert pubs[-1]["x5_out"] == a ^ b
    assert pubs[-1]["x6_out"] == (a * b) >> 32


def test_tampered_bitwise_rejected():
    """A wrong AND result must fail the nibble-table lookup."""
    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.stark_verify import stark_verify

    a, b = 0xF0F0A5A5, 0x0FF055AA
    prog = isa.assemble(BITWISE_GUEST)
    machine = MiniRVMachine(prog, n_bits=10)
    machine.set_tape([a, b])
    states, _ = isa.execute(prog, [a, b])
    cm = machine.trace(states, [a, b])
    and_row = 2  # third instruction
    cm.buffer[and_row, machine.m_no] ^= 1  # flip one result nibble bit
    cm.buffer[and_row, machine.m_rdv] ^= 1
    for k in range(4):
        cm.buffer[and_row, machine.m_bytes_rd + k] = \
            (int(cm.buffer[and_row, machine.m_rdv]) >> (8 * k)) & 0xFF
    from eigen_zkvm_tpu.zkvm.lib import default_struct

    ss = default_struct(10, n_queries=8)
    setup = StarkSetup(machine.const_pols, machine.pil, ss)
    ok = True
    try:
        proof = stark_gen(cm, machine.const_pols, setup.const_tree,
                          setup.starkinfo, setup.program, ss)
        ok = stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                          setup.program)
    except Exception:
        ok = False
    assert not ok, "tampered AND produced a verifying proof"
