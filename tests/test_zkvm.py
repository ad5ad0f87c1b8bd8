"""zkVM: MiniRV execution, proving, continuations, input tape."""
import pytest

from eigen_zkvm_tpu.zkvm.guests import FIBONACCI, LINEAR_REGRESSION
from eigen_zkvm_tpu.zkvm.isa import assemble, execute
from eigen_zkvm_tpu.zkvm.lib import (check_chunk_chain,
                                     zkvm_execute_and_prove,
                                     zkvm_generate_chunks)


def _fib(n):
    a, b = 0, 1
    for _ in range(n):
        a, b = b, a + b
    return b % (1 << 32)


def test_executor():
    prog = assemble(FIBONACCI)
    _, final = execute(prog, [10])
    assert final.regs[3] == _fib(10)
    assert final.halted


def test_assembler_labels_and_pseudo():
    prog = assemble("""
        li x1, 5
    top: addi x1, x1, -1
        bne x1, x0, top
        halt
    """)
    _, final = execute(prog, [])
    assert final.regs[1] == 0


def test_fib_single_chunk_proof():
    proofs, pubs, machine, setup, ss = zkvm_execute_and_prove(
        FIBONACCI, [20], n_bits=10)
    assert len(proofs) == 1
    assert pubs[-1]["x3_out"] == _fib(20)
    assert pubs[0]["pc_in"] == 0


def test_fib_continuations():
    proofs, pubs, *_ = zkvm_execute_and_prove(FIBONACCI, [100], n_bits=8)
    assert len(proofs) >= 2
    assert pubs[-1]["x3_out"] == _fib(100)
    assert check_chunk_chain(pubs)
    # a broken chain is detected
    pubs[1]["pc_in"] += 1
    assert not check_chunk_chain(pubs)


def test_lr_guest():
    data = [(3, 7), (5, 11), (9, 20), (4, 9)]
    tape = [len(data)] + [v for xy in data for v in xy]
    proofs, pubs, *_ = zkvm_execute_and_prove(LINEAR_REGRESSION, tape,
                                              n_bits=10)
    n = len(data)
    sx = sum(x for x, _ in data)
    sy = sum(y for _, y in data)
    sxy = sum(x * y for x, y in data)
    sxx = sum(x * x for x, _ in data)
    assert pubs[-1]["x5_out"] == (n * sxy - sx * sy) % (1 << 32)
    assert pubs[-1]["x6_out"] == (n * sxx - sx * sx) % (1 << 32)


def test_tampered_trace_rejected():
    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.zkvm.lib import default_struct
    from eigen_zkvm_tpu.zkvm.machine import MiniRVMachine

    program, chunks, _ = zkvm_generate_chunks(FIBONACCI, [9], n_bits=10)
    machine = MiniRVMachine(program, 10)
    machine.set_tape([9])
    ss = default_struct(10, 3)
    setup = StarkSetup(machine.const_pols, machine.pil, ss)
    cm = machine.trace(chunks[0], [9])
    # tamper: claim a different fib output in the register column
    x3 = machine.m_x + 3
    cm.buffer[-1, x3] = (int(cm.buffer[-1, x3]) + 1) % (1 << 32)
    with pytest.raises(Exception):
        proof = stark_gen(cm, machine.const_pols, setup.const_tree,
                          setup.starkinfo, setup.program, ss)
        from eigen_zkvm_tpu.stark.stark_verify import stark_verify
        assert stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                            setup.program)


def test_gcd_guest_multichunk():
    from eigen_zkvm_tpu.zkvm.guests import GCD
    from eigen_zkvm_tpu.zkvm.lib import zkvm_execute_and_prove

    proofs, pubs, *_ = zkvm_execute_and_prove(GCD, [252, 105], n_bits=8)
    assert len(proofs) >= 1
    # final x2 register equals math.gcd(252, 105) = 21
    import math
    from eigen_zkvm_tpu.zkvm.isa import assemble, execute
    states = execute(assemble(GCD), [252, 105])
    assert states[-1].regs[2] == math.gcd(252, 105) == 21
