"""zkVM orchestration: execute, chunk, prove, verify — the native analog of
the reference's powdr wrapper (zkvm/src/lib.rs: zkvm_execute_and_prove :168,
zkvm_generate_chunks :231, zkvm_prove_only :280).

Continuations: an unbounded execution is split into fixed 2^n_bits-cycle
chunks; each chunk proof exposes its incoming/outgoing machine state (pc,
registers, tape position) as publics, and `check_chunk_chain` verifies the
boundary handoff — the powdr-bootloader analog.  Chunk proofs are
independent (data-parallel across hosts) and aggregate through the standard
recursion layers (recursion/compressor12.py + join_zkin).
"""
from __future__ import annotations

import numpy as np

from ..stark.stark_gen import stark_gen
from ..stark.stark_setup import StarkSetup
from ..stark.stark_verify import stark_verify
from ..stark.types import StarkStruct, Step
from .isa import Instr, N_REGS, State, assemble, execute
from .machine import MiniRVMachine


def default_struct(n_bits: int, n_queries: int = 8,
                   hash_type: str = "GL") -> StarkStruct:
    steps = []
    nb = n_bits + 1
    while nb > 5:
        steps.append(Step(nb))
        nb -= 4
    steps.append(Step(nb))
    return StarkStruct(nBits=n_bits, nBitsExt=n_bits + 1, nQueries=n_queries,
                       verificationHashType=hash_type, steps=steps)


def zkvm_generate_chunks(program, inputs, n_bits: int = 12,
                         max_cycles: int = 1 << 22):
    """Execute and split into chunk state-lists of exactly 2^n_bits states
    (the last chunk halts and may be shorter).  Returns (chunks, final)."""
    if isinstance(program, str):
        program = assemble(program)
    N = 1 << n_bits
    states, final = execute(program, inputs, max_cycles=max_cycles)
    assert final.halted, "execution exceeded max_cycles"
    chunks = []
    pos = 0
    while True:
        chunk = states[pos : pos + N]
        chunks.append(chunk)
        if pos + N >= len(states):
            break
        pos += N - 1  # the boundary state is shared between chunks
    return program, chunks, final


def zkvm_prove_only(machine: MiniRVMachine, setup, ss, chunk_states, inputs):
    """Prove one chunk; returns (proof, publics dict)."""
    cm = machine.trace(chunk_states, inputs)
    proof = stark_gen(cm, machine.const_pols, setup.const_tree,
                      setup.starkinfo, setup.program, ss)
    ok = stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                      setup.program)
    if not ok:
        raise RuntimeError("chunk proof failed self-verification")
    names = [p.name for p in machine.pil.publics]
    vals = {n: int(proof.publics[i, 0]) for i, n in enumerate(names)}
    return proof, vals


def check_chunk_chain(publics_list) -> bool:
    """Boundary handoff: chunk k's outgoing state == chunk k+1's incoming."""
    for a, b in zip(publics_list, publics_list[1:]):
        if a["pc_out"] != b["pc_in"]:
            return False
        if a["in_idx_out"] != b["in_idx_in"]:
            return False
        for i in range(N_REGS):
            if a[f"x{i}_out"] != b[f"x{i}_in"]:
                return False
    return True


def zkvm_execute_and_prove(program, inputs, n_bits: int = 12,
                           ss: StarkStruct | None = None,
                           n_queries: int = 3):
    """Full pipeline: assemble/execute, chunk, prove every chunk, check the
    continuation chain.  Returns (proofs, publics_list, machine, setup, ss).
    """
    program, chunks, final = zkvm_generate_chunks(program, inputs, n_bits)
    machine = MiniRVMachine(program, n_bits)
    machine.set_tape(inputs)
    ss = ss or default_struct(n_bits, n_queries)
    setup = StarkSetup(machine.const_pols, machine.pil, ss)
    proofs = []
    publics_list = []
    for chunk in chunks:
        proof, pubs = zkvm_prove_only(machine, setup, ss, chunk, inputs)
        proofs.append(proof)
        publics_list.append(pubs)
    if not check_chunk_chain(publics_list):
        raise RuntimeError("chunk chain mismatch")
    if publics_list[0]["pc_in"] != 0 or publics_list[0]["in_idx_in"] != 0:
        raise RuntimeError("chunk 0 does not start at the initial state")
    return proofs, publics_list, machine, setup, ss
