"""Memory continuations: a RAM guest proving across >= 3 chunks with image
digests chained through the Poseidon-GL coprocessor section (reference
zkvm/src/lib.rs:215-223,319-365 — powdr bootloader page hashing)."""
import numpy as np
import pytest

from eigen_zkvm_tpu.zkvm.lib import (check_chunk_chain, default_struct,
                                     zkvm_execute_and_prove,
                                     zkvm_generate_chunks, zkvm_prove_only)
from eigen_zkvm_tpu.zkvm.machine import MiniRVMachine, ram_digest

# writes i into M[i mod 48] for i = 1..n, then sums M[0..47] — RAM state
# (not registers) carries the work product across chunk boundaries
MEMWALK = """
    in x1           # n iterations
    li x2, 0        # i
    li x3, 48       # image slots used
    li x4, 0        # scratch addr
loop:
    blt x2, x1, body
    j sum
body:
    addi x2, x2, 1
    blt x4, x3, nowrap
    li x4, 0
nowrap:
    sw x2, x4, 0
    addi x4, x4, 1
    j loop
sum:
    li x5, 0        # acc
    li x6, 0        # addr
rd:
    blt x6, x3, rl
    j done
rl:
    lw x7, x6, 0
    add x5, x5, x7
    addi x6, x6, 1
    j rd
done:
    halt
"""

NB = 10          # 1024-cycle chunks
RAM = 64         # image words (2 * 8 * 39 = 624 coprocessor rows)


def test_memwalk_three_chunks():
    n = 450  # ~7 cycles per iteration -> spans >= 3 chunks
    proofs, pubs, machine, setup, ss = zkvm_execute_and_prove(
        MEMWALK, [n], n_bits=NB, n_queries=2, ram_words=RAM)
    assert len(proofs) >= 3, f"expected >=3 chunks, got {len(proofs)}"
    assert check_chunk_chain(pubs, continuations=True)
    # final accumulator: sum of the image slots
    img = np.zeros(RAM, dtype=np.uint64)
    for i in range(1, n + 1):
        img[(i - 1) % 48] = i
    assert pubs[-1]["x5_out"] == int(img[:48].sum())
    # first chunk's incoming digest is the zero image's
    d0 = ram_digest(np.zeros(RAM, dtype=np.uint64))
    assert [pubs[0][f"mem_in{j}"] for j in range(4)] == d0


def test_tampered_boundary_image_rejected():
    """Proving chunk k+1 from a tampered incoming image yields digests that
    do not chain — and tampering the trace itself breaks the constraints."""
    program, chunks, final = zkvm_generate_chunks(
        MEMWALK, [450], n_bits=NB, ram_words=RAM)
    assert len(chunks) >= 3
    machine = MiniRVMachine(program, NB, ram_words=RAM)
    machine.set_tape([450])
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup

    ss = default_struct(NB, 2)
    setup = StarkSetup(machine.const_pols, machine.pil, ss)

    states0, image0 = chunks[0]
    states1, image1 = chunks[1]
    _, pubs0 = zkvm_prove_only(machine, setup, ss, states0, [450],
                               image_in=image0)

    tampered = image1.copy()
    tampered[3] ^= np.uint64(1)
    # tampering the incoming image either breaks the trace's own constraint
    # system (fresh-read lookup sees a value the image does not hold) or
    # shifts digest_in so the chunk chain no longer binds — both reject
    try:
        _, pubs_t = zkvm_prove_only(machine, setup, ss, states1, [450],
                                    image_in=tampered)
    except Exception:
        pass  # constraints rejected the inconsistent trace outright
    else:
        assert not check_chunk_chain([pubs0, pubs_t], continuations=True)

    # an honest chunk-1 proof chains; a forged digest public does not
    _, pubs1 = zkvm_prove_only(machine, setup, ss, states1, [450],
                               image_in=image1)
    assert check_chunk_chain([pubs0, pubs1], continuations=True)
    forged = dict(pubs1)
    forged["mem_in2"] ^= 1
    assert not check_chunk_chain([pubs0, forged], continuations=True)
