"""Memory continuations: a RAM guest proving across >= 3 chunks with image
digests chained through the Poseidon-GL coprocessor section (reference
zkvm/src/lib.rs:215-223,319-365 — powdr bootloader page hashing)."""
import numpy as np
import pytest

from eigen_zkvm_tpu.zkvm.lib import (check_chunk_chain, default_struct,
                                     zkvm_execute_and_prove,
                                     zkvm_generate_chunks, zkvm_prove_only)
from eigen_zkvm_tpu.zkvm.machine import MiniRVMachine, ram_digest

# writes i into M[i mod slots] for i = 1..n, then sums M[0..slots) — RAM
# state (not registers) carries the work product across chunk boundaries
MEMWALK = """
    in x1           # n iterations
    li x2, 0        # i
    in x3           # image slots used
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
        MEMWALK, [n, 48], n_bits=NB, n_queries=2, ram_words=RAM)
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
        MEMWALK, [450, 48], n_bits=NB, ram_words=RAM)
    assert len(chunks) >= 3
    machine = MiniRVMachine(program, NB, ram_words=RAM)
    machine.set_tape([450, 48])
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup

    ss = default_struct(NB, 2)
    setup = StarkSetup(machine.const_pols, machine.pil, ss)

    states0, image0 = chunks[0]
    states1, image1 = chunks[1]
    _, pubs0 = zkvm_prove_only(machine, setup, ss, states0, [450, 48],
                               image_in=image0)

    tampered = image1.copy()
    tampered[3] ^= np.uint64(1)
    # tampering the incoming image either breaks the trace's own constraint
    # system (fresh-read lookup sees a value the image does not hold) or
    # shifts digest_in so the chunk chain no longer binds — both reject
    try:
        _, pubs_t = zkvm_prove_only(machine, setup, ss, states1, [450, 48],
                                    image_in=tampered)
    except Exception:
        pass  # constraints rejected the inconsistent trace outright
    else:
        assert not check_chunk_chain([pubs0, pubs_t], continuations=True)

    # an honest chunk-1 proof chains; a forged digest public does not
    _, pubs1 = zkvm_prove_only(machine, setup, ss, states1, [450, 48],
                               image_in=image1)
    assert check_chunk_chain([pubs0, pubs1], continuations=True)
    forged = dict(pubs1)
    forged["mem_in2"] ^= 1
    assert not check_chunk_chain([pubs0, forged], continuations=True)


@pytest.mark.slow
def test_chained_aggregation_in_circuit():
    """The aggregation circuit PROVES the chunk chain: chunk k's out-state
    publics equal chunk k+1's in-state publics in-circuit, and a forged
    boundary register makes the aggregation witness fail (reference
    test/stark_aggregation.sh:82-160 + zkvm/src/lib.rs:319)."""
    from eigen_zkvm_tpu.recursion.aggregation import aggregate_recursive1
    from eigen_zkvm_tpu.recursion.compressor12 import (ChainMap, StarkOption,
                                                       prove_compressed)
    from eigen_zkvm_tpu.stark.serializer import (join_zkin_chain,
                                                 stark_proof_to_dict)
    from eigen_zkvm_tpu.recursion.stark_verifier_circuit import build_main

    nb, ram, slots, n = 9, 32, 24, 220
    proofs, pubs, machine, setup, ss = zkvm_execute_and_prove(
        MEMWALK, [n, slots], n_bits=nb, n_queries=2, ram_words=ram)
    assert len(proofs) >= 3
    zkins = [stark_proof_to_dict(p, "GL") for p in proofs]

    # recursion layers: c12 per chunk, then r1 at a shared size
    Q, FORCE = 2, 16
    r1_zkins = []
    r1_bundle = None
    for z in zkins:
        c12_proof, (c12_setup, c12_ss, _) = prove_compressed(
            z, setup, ss, StarkOption(skip_main=True), n_queries=Q)
        r1_proof, r1_bundle = prove_compressed(
            stark_proof_to_dict(c12_proof, "GL"), c12_setup, c12_ss,
            StarkOption(), n_queries=Q, force_n_bits=FORCE)
        r1_zkins.append(stark_proof_to_dict(r1_proof, "GL"))
    r1_setup, r1_ss, _ = r1_bundle

    chain = ChainMap.for_machine(machine)
    final_zkin, _ = aggregate_recursive1(
        r1_zkins, r1_setup, r1_ss, force_n_bits=FORCE, n_queries=Q,
        chain_map=chain)

    # super-chunk publics: in-state from chunk 0, out-state from the last
    names = [p.name for p in machine.pil.publics]
    got = {nm: int(v) for nm, v in zip(names, final_zkin["publics"])}
    assert got["pc_in"] == pubs[0]["pc_in"]
    assert got["x5_out"] == pubs[-1]["x5_out"]
    for j in range(4):
        assert got[f"mem_in{j}"] == pubs[0][f"mem_in{j}"]
        assert got[f"mem_out{j}"] == pubs[-1][f"mem_out{j}"]

    # non-chaining boundary: chunks 0 and 2 are each INDIVIDUALLY valid
    # proofs, but 0's out-state != 2's in-state — only the in-circuit
    # chain-binding constraints can reject this pair (the host check is
    # bypassed entirely).  The builder reports the unsatisfiable witness
    # as a build-time assertion.
    def rejected(a, b_):
        try:
            bad = build_main(join_zkin_chain(a, b_, chain),
                             r1_setup.starkinfo, r1_setup.program, r1_ss,
                             r1_setup.const_root,
                             r1_setup.starkinfo.n_publics,
                             StarkOption(verkey_input=True, agg_stage=True,
                                         chain_map=chain))
            return not bad.check()
        except AssertionError:
            return True

    assert rejected(r1_zkins[0], r1_zkins[2]), \
        "skipped-chunk boundary must fail the aggregation circuit"

    # forged public: also rejected (breaks chunk 2's own verification)
    forged = dict(r1_zkins[1])
    fp = list(forged["publics"])
    fp[names.index("x5_in")] = str((int(fp[names.index("x5_in")]) + 1)
                                   % 0xFFFFFFFF00000001)
    forged["publics"] = fp
    assert rejected(r1_zkins[0], forged), \
        "forged boundary state must fail the aggregation circuit"
