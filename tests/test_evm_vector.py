"""The reference's EVM workload: prove the reth.block.json state test.

Reference: zkvm/program/evm/src/lib.rs (revm-executed state test) +
zkvm/src/lib.rs:168-186 (prove with continuations) over
zkvm/test-vectors/reth.block.json.  Here the EIP-1559 transition runs as
an RV32IM guest with 256-bit limb arithmetic (zkvm/evm.py) and the run is
proven with RAM-image digests chained across chunks.
"""
import numpy as np
import pytest

VECTOR = "/root/reference/zkvm/test-vectors/reth.block.json"


def _mutate_tx(tx, **kw):
    out = dict(tx)
    out.update(kw)
    return out


def test_guest_matches_host_model_and_vector():
    """Pure execution (no proving): the guest's 256-bit transition equals
    both the python host model and the vector's expected postState."""
    from eigen_zkvm_tpu.zkvm.evm import (RAM_WORDS, STATUS_OK, TRANSFER_GUEST,
                                         apply_transaction_host, build_image,
                                         load_state_test, unpack_post)
    from eigen_zkvm_tpu.zkvm.rv32_isa import execute
    from eigen_zkvm_tpu.zkvm.rv32_lib import program_from_asm

    pre, env, tx, expected = load_state_test(VECTOR)
    img, addrs = build_image(pre, env, tx)
    mem = {a: int(v) for a, v in enumerate(img) if v}
    _, final = execute(program_from_asm(TRANSFER_GUEST), 0, mem=mem)
    assert final.halted
    fi = np.zeros(RAM_WORDS, dtype=np.uint64)
    for a, v in mem.items():
        fi[a] = v
    post, status, gas = unpack_post(fi, addrs)
    assert status == STATUS_OK and gas == 21000
    hpost, hstatus, hgas = apply_transaction_host(pre, env, tx)
    assert (hstatus, hgas) == (status, gas)
    for a, acc in expected.items():
        assert post[a]["balance"] == acc["balance"]
        assert post[a]["nonce"] == acc["nonce"]


def test_guest_rejects_invalid_transactions():
    """Nonce, balance and gas-limit validity checks run IN the guest."""
    from eigen_zkvm_tpu.zkvm.evm import (RAM_WORDS, STATUS_BAD_NONCE,
                                         STATUS_GAS_LIMIT,
                                         STATUS_INSUFFICIENT, TRANSFER_GUEST,
                                         build_image, load_state_test,
                                         unpack_post)
    from eigen_zkvm_tpu.zkvm.rv32_isa import execute
    from eigen_zkvm_tpu.zkvm.rv32_lib import program_from_asm

    pre, env, tx, _ = load_state_test(VECTOR)
    prog = program_from_asm(TRANSFER_GUEST)

    def run(tx2, pre2=None):
        img, addrs = build_image(pre2 or pre, env, tx2)
        mem = {a: int(v) for a, v in enumerate(img) if v}
        _, final = execute(prog, 0, mem=mem)
        assert final.halted
        fi = np.zeros(RAM_WORDS, dtype=np.uint64)
        for a, v in mem.items():
            fi[a] = v
        return unpack_post(fi, addrs)

    _, status, _ = run(_mutate_tx(tx, nonce="0x7"))
    assert status == STATUS_BAD_NONCE
    _, status, _ = run(_mutate_tx(tx, gasLimit=["0x100"]))
    assert status == STATUS_GAS_LIMIT
    poor = {a: dict(acc) for a, acc in pre.items()}
    poor[tx["sender"].lower()] = dict(poor[tx["sender"].lower()],
                                      balance=0x1000)
    post, status, _ = run(tx, poor)
    assert status == STATUS_INSUFFICIENT
    # balances untouched on rejection
    assert post[tx["sender"].lower()]["balance"] == 0x1000
    assert post[tx["sender"].lower()]["nonce"] == 0


@pytest.mark.slow
def test_reth_block_vector_proves_end_to_end():
    """The full pipeline: pack pre-state, prove the RV32IM run across >= 2
    chunks with chained RAM-image digests, unpack + match the expected
    postState (reference test/stark_aggregation.sh zkVM leg on
    reth.block.json)."""
    from eigen_zkvm_tpu.zkvm.evm import STATUS_OK, prove_state_test
    from eigen_zkvm_tpu.zkvm.rv32_lib import check_chain_publics

    res = prove_state_test(VECTOR, n_bits=11, rows_budget=512)
    assert res["status"] == STATUS_OK and res["gas_used"] == 21000
    assert res["n_chunks"] >= 2, "should exercise continuations"
    assert check_chain_publics(res["publics"])


@pytest.mark.slow
def test_tampered_boundary_image_rejected():
    """Forging a RAM word at a chunk boundary breaks the digest chain."""
    from eigen_zkvm_tpu.zkvm.evm import (RAM_WORDS, TRANSFER_GUEST,
                                         build_image, load_state_test)
    from eigen_zkvm_tpu.zkvm.machine import ram_digest
    from eigen_zkvm_tpu.zkvm.rv32_lib import (check_chain_publics,
                                              program_from_asm,
                                              rv32_generate_chunks)

    pre, env, tx, _ = load_state_test(VECTOR)
    img, _ = build_image(pre, env, tx)
    prog = program_from_asm(TRANSFER_GUEST)
    chunks, _ = rv32_generate_chunks(prog, n_bits=11, ram_words=RAM_WORDS,
                                     image0=img, rows_budget=512)
    assert len(chunks) >= 2
    # honest publics = digests of the true boundary images; forging the
    # sender balance limb in chunk 1's incoming image breaks the chain
    d_honest = [ram_digest(c[1]) for c in chunks]
    forged = chunks[1][1].copy()
    forged[34] = int(forged[34]) ^ 0x1  # sender balance limb 0
    d_forged = ram_digest(forged)
    pubs = [
        {f"mem_out{j}": d_honest[1][j] for j in range(4)},
        {f"mem_in{j}": d_forged[j] for j in range(4)},
    ]
    assert not check_chain_publics(pubs)
    honest = [
        {f"mem_out{j}": d_honest[1][j] for j in range(4)},
        {f"mem_in{j}": d_honest[1][j] for j in range(4)},
    ]
    assert check_chain_publics(honest)


@pytest.mark.slow
def test_evm_chunk_chain_bound_in_circuit():
    """VERDICT r2 #6: the reth-vector RV32 chunks go through ChainMap
    AGGREGATION — mem_in/mem_out digests chained INSIDE the aggregated
    proof — and a non-chaining chunk pair is rejected by the aggregation
    circuit itself (no host-side check_chain_publics involved).
    Reference: zkvm/src/lib.rs:319-365 + stark_aggregation.sh:82-160."""
    from eigen_zkvm_tpu.recursion.aggregation import aggregate_recursive1
    from eigen_zkvm_tpu.recursion.compressor12 import (ChainMap, StarkOption,
                                                       prove_compressed)
    from eigen_zkvm_tpu.recursion.stark_verifier_circuit import build_main
    from eigen_zkvm_tpu.stark.serializer import (join_zkin_chain,
                                                 stark_proof_to_dict)
    from eigen_zkvm_tpu.zkvm.evm import STATUS_OK, prove_state_test

    res = prove_state_test(VECTOR, n_bits=11, rows_budget=512)
    assert res["status"] == STATUS_OK and res["n_chunks"] >= 2
    proofs, pubs = res["proofs"], res["publics"]
    machine, setup, ss = res["machine"], res["setup"], res["ss"]
    zkins = [stark_proof_to_dict(p, "GL") for p in proofs[:2]]

    Q, FORCE = 1, 17
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
    names = [p.name for p in machine.pil.publics]
    got = {nm: int(v) for nm, v in zip(names, final_zkin["publics"])}
    for j in range(4):
        assert got[f"mem_in{j}"] == pubs[0][f"mem_in{j}"]
        assert got[f"mem_out{j}"] == pubs[1][f"mem_out{j}"]

    # negative: chunk 0 joined with ITSELF is two individually-valid
    # proofs whose boundary digests do NOT chain (mem_out of 0 != mem_in
    # of 0) — the aggregation circuit must reject the witness
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

    assert rejected(r1_zkins[0], r1_zkins[0]), \
        "non-chaining EVM chunk boundary must fail the aggregation circuit"
