"""Prove the in-guest secp256k1 ecrecover execution at scale.

The reference's flagship zkVM workload recovers transaction signers
inside the guest (zkvm/program/evm/src/lib.rs — revm + k256).  This
script proves our native equivalent: the 15.6M-cycle recovery guest
(zkvm/guest_secp256k1.py), executed by the native C++ executor, chunked
into row-budgeted continuation chunks with RAM-image digests, selected
chunks proven + verified on whichever engine stark/engine.py resolves
(recorded in the artifact's "engine" field), boundary digests checked
against the native image chain, and — when the final chunk is proven —
the recovered address extracted from the proven post-halt image and
compared to the oracle.

Writes BENCH_ECDSA.json:
  {"cycles": ..., "n_chunks": ..., "chunk_rows": ..., "trace_s": ...,
   "prove_s": ..., "total_s": ..., "address": "0x...", "verified": true}

Run:  python scripts/prove_ecrecover.py [--nbits 20] [--queries 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nbits", type=int, default=20)
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--max-chunks", type=int, default=0,
                    help="prove only the first K chunks (0 = all)")
    ap.add_argument("--chunks", default="",
                    help="comma-separated explicit chunk indices to prove "
                         "(negative = from the end); boundary digests of "
                         "every proven chunk still verify against the "
                         "natively-computed image chain")
    ap.add_argument("-o", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_ECDSA.json"))
    args = ap.parse_args()

    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.stark_verify import stark_verify
    from eigen_zkvm_tpu.utils import structlog
    from eigen_zkvm_tpu.zkvm import guest_secp256k1 as g
    from eigen_zkvm_tpu.zkvm import rv32_native as rn
    from eigen_zkvm_tpu.zkvm.cc import Compiler, c_to_elf, load_c_elf
    from eigen_zkvm_tpu.zkvm.lib import default_struct
    from eigen_zkvm_tpu.zkvm.machine import ram_digest
    from eigen_zkvm_tpu.zkvm.rv32 import Rv32Machine
    from eigen_zkvm_tpu.zkvm.rv32_lib import check_chain_publics

    t_all = time.time()
    priv = 0xC0FFEE254729296A45A3885639AC7E10F9D54979787FA3A62E9E0C2F1B1B1B1B
    e = int.from_bytes(g.keccak256_ref(b"round-4 ecrecover vector"), "big")
    k = 0xA1B2C3D4E5F60718293A4B5C6D7E8F901122334455667788991011121314D00D
    v, r, s = g.sign(e, priv, k)
    expect = g.ecrecover_ref(e, v, r, s)
    src = g.build_guest_source(e, v, r, s)
    program, entry, image0, ram_words, mem_base = load_c_elf(c_to_elf(src))

    nc = rn.NativeChunker(program, entry, n_bits=args.nbits,
                          ram_words=ram_words, image0=image0,
                          mem_base=mem_base)
    print(f"guest: {nc.total_cycles} cycles -> {len(nc.chunks)} chunks "
          f"of 2^{args.nbits} rows", flush=True)
    assert nc.final.regs[10] == 1, "guest reported invalid signature"

    machine = Rv32Machine(program, args.nbits, ram_words=ram_words,
                          mem_base=mem_base)
    ss = default_struct(args.nbits, args.queries)
    setup = StarkSetup(machine.const_pols, machine.pil, ss)
    names = [p.name for p in machine.pil.publics]

    if args.chunks:
        sel = [int(x) % len(nc.chunks) for x in args.chunks.split(",")]
    elif args.max_chunks:
        sel = list(range(min(args.max_chunks, len(nc.chunks))))
    else:
        sel = list(range(len(nc.chunks)))
    from eigen_zkvm_tpu.stark.engine import Engine
    engine_repr = repr(Engine(ss.nBitsExt))
    print(f"engine: {engine_repr}", flush=True)
    pubs_list = []
    trace_s = prove_s = 0.0
    # the natively-computed image at every chunk boundary: each PROVEN
    # chunk's in/out digests must match this chain, so proven chunks pin
    # the native execution at their boundaries even when a subset is
    # proven (the suite's slow test proves chunk 0; this artifact adds
    # the selected chunks at scale)
    for nth, kk in enumerate(sel):
        t0 = time.time()
        states, image_in = nc.states_for(kk)
        cm = machine.trace(states, image_in=image_in)
        del states
        t1 = time.time()
        with structlog.span("ecdsa.chunk_prove", chunk=kk,
                            nbits=args.nbits):
            proof = stark_gen(cm, machine.const_pols, setup.const_tree,
                              setup.starkinfo, setup.program, ss)
        del cm
        t2 = time.time()
        assert stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                            setup.program), f"chunk {kk} failed verify"
        pubs = {n: int(proof.publics[i, 0]) for i, n in enumerate(names)}
        d_in = ram_digest(image_in)
        # out-digest: the next chunk's entry image, or — for the final
        # chunk — the post-halt image the chunker snapshotted
        d_out = (ram_digest(nc.chunks[kk + 1].image_in)
                 if kk + 1 < len(nc.chunks)
                 else ram_digest(nc.final_image))
        for j in range(4):
            assert pubs[f"mem_in{j}"] == d_in[j], f"chunk {kk} in-digest"
            assert pubs[f"mem_out{j}"] == d_out[j], \
                f"chunk {kk} out-digest does not chain"
        pubs_list.append(pubs)
        trace_s += t1 - t0
        prove_s += t2 - t1
        print(f"chunk {kk} ({nth + 1}/{len(sel)}): trace {t1-t0:.1f}s "
              f"prove {t2-t1:.1f}s", flush=True)
    if sel == list(range(len(nc.chunks))):
        assert check_chain_publics(pubs_list), "digest chain broken"

    # The recovered address is bound into the proven chain whenever the
    # FINAL chunk is among the proven set: its mem_out publics are the
    # digest of the post-halt image (asserted above), and out_addr's
    # bytes extracted from that same image must equal the oracle address.
    c = Compiler()
    c.compile(src)
    base, _t = c.globals["out_addr"]
    addr_bytes = bytes(
        (int(nc.final_image[((base + i) >> 2) - mem_base])
         >> (8 * ((base + i) & 3))) & 0xFF for i in range(20))
    assert addr_bytes == expect, (
        f"recovered address in the proven final image "
        f"(0x{addr_bytes.hex()}) != oracle (0x{expect.hex()})")
    address_proven = (len(nc.chunks) - 1) in sel
    # per-stage split of the LAST proven chunk, when structured logging
    # is on (EIGEN_ZKVM_LOG=/path + EIGEN_ZKVM_PROFILE/SYNC): the
    # device-engine evidence the round-4 verdict asked for
    stages = {}
    log_path = os.environ.get("EIGEN_ZKVM_LOG", "")
    if log_path and os.path.isfile(log_path):
        runs, cur = [], {}
        with open(log_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("event") == "stark_gen.start":
                    cur = {}
                    runs.append(cur)
                elif rec.get("event") == "stark_gen.stage":
                    cur[rec["stage"]] = round(rec["wall"], 1)
        if runs:
            stages = runs[-1]
    res = {
        "cycles": int(nc.total_cycles),
        "n_chunks": len(nc.chunks),
        "chunks_proven": len(sel),
        "proven_indices": sel,
        "chunk_rows": 1 << args.nbits,
        "trace_s": round(trace_s, 1),
        "prove_s": round(prove_s, 1),
        "total_s": round(time.time() - t_all, 1),
        "address": "0x" + addr_bytes.hex(),
        "address_proven": address_proven,
        "engine": engine_repr,
        "stages_last_chunk_s": stages,
        "verified": True,
    }
    with open(args.o, "w") as f:
        json.dump(res, f)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
