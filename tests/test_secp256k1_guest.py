"""In-guest ECDSA public-key recovery on the RV32 machine.

Reference capability: zkvm/program/evm/src/lib.rs:2-27 compiles revm +
k256 into the guest, so transaction signatures are recovered INSIDE the
proven execution.  These tests drive the native equivalent
(zkvm/guest_secp256k1.py): field-primitive guests differentially against
host bignum, full recovery bit-exact against the Python oracle, hint
soundness (a forged sqrt hint can only fail, never mis-recover), and a
real continuation chunk of the 15M-cycle guest proven and verified."""
import numpy as np
import pytest

from eigen_zkvm_tpu.zkvm import guest_secp256k1 as g
from eigen_zkvm_tpu.zkvm import rv32_native as rn
from eigen_zkvm_tpu.zkvm.cc import Compiler, c_to_elf, load_c_elf

pytestmark = pytest.mark.skipif(not rn.available(),
                                reason="native executor unavailable")

PRIV = 0xC0FFEE254729296A45A3885639AC7E10F9D54979787FA3A62E9E0C2F1B1B1B1B
K_NONCE = 0xA1B2C3D4E5F60718293A4B5C6D7E8F901122334455667788991011121314D00D


def _vector(msg: bytes):
    e = int.from_bytes(g.keccak256_ref(msg), "big")
    v, r, s = g.sign(e, PRIV, K_NONCE)
    return e, v, r, s


def _run_guest(src: str, max_cycles: int = 1 << 26):
    program, entry, image0, ram_words, mem_base = load_c_elf(c_to_elf(src))
    mem = {mem_base + i: int(w) for i, w in enumerate(image0) if w}
    ctx = rn.NativeRun(program, entry, mem_words=np.asarray(
        image0, dtype=np.uint32), mem_base=mem_base, n_words=ram_words)
    rc, cycles, _rows, _ = ctx.run(max_cycles=max_cycles)
    assert rc == rn.RV_HALTED, "guest did not halt"
    return ctx, cycles


def _read_out_addr(src: str, ctx) -> bytes:
    c = Compiler()
    c.compile(src)
    base, _t = c.globals["out_addr"]
    out = bytearray()
    for i in range(20):
        ba = base + i
        w = int(ctx.mem[(ba >> 2) - ctx.mem_base])
        out.append((w >> (8 * (ba & 3))) & 0xFF)
    return bytes(out)


def test_field_unit_guests_differential():
    import random

    rng = random.Random(77)
    for op, mod in (("mul_p", g.P), ("mul_n", g.N),
                    ("inv_p", g.P), ("inv_n", g.N)):
        a = rng.randrange(1, mod)
        b = rng.randrange(1, mod)
        ctx, _ = _run_guest(g.build_unit_source(op, a, b))
        assert ctx.regs[10] == 1, f"{op} mismatch vs host bignum"
    # fold boundary cases for the sparse mod-p reduction
    for a, b in ((g.P - 1, g.P - 1), (g.P - 1, 1), (2**256 % g.P, 977)):
        ctx, _ = _run_guest(g.build_unit_source("mul_p", a, b))
        assert ctx.regs[10] == 1


def test_ecrecover_bit_exact_vs_reference():
    for msg in (b"round-4 ecrecover vector", b"another message"):
        e, v, r, s = _vector(msg)
        expect = g.ecrecover_ref(e, v, r, s)
        assert expect == g.address_of(g.pubkey_of(PRIV))
        src = g.build_guest_source(e, v, r, s)
        ctx, cycles = _run_guest(src)
        assert ctx.regs[10] == 1, "guest reported invalid signature"
        assert _read_out_addr(src, ctx) == expect
        assert cycles > 10_000_000  # the real double-scalar mul ran


def test_flipped_v_recovers_the_other_candidate():
    e, v, r, s = _vector(b"round-4 ecrecover vector")
    src = g.build_guest_source(e, 1 - v, r, s)
    ctx, _ = _run_guest(src)
    assert ctx.regs[10] == 1
    other = g.ecrecover_ref(e, 1 - v, r, s)
    got = _read_out_addr(src, ctx)
    assert got == other and got != g.ecrecover_ref(e, v, r, s)


def test_forged_hint_fails_closed():
    """Soundness of the one guest hint: a wrong ry can only make the
    guest return 0 — never a recovered address."""
    e, v, r, s = _vector(b"round-4 ecrecover vector")
    good = g.sqrt_hint(r, v)
    for bad in (good ^ 1, (good + 1) % g.P, g.P - good):  # wrong parity too
        src = g.build_guest_source(e, v, r, s, ry_hint=bad)
        ctx, _ = _run_guest(src, max_cycles=1 << 22)
        assert ctx.regs[10] == 0, "forged hint must be rejected"


def test_out_of_range_signature_rejected():
    e, v, r, s = _vector(b"round-4 ecrecover vector")
    for rr, ss in ((g.N, s), (0, s), (r, g.N + 1), (r, 0)):
        src = g.build_guest_source(e, v, rr % 2**256, ss % 2**256)
        ctx, _ = _run_guest(src, max_cycles=1 << 22)
        assert ctx.regs[10] == 0


@pytest.mark.slow
def test_ecrecover_chunk_proves_with_continuations():
    """Chunk 0 of the 15M-cycle recovery guest proven on the RV32
    machine with RAM-image continuation digests, and the proof's
    boundary publics chain into the natively-computed image of chunk 1
    (reference: zkvm/src/lib.rs:319-365 chunk chaining)."""
    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.stark_verify import stark_verify
    from eigen_zkvm_tpu.zkvm.lib import default_struct
    from eigen_zkvm_tpu.zkvm.machine import ram_digest
    from eigen_zkvm_tpu.zkvm.rv32 import Rv32Machine

    e, v, r, s = _vector(b"round-4 ecrecover vector")
    src = g.build_guest_source(e, v, r, s)
    program, entry, image0, ram_words, mem_base = load_c_elf(c_to_elf(src))
    NB = 15  # image coprocessor needs 2*(2048/8)*39 = 19968 rows
    nc = rn.NativeChunker(program, entry, n_bits=NB, ram_words=ram_words,
                          image0=image0, mem_base=mem_base)
    assert len(nc.chunks) > 400  # ~15M cycles of real work
    machine = Rv32Machine(program, NB, ram_words=ram_words,
                          mem_base=mem_base)
    ss = default_struct(NB, 2)
    setup = StarkSetup(machine.const_pols, machine.pil, ss)
    states, image_in = nc.states_for(0)
    cm = machine.trace(states, image_in=image_in)
    proof = stark_gen(cm, machine.const_pols, setup.const_tree,
                      setup.starkinfo, setup.program, ss)
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                        setup.program)
    names = [p.name for p in machine.pil.publics]
    pubs = {n: int(proof.publics[i, 0]) for i, n in enumerate(names)}
    d_in = ram_digest(image_in)
    d_next = ram_digest(nc.chunks[1].image_in)
    for j in range(4):
        assert pubs[f"mem_in{j}"] == d_in[j]
        assert pubs[f"mem_out{j}"] == d_next[j], \
            "proof boundary digest must chain into chunk 1"
