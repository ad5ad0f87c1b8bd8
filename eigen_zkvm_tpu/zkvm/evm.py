"""EVM state-transition guest: prove the reference's reth.block.json.

The reference's flagship zkVM workload executes an Ethereum state test
(zkvm/test-vectors/reth.block.json) inside the guest via revm
(reference zkvm/program/evm/src/lib.rs:31-120, zkvm/src/lib.rs:168-186)
and proves the run with continuations.  This module is the native
counterpart: the EIP-1559 state transition — intrinsic-gas computation,
effective-gas-price selection, nonce/balance validity checks, and the
256-bit balance updates for sender/recipient/coinbase — runs as an RV32IM
guest (real machine encodings, zkvm/rv32_isa.py) over a word-packed
account RAM image, and the run is proven across chunks with the incoming/
outgoing RAM-image Poseidon digests chained as publics
(zkvm/continuations.py).  The host only packs the pre-state and unpacks
the post-state; every balance add/sub/compare and the gas arithmetic is
32-bit-limb guest code whose trace the machine PIL constrains.

256-bit values live in RAM as 8 little-endian u32 limbs.  The guest
implements add256/sub256/cmp256 carry chains with `sltu` and a 64x64->128
`mul`/`mulhu` product for gas*price fees — the same decomposition the TPU
Goldilocks engine uses (ops/gl_jax.py), here at the ISA level.

Scope: value-transfer transactions (recipient code empty), the exact
shape of the reference's test vector.  Bytecode-executing calls run
through the EVM interpreter guest (zkvm/guests.py EVM / EVM256).
"""
from __future__ import annotations

import json

import numpy as np

# ---- RAM image layout (word addresses; byte addr = 4 * word) ----
# 0   n_accounts
# 1   sender account index      2  to index        3  coinbase index
# 4   tx nonce (u32)
# 5,6 gas_limit (u64 lo,hi)     7,8  base_fee      9,10 max_fee
# 11,12 max_priority_fee (tip)
# 13  status (guest-written: 1 ok, 2 bad nonce, 3 insufficient funds,
#     4 gas limit below intrinsic)
# 14,15 gas_used (u64, guest-written)
# 16..23  tx value (256-bit, 8 LE limbs)
# 24  n_calldata_bytes
# 32 + 12*i .. +11   account i: nonce (u64), balance (8 limbs), 2 reserved
# 96..103  scratch 256-bit accumulator (byte 384)
# 104..126 calldata bytes, packed 4 per word (byte 416..)
HEADER_STATUS_B = 52
HEADER_GASUSED_B = 56
VALUE_B = 64
ACCT_W = 12
ACCT_BASE_B = 128
SCRATCH_B = 384
CALLDATA_B = 416
RAM_WORDS = 128
MAX_CALLDATA = (RAM_WORDS * 4) - CALLDATA_B

STATUS_OK = 1
STATUS_BAD_NONCE = 2
STATUS_INSUFFICIENT = 3
STATUS_GAS_LIMIT = 4

# The guest.  Registers: s2 intrinsic gas, s3/s4/s5 sender/to/coinbase
# account byte bases, s6/s7 effective gas price (u64), s8/s9 actual tip.
TRANSFER_GUEST = f"""
    # ---- intrinsic gas: 21000 + 16 per nonzero calldata byte, 4 per zero
    lw   t0, 96(zero)          # n_calldata_bytes
    li   t1, 0
    li   s2, 21000
intr:
    beq  t1, t0, intr_done
    addi t2, t1, {CALLDATA_B}
    lbu  t3, 0(t2)
    li   t4, 4
    beq  t3, zero, zbyte
    li   t4, 16
zbyte:
    add  s2, s2, t4
    addi t1, t1, 1
    j    intr
intr_done:
    # ---- gas_limit >= intrinsic (gas_limit u64, intrinsic fits u32)
    lw   t0, 20(zero)
    lw   t1, 24(zero)
    bne  t1, zero, gas_ok
    bgeu t0, s2, gas_ok
    li   t2, {STATUS_GAS_LIMIT}
    sw   t2, {HEADER_STATUS_B}(zero)
    ecall
gas_ok:
    # ---- effective price = min(max_fee, base_fee + tip)   (u64)
    lw   t0, 28(zero)          # base lo
    lw   t1, 32(zero)          # base hi
    lw   t2, 44(zero)          # tip lo
    lw   t3, 48(zero)          # tip hi
    add  t4, t0, t2
    sltu t5, t4, t0
    add  t6, t1, t3
    add  t6, t6, t5            # t4/t6 = base + tip
    lw   a2, 36(zero)          # max_fee lo
    lw   a3, 40(zero)          # max_fee hi
    bltu a3, t6, use_max
    bne  a3, t6, use_sum
    bltu a2, t4, use_max
use_sum:
    mv   a2, t4
    mv   a3, t6
use_max:
    mv   s6, a2
    mv   s7, a3
    # actual tip = eff - base_fee
    sltu t5, s6, t0
    sub  s8, s6, t0
    sub  s9, s7, t1
    sub  s9, s9, t5
    # ---- account byte bases
    li   t1, {4 * ACCT_W}
    lw   t0, 4(zero)
    mul  t0, t0, t1
    addi s3, t0, {ACCT_BASE_B}
    lw   t0, 8(zero)
    mul  t0, t0, t1
    addi s4, t0, {ACCT_BASE_B}
    lw   t0, 12(zero)
    mul  t0, t0, t1
    addi s5, t0, {ACCT_BASE_B}
    # ---- nonce check: sender.nonce == tx.nonce (u64 vs u32)
    lw   t0, 0(s3)
    lw   t1, 4(s3)
    lw   t2, 16(zero)
    bne  t1, zero, bad_nonce
    beq  t0, t2, nonce_ok
bad_nonce:
    li   t2, {STATUS_BAD_NONCE}
    sw   t2, {HEADER_STATUS_B}(zero)
    ecall
nonce_ok:
    # ---- upfront cost = value + gas_limit * max_fee   -> scratch
    lw   a0, 20(zero)
    lw   a1, 24(zero)
    lw   a2, 36(zero)
    lw   a3, 40(zero)
    jal  ra, mulu64
    jal  ra, store_prod
    li   a0, {SCRATCH_B}
    li   a1, {VALUE_B}
    jal  ra, add256
    # sender.balance < upfront  -> insufficient
    addi a0, s3, 8
    li   a1, {SCRATCH_B}
    jal  ra, cmp256
    beq  a2, zero, funds_ok
    li   t2, {STATUS_INSUFFICIENT}
    sw   t2, {HEADER_STATUS_B}(zero)
    ecall
funds_ok:
    # ---- gas_used = intrinsic (pure transfer; no code at recipient)
    sw   s2, {HEADER_GASUSED_B}(zero)
    sw   zero, {HEADER_GASUSED_B + 4}(zero)
    # fee = gas_used * eff  -> scratch
    mv   a0, s2
    li   a1, 0
    mv   a2, s6
    mv   a3, s7
    jal  ra, mulu64
    jal  ra, store_prod
    # sender.balance -= value ; -= fee ; nonce += 1
    addi a0, s3, 8
    li   a1, {VALUE_B}
    jal  ra, sub256
    addi a0, s3, 8
    li   a1, {SCRATCH_B}
    jal  ra, sub256
    lw   t0, 0(s3)
    addi t0, t0, 1
    sw   t0, 0(s3)
    bne  t0, zero, nonce_done
    lw   t1, 4(s3)
    addi t1, t1, 1
    sw   t1, 4(s3)
nonce_done:
    # to.balance += value
    addi a0, s4, 8
    li   a1, {VALUE_B}
    jal  ra, add256
    # coinbase.balance += gas_used * actual_tip
    mv   a0, s2
    li   a1, 0
    mv   a2, s8
    mv   a3, s9
    jal  ra, mulu64
    jal  ra, store_prod
    addi a0, s5, 8
    li   a1, {SCRATCH_B}
    jal  ra, add256
    li   t2, {STATUS_OK}
    sw   t2, {HEADER_STATUS_B}(zero)
    ecall

    # ---- subroutines (leaf calls only; ra is live across none of them)
    # mulu64: (a0,a1) * (a2,a3) -> 128-bit product in a4..a7
mulu64:
    mul   a4, a0, a2
    mulhu a5, a0, a2
    mul   t0, a0, a3
    mulhu t1, a0, a3
    mul   t2, a1, a2
    mulhu t3, a1, a2
    mul   a6, a1, a3
    mulhu a7, a1, a3
    add  a5, a5, t0
    sltu t4, a5, t0
    add  a6, a6, t4
    sltu t5, a6, t4
    add  a7, a7, t5
    add  a5, a5, t2
    sltu t4, a5, t2
    add  a6, a6, t4
    sltu t5, a6, t4
    add  a7, a7, t5
    add  a6, a6, t1
    sltu t4, a6, t1
    add  a7, a7, t4
    add  a6, a6, t3
    sltu t4, a6, t3
    add  a7, a7, t4
    ret
    # store_prod: scratch = zero-extended a4..a7
store_prod:
    sw   a4, {SCRATCH_B}(zero)
    sw   a5, {SCRATCH_B + 4}(zero)
    sw   a6, {SCRATCH_B + 8}(zero)
    sw   a7, {SCRATCH_B + 12}(zero)
    sw   zero, {SCRATCH_B + 16}(zero)
    sw   zero, {SCRATCH_B + 20}(zero)
    sw   zero, {SCRATCH_B + 24}(zero)
    sw   zero, {SCRATCH_B + 28}(zero)
    ret
    # add256: [a0] += [a1]   (8 u32 limbs, sltu carry chain)
add256:
    li   t0, 0
    li   t1, 0
addl:
    add  t2, a0, t0
    lw   t3, 0(t2)
    add  t4, a1, t0
    lw   t5, 0(t4)
    add  t6, t3, t5
    sltu t5, t6, t5
    add  t6, t6, t1
    sltu t4, t6, t1
    or   t1, t5, t4
    sw   t6, 0(t2)
    addi t0, t0, 4
    li   t2, 32
    bne  t0, t2, addl
    ret
    # sub256: [a0] -= [a1]; borrow out in a2
sub256:
    li   t0, 0
    li   t1, 0
subl:
    add  t2, a0, t0
    lw   t3, 0(t2)
    add  t4, a1, t0
    lw   t5, 0(t4)
    sltu t6, t3, t5
    sub  t3, t3, t5
    sltu t4, t3, t1
    sub  t3, t3, t1
    or   t1, t6, t4
    sw   t3, 0(t2)
    addi t0, t0, 4
    li   t2, 32
    bne  t0, t2, subl
    mv   a2, t1
    ret
    # cmp256: a2 = 1 if [a0] < [a1] else 0   (top limb down)
cmp256:
    li   t0, 28
cmpl:
    add  t2, a0, t0
    lw   t3, 0(t2)
    add  t4, a1, t0
    lw   t5, 0(t4)
    bltu t3, t5, cmp_lt
    bltu t5, t3, cmp_ge
    beq  t0, zero, cmp_ge
    addi t0, t0, -4
    j    cmpl
cmp_lt:
    li   a2, 1
    ret
cmp_ge:
    li   a2, 0
    ret
"""


def _limbs(v: int, n: int = 8) -> list[int]:
    assert v < 1 << (32 * n), "value exceeds 256 bits"
    return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(n)]


def _unlimbs(ws) -> int:
    return sum(int(w) << (32 * i) for i, w in enumerate(ws))


def _hx(s: str) -> int:
    return int(s, 16)


def load_state_test(path: str, fork: str = "Shanghai"):
    """Parse a reference-format Ethereum state test (reth.block.json).
    Returns (pre, env, tx, expected_post) with ints, address-keyed."""
    with open(path) as f:
        d = json.load(f)
    pre = {a.lower(): {"nonce": _hx(acc["nonce"]),
                       "balance": _hx(acc["balance"]),
                       "code": acc.get("code", "0x"),
                       "storage": acc.get("storage", {})}
           for a, acc in d["pre"].items()}
    env = d["env"]
    tx = d["transaction"]
    post = d["post"][fork][0]["postState"]
    expected = {a.lower(): {"nonce": _hx(acc["nonce"]),
                            "balance": _hx(acc["balance"])}
                for a, acc in post.items()}
    return pre, env, tx, expected


def build_image(pre: dict, env: dict, tx: dict):
    """Pack pre-state + tx into the guest RAM image.  Returns
    (image np.uint64[RAM_WORDS], addr_order list)."""
    sender = tx["sender"].lower()
    to = tx["to"].lower()
    coinbase = env["currentCoinbase"].lower()
    addrs = list(pre)
    for a in (to, coinbase):
        if a not in addrs:
            addrs.append(a)
    assert (ACCT_BASE_B // 4) + ACCT_W * len(addrs) <= SCRATCH_B // 4, \
        "too many accounts for the fixed image layout"
    for a in addrs:
        acc = pre.get(a, {"code": "0x", "storage": {}})
        assert acc["code"] in ("0x", "", "0x00"), \
            "transfer guest handles EOA recipients only"
        assert not acc["storage"], "transfer guest handles empty storage"

    data = bytes.fromhex(tx["data"][0][2:]) if tx.get("data") else b""
    assert len(data) <= MAX_CALLDATA, "calldata exceeds image area"
    base_fee = _hx(env["currentBaseFee"])
    max_fee = _hx(tx["maxFeePerGas"]) if tx.get("maxFeePerGas") \
        else _hx(tx["gasPrice"])
    tip = _hx(tx["maxPriorityFeePerGas"]) if tx.get("maxPriorityFeePerGas") \
        else max_fee
    gas_limit = _hx(tx["gasLimit"][0])
    value = _hx(tx["value"][0])

    img = np.zeros(RAM_WORDS, dtype=np.uint64)
    img[0] = len(addrs)
    img[1] = addrs.index(sender)
    img[2] = addrs.index(to)
    img[3] = addrs.index(coinbase)
    img[4] = _hx(tx["nonce"])
    img[5], img[6] = gas_limit & 0xFFFFFFFF, gas_limit >> 32
    img[7], img[8] = base_fee & 0xFFFFFFFF, base_fee >> 32
    img[9], img[10] = max_fee & 0xFFFFFFFF, max_fee >> 32
    img[11], img[12] = tip & 0xFFFFFFFF, tip >> 32
    img[16:24] = _limbs(value)
    img[24] = len(data)
    for i, b in enumerate(data):
        w = (CALLDATA_B // 4) + (i // 4)
        img[w] = int(img[w]) | (b << (8 * (i % 4)))
    for i, a in enumerate(addrs):
        acc = pre.get(a, {"nonce": 0, "balance": 0})
        base = (ACCT_BASE_B // 4) + ACCT_W * i
        img[base] = acc["nonce"] & 0xFFFFFFFF
        img[base + 1] = acc["nonce"] >> 32
        img[base + 2 : base + 10] = _limbs(acc["balance"])
    return img, addrs


def unpack_post(image, addrs):
    """Extract {addr: {nonce, balance}}, status and gas_used from the
    final RAM image."""
    out = {}
    for i, a in enumerate(addrs):
        base = (ACCT_BASE_B // 4) + ACCT_W * i
        out[a] = {"nonce": _unlimbs(image[base : base + 2]),
                  "balance": _unlimbs(image[base + 2 : base + 10])}
    status = int(image[HEADER_STATUS_B // 4])
    gas_used = _unlimbs(image[HEADER_GASUSED_B // 4 : HEADER_GASUSED_B // 4 + 2])
    return out, status, gas_used


def apply_transaction_host(pre: dict, env: dict, tx: dict):
    """Pure-python reference model of the guest (differential check)."""
    sender, to = tx["sender"].lower(), tx["to"].lower()
    coinbase = env["currentCoinbase"].lower()
    base_fee = _hx(env["currentBaseFee"])
    max_fee = _hx(tx["maxFeePerGas"]) if tx.get("maxFeePerGas") \
        else _hx(tx["gasPrice"])
    tip = _hx(tx["maxPriorityFeePerGas"]) if tx.get("maxPriorityFeePerGas") \
        else max_fee
    gas_limit = _hx(tx["gasLimit"][0])
    value = _hx(tx["value"][0])
    data = bytes.fromhex(tx["data"][0][2:]) if tx.get("data") else b""
    intrinsic = 21000 + sum(16 if b else 4 for b in data)

    st = {a: dict(acc) for a, acc in pre.items()}
    for a in (to, coinbase):
        st.setdefault(a, {"nonce": 0, "balance": 0})
    if gas_limit < intrinsic:
        return st, STATUS_GAS_LIMIT, 0
    eff = min(max_fee, base_fee + tip)
    if st[sender]["nonce"] != _hx(tx["nonce"]):
        return st, STATUS_BAD_NONCE, 0
    if st[sender]["balance"] < value + gas_limit * max_fee:
        return st, STATUS_INSUFFICIENT, 0
    gas_used = intrinsic
    st[sender]["balance"] -= value + gas_used * eff
    st[sender]["nonce"] += 1
    st[to]["balance"] += value
    st[coinbase]["balance"] += gas_used * (eff - base_fee)
    return st, STATUS_OK, gas_used


def prove_state_test(path: str, fork: str = "Shanghai", n_bits: int = 11,
                     n_queries: int = 2, rows_budget: int | None = None):
    """Execute + prove the state test end to end.  Returns a dict with
    proofs, chunk publics, post-state, status and gas_used.

    The proof binds the transition: chunk 0's mem_in publics are the
    Poseidon digest of the packed PRE-state image, the final chunk's
    mem_out publics are the digest of the POST-state image the host
    unpacks, and every boundary handoff is chained (and provable
    in-circuit via recursion/compressor12.ChainMap)."""
    from .machine import ram_digest
    from .rv32_lib import program_from_asm, rv32_execute_and_prove
    from .rv32_isa import execute

    pre, env, tx, expected = load_state_test(path, fork)
    image0, addrs = build_image(pre, env, tx)
    program = program_from_asm(TRANSFER_GUEST)

    # host-side final image (re-execution is microseconds; the PROOF of the
    # same run comes from rv32_execute_and_prove below)
    mem = {a: int(v) for a, v in enumerate(image0) if v}
    states, final = execute(program, 0, mem=mem)
    assert final.halted, "guest did not halt"
    final_image = np.zeros(RAM_WORDS, dtype=np.uint64)
    for a, v in mem.items():
        final_image[a] = v

    proofs, publics_list, machine, setup, ss = rv32_execute_and_prove(
        program, n_bits=n_bits, ram_words=RAM_WORDS, image0=image0,
        n_queries=n_queries, rows_budget=rows_budget)

    # the proven outgoing image digest must match the unpacked post-state
    d_out = ram_digest(final_image)
    for j in range(4):
        assert publics_list[-1][f"mem_out{j}"] == d_out[j], \
            "final chunk image digest does not match the unpacked post-state"

    post, status, gas_used = unpack_post(final_image, addrs)
    host_post, host_status, host_gas = apply_transaction_host(pre, env, tx)
    assert status == host_status and gas_used == host_gas, \
        "guest transition disagrees with the host model"
    for a in addrs:
        assert post[a]["balance"] == host_post[a]["balance"], a
        assert post[a]["nonce"] == host_post[a]["nonce"], a
    if expected is not None and status == STATUS_OK:
        for a, acc in expected.items():
            assert post[a]["balance"] == acc["balance"], \
                f"balance mismatch for {a}"
            assert post[a]["nonce"] == acc["nonce"], f"nonce mismatch for {a}"
    return {"proofs": proofs, "publics": publics_list, "post": post,
            "status": status, "gas_used": gas_used, "machine": machine,
            "setup": setup, "ss": ss, "n_chunks": len(proofs)}
