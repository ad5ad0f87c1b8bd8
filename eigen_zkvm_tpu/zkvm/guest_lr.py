"""Linear-regression guest (the reference's second guest family,
zkvm/program/lr/src/lib.rs: simple_linear_regression over (x, y) pairs).

The reference guest runs f64 math under powdr; RV32IM has no FPU, so
this guest computes the same closed-form least-squares fit in Q16.16
fixed point with integer mul/div — strictly more than the reference's
build, which hardcodes a 2-point dataset and discards the result.

    slope     = N·Σxy − Σx·Σy  /  N·Σx² − (Σx)²      (scaled by 2^16)
    intercept = (Σy − slope·Σx) / N                   (Q16.16)

The dataset lives in a .data segment of an ELF32 container (word 0 = N,
then N little-endian (x, y) u32 pairs), the guest is real machine code
loaded through zkvm/elf.py, and the run proves with RAM-image
continuation digests.  Results land in a0 (slope) and a1 (intercept),
exposed as the x10_out / x11_out boundary publics.
"""
from __future__ import annotations

DATA_VADDR = 0x80

# register map: s0=&data, s1=N, s2=Σx, s3=Σy, s4=Σxy, s5=Σx²
LR_ASM = f"""
    li s0, {DATA_VADDR}
    lw s1, 0(s0)      # N
    addi s0, s0, 4
    li s2, 0
    li s3, 0
    li s4, 0
    li s5, 0
    mv t0, s1
acc:
    beq t0, zero, fit
    lw t1, 0(s0)      # x
    lw t2, 4(s0)      # y
    add s2, s2, t1
    add s3, s3, t2
    mul t3, t1, t2
    add s4, s4, t3
    mul t3, t1, t1
    add s5, s5, t3
    addi s0, s0, 8
    addi t0, t0, -1
    j acc
fit:
    mul t0, s1, s4    # N·Σxy
    mul t1, s2, s3    # Σx·Σy
    sub t0, t0, t1    # numerator
    mul t1, s1, s5    # N·Σx²
    mul t2, s2, s2    # (Σx)²
    sub t1, t1, t2    # denominator
    slli t0, t0, 16   # Q16.16 scale before the divide
    div a0, t0, t1    # slope (Q16.16)
    slli t3, s3, 16   # Σy<<16
    mul t4, a0, s2    # slope·Σx (already Q16.16)
    sub t3, t3, t4
    div a1, t3, s1    # intercept (Q16.16)
    ecall
"""


def lr_reference(pairs):
    """Host-side Q16.16 fixed-point fit with the guest's exact rounding
    (RISC-V div truncates toward zero)."""
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    slope = tdiv((n * sxy - sx * sy) << 16, n * sxx - sx * sx)
    intercept = tdiv((sy << 16) - slope * sx, n)
    return slope & 0xFFFFFFFF, intercept & 0xFFFFFFFF


def lr_elf(pairs) -> bytes:
    """Pack the dataset into a .data segment and emit the guest ELF."""
    from .elf import make_elf
    from .rv32_isa import assemble

    data = len(pairs).to_bytes(4, "little")
    for x, y in pairs:
        data += int(x).to_bytes(4, "little") + int(y).to_bytes(4, "little")
    return make_elf(assemble(LR_ASM), entry=0, data_bytes=data,
                    data_vaddr=DATA_VADDR)


def prove_lr(pairs, n_bits: int = 11, n_queries: int = 2):
    """Prove the fit; returns (slope, intercept, proofs, publics_list)."""
    from .elf import elf_execute_and_prove

    proofs, pubs, _m, _s, _ss = elf_execute_and_prove(
        lr_elf(pairs), n_bits=n_bits, n_queries=n_queries)
    return pubs[-1]["x10_out"], pubs[-1]["x11_out"], proofs, pubs
