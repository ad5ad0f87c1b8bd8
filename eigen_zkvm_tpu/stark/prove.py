"""All-in-one prove entry: load artifacts, setup, prove, self-verify, emit zkin.

Mirrors the reference CLI-facing flow (starky/src/prove.rs:30-160): PIL json +
starkStruct + .const/.cm files in, self-verified proof + zkin.json (+ the
circom verifier once pil2circom lands) out.  Dispatch on
stark_struct.verificationHashType; GL is the native path, BN128/BLS12381
arrive with the big-field Merkle/transcript stack.
"""
from __future__ import annotations

from .polsarray import PolsArray
from .serializer import stark_proof_to_json
from .stark_gen import stark_gen
from .stark_setup import StarkSetup
from .stark_verify import stark_verify
from .types import load_pil, load_starkstruct


def stark_prove(stark_struct_file: str, pil_file: str, const_file: str,
                cm_file: str, zkin_out: str | None = None,
                circom_out: str | None = None, prover_addr: str = "",
                agg_stage: bool = False, norm_stage: bool = True,
                skip_main: bool = False):
    """Prove one PIL trace; returns (proof, setup). Writes zkin/circom files."""
    pil = load_pil(pil_file)
    ss = load_starkstruct(stark_struct_file)
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(const_file)
    cm_pols = PolsArray(pil, PolsArray.COMMIT).load(cm_file)
    setup = StarkSetup(const_pols, pil, ss)
    proof = stark_gen(cm_pols, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, ss, prover_addr=prover_addr)
    ok = stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)
    if not ok:
        raise RuntimeError("generated proof failed self-verification")
    if zkin_out:
        with open(zkin_out, "w") as f:
            f.write(stark_proof_to_json(proof, ss.verificationHashType))
    if circom_out:
        from .pil2circom import pil2circom, StarkOption
        opt = StarkOption(enable_input=False, verkey_input=norm_stage,
                          skip_main=skip_main, agg_stage=agg_stage)
        with open(circom_out, "w") as f:
            f.write(pil2circom(pil, setup.const_root, ss, setup.starkinfo,
                               setup.program, opt))
    return proof, setup
