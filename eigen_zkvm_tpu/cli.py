"""eigen-zkit-compatible command line (reference: zkit/src/main.rs:232-255).

Usage: python -m eigen_zkvm_tpu.cli <command> [options]

Commands (mirroring the reference CLI):
  stark_prove         prove a PIL trace, self-verify, write zkin.json/.circom
  stark_verify        verify a zkin.json proof against PIL + struct + const
  compressor12_setup  verifier circuit (zkin or .r1cs) -> .pil.json/.const/.exec
  compressor12_exec   witness pass -> .cm commit file
  join_zkin           merge two recursive zkin inputs for aggregation
  groth16_setup       circuit-specific SNARK setup -> pk/vk json
  groth16_prove       SNARK proof of the final on-chain circuit
  groth16_verify      verify a SNARK proof json
  generate_verifier   render the Solidity verifier from a vk json
  compile             compile a circom source (supported subset) to .r1cs/.wtns
"""
from __future__ import annotations

import argparse
import json
import pickle
import sys
import time


def _cmd_stark_prove(args):
    from .stark.prove import stark_prove

    t0 = time.perf_counter()
    stark_prove(args.stark_struct, args.piljson, args.const_pols, args.cm_pols,
                zkin_out=args.output, circom_out=args.circom,
                prover_addr=args.prover_addr, agg_stage=args.agg_stage,
                norm_stage=args.norm_stage, skip_main=args.skip_main)
    print(f"stark_prove done in {time.perf_counter() - t0:.3f}s -> {args.output}")


def _cmd_stark_verify(args):
    from .stark.polsarray import PolsArray
    from .stark.serializer import stark_proof_from_json
    from .stark.stark_setup import StarkSetup
    from .stark.stark_verify import stark_verify
    from .stark.types import load_pil, load_starkstruct

    pil = load_pil(args.piljson)
    ss = load_starkstruct(args.stark_struct)
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(args.const_pols)
    setup = StarkSetup(const_pols, pil, ss)
    with open(args.proof) as f:
        proof = stark_proof_from_json(f.read())
    ok = stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)
    print("verify:", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


def _cmd_join_zkin(args):
    from .stark.serializer import join_zkin

    with open(args.zkin1) as f:
        z1 = json.load(f)
    with open(args.zkin2) as f:
        z2 = json.load(f)
    with open(args.zkinout, "w") as f:
        json.dump(join_zkin(z1, z2), f, separators=(",", ":"))
    print(f"join_zkin -> {args.zkinout}")


def _load_setup_bundle(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def _cmd_compressor12_setup(args):
    """Native compressor setup.  Input is either a verifier-circuit spec
    (inner zkin + inner PIL artifacts, replacing the circom .r1cs path) or
    a circom .r1cs file with custom gates."""
    import numpy as np

    from .recursion.compressor12 import (StarkOption, compressor12_setup,
                                         write_exec_file)
    from .recursion.plonk_setup import PlonkSetup
    from .stark.polsarray import PolsArray
    from .stark.stark_setup import StarkSetup
    from .stark.types import load_pil, load_starkstruct

    if args.r1cs:
        from .algebraic.r1cs_file import load_r1cs, r1cs_to_circuit_inputs

        r1cs = load_r1cs(args.r1cs)
        constraints, gates, n_vars, n_pub = r1cs_to_circuit_inputs(r1cs)

        class _C:  # static circuit shape (no witness)
            pass

        c = _C()
        c.constraints = constraints
        c.custom_gates = gates
        c.n_vars = n_vars
        c.n_publics = n_pub
        psetup = PlonkSetup(c, force_n_bits=args.force_n_bits)
    else:
        inner_pil = load_pil(args.inner_pil)
        inner_ss = load_starkstruct(args.inner_struct)
        const_pols = PolsArray(inner_pil, PolsArray.CONSTANT).load(
            args.inner_const)
        setup = StarkSetup(const_pols, inner_pil, inner_ss)
        with open(args.input) as f:
            zkin = json.load(f)
        opt = StarkOption(verkey_input=args.norm_stage,
                          agg_stage=args.agg_stage,
                          skip_main=args.skip_main)
        _, psetup = compressor12_setup(zkin, setup, inner_ss, opt,
                                       force_n_bits=args.force_n_bits)
        with open(args.pil + ".setup.pkl", "wb") as f:
            pickle.dump((setup, inner_ss, opt), f)

    import dataclasses
    from .stark.types import PIL

    with open(args.pil, "w") as f:
        json.dump(_pil_to_json(psetup.pil), f)
    psetup.const_pols.save(args.const)
    write_exec_file(args.exec, psetup)
    with open(args.exec + ".psetup.pkl", "wb") as f:
        pickle.dump(psetup, f)
    print(f"compressor12_setup -> {args.pil} / {args.const} / {args.exec} "
          f"(n_bits={psetup.n_bits}, n_used={psetup.n_used})")


def _pil_to_json(pil):
    def expr(e):
        d = {"op": e.op, "deg": e.deg}
        if e.id is not None:
            d["id"] = e.id
        if e.next is not None:
            d["next"] = bool(e.next)
        if e.value is not None:
            d["value"] = e.value
        if e.values is not None:
            d["values"] = [expr(v) for v in e.values]
        if e.idQ is not None:
            d["idQ"] = e.idQ
        if e.keep is not None:
            d["keep"] = e.keep
        return d

    refs = {}
    for k, v in pil.references.items():
        r = {"type": v.type_, "id": v.id, "polDeg": v.polDeg,
             "isArray": v.isArray}
        if v.isArray:
            r["len"] = v.len
        refs[k] = r
    return {
        "nCommitments": pil.nCommitments, "nQ": pil.nQ, "nIm": pil.nIm,
        "nConstants": pil.nConstants,
        "publics": [{"polType": p.polType, "polId": p.polId, "idx": p.idx,
                     "id": p.id, "name": p.name} for p in pil.publics],
        "references": refs,
        "expressions": [expr(e) for e in pil.expressions],
        "polIdentities": [{"e": p.e, "fileName": p.fileName, "line": p.line}
                          for p in pil.polIdentities],
        "plookupIdentities": [],
        "permutationIdentities": [],
        "connectionIdentities": [
            {"pols": c.pols, "connections": c.connections,
             "fileName": c.fileName, "line": c.line}
            for c in pil.connectionIdentities],
    }


def _cmd_compressor12_exec(args):
    from .recursion.compressor12 import compressor12_exec

    with open(args.exec + ".psetup.pkl", "rb") as f:
        psetup = pickle.load(f)
    with open(args.pil + ".setup.pkl", "rb") as f:
        setup, inner_ss, opt = pickle.load(f)
    with open(args.input) as f:
        zkin = json.load(f)
    cm = compressor12_exec(zkin, setup, inner_ss, opt, psetup)
    cm.save(args.commit)
    print(f"compressor12_exec -> {args.commit}")


def _cmd_groth16_setup(args):
    from .groth16 import groth16 as core
    from .groth16.api import _curve, vk_to_json

    with open(args.circuit, "rb") as f:
        circuit = pickle.load(f)
    curve, cname = _curve(args.curve_type)
    pk, vk = core.setup(curve, circuit.constraints, circuit.n_vars,
                        circuit.n_publics)
    with open(args.pk, "wb") as f:
        pickle.dump(pk, f)
    with open(args.vk, "w") as f:
        f.write(vk_to_json(vk, to_hex=args.to_hex))
    print(f"groth16_setup -> {args.pk} / {args.vk}")


def _cmd_groth16_prove(args):
    from .groth16 import groth16 as core
    from .groth16.api import _curve, proof_to_json, publics_to_json

    with open(args.circuit, "rb") as f:
        circuit = pickle.load(f)
    with open(args.pk, "rb") as f:
        pk = pickle.load(f)
    curve, cname = _curve(args.curve_type)
    proof, publics = core.prove(curve, pk, circuit.constraints, circuit.w)
    with open(args.proof, "w") as f:
        f.write(proof_to_json(proof, cname, to_hex=args.to_hex))
    with open(args.public_input, "w") as f:
        f.write(publics_to_json(publics))
    print(f"groth16_prove -> {args.proof} / {args.public_input}")


def _cmd_groth16_verify(args):
    from .groth16 import groth16 as core
    from .groth16.api import (_curve, proof_from_json, publics_from_json,
                              vk_from_json)

    curve, _ = _curve(args.curve_type)
    with open(args.vk) as f:
        vk = vk_from_json(f.read())
    with open(args.proof) as f:
        proof = proof_from_json(f.read())
    with open(args.public_input) as f:
        publics = publics_from_json(f.read())
    ok = core.verify(curve, vk, proof, publics)
    print("groth16_verify:", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


def _cmd_bls_wrap(args):
    """Wrap a BN254 Groth16 proof into a BLS12-381 Groth16 proof (the
    reference's gnark bridge: recursion-gnark/cli/src/main.rs:32-46,
    ffi/go/eigen/recursion.go:30-82 — here fully native)."""
    import os

    from .curves import bls12_381 as bls
    from .groth16 import groth16 as core
    from .groth16.api import (proof_from_json, proof_to_json,
                              publics_from_json, publics_to_json,
                              vk_from_json, vk_to_json)
    from .recursion.gnark_bridge import build_verifier_circuit

    with open(args.vk) as f:
        ivk = vk_from_json(f.read())
    with open(args.proof) as f:
        iproof = proof_from_json(f.read())
    with open(args.public_input) as f:
        ipubs = publics_from_json(f.read())
    bc = build_verifier_circuit(ivk, iproof, ipubs)
    print(f"bls_wrap: verifier circuit {len(bc.constraints)} constraints")
    os.makedirs(args.output_dir, exist_ok=True)
    pk_path = os.path.join(args.output_dir, "wrap_pk.bin")
    if args.reuse_setup and os.path.exists(pk_path):
        with open(pk_path, "rb") as f:
            opk, ovk = pickle.load(f)
    else:
        opk, ovk = core.setup(bls, bc.constraints, bc.n_vars, bc.n_publics)
        if args.reuse_setup:
            with open(pk_path, "wb") as f:
                pickle.dump((opk, ovk), f)
    oproof, opubs = core.prove(bls, opk, bc.constraints, bc.w)
    assert core.verify(bls, ovk, oproof, opubs)
    with open(os.path.join(args.output_dir, "wrap_vk.json"), "w") as f:
        f.write(vk_to_json(ovk))
    with open(os.path.join(args.output_dir, "wrap_proof.json"), "w") as f:
        f.write(proof_to_json(oproof, "bls12381"))
    with open(os.path.join(args.output_dir, "wrap_public.json"), "w") as f:
        f.write(publics_to_json(opubs))
    print(f"bls_wrap -> {args.output_dir}/wrap_{{vk,proof,public}}.json")


def _cmd_generate_verifier(args):
    from .groth16.api import generate_verifier

    generate_verifier(args.vk, args.sol)
    print(f"generate_verifier -> {args.sol}")


def _cmd_compile(args):
    """Compile a circom source (supported subset — dsl/circom.py) with the
    given inputs into .r1cs + .wtns.  The recursion layers do NOT need
    this: they build verifier circuits natively; this is the front door
    for user-authored circom circuits."""
    from .algebraic.r1cs_file import circuit_to_r1cs, save_r1cs
    from .algebraic.witness import save_witness
    from .dsl.elaborate import compile_circom

    prime = {"goldilocks": 0xFFFFFFFF00000001,
             "bn128": None, "bls12381": None}[args.prime]
    if args.prime == "bn128":
        from .curves import bn254
        prime = bn254.R
    elif args.prime == "bls12381":
        from .curves import bls12_381
        prime = bls12_381.R
    inputs = {}
    if args.input:
        with open(args.input) as f:
            inputs = {k: int(v) if not isinstance(v, list) else v
                      for k, v in json.load(f).items()}
    with open(args.circuit) as f:
        src_text = f.read()
    circuit = compile_circom(src_text, inputs,
                             search_paths=args.link or [], prime=prime)
    if args.opt:
        from .dsl.simplify import simplify
        st = simplify(circuit, level=args.opt)
        print(f"simplify O{args.opt}: {st['constraints_before']} -> "
              f"{st['constraints_after']} constraints, "
              f"{st['signals_before']} -> {st['signals_after']} signals")
    base = args.output or args.circuit.rsplit(".", 1)[0]
    save_r1cs(base + ".r1cs", circuit_to_r1cs(circuit))
    save_witness(base + ".wtns", circuit.w, circuit.P)
    from .dsl.elaborate import write_sym
    write_sym(circuit, base + ".sym")
    print(f"compile -> {base}.r1cs / {base}.wtns / {base}.sym "
          f"({len(circuit.constraints)} constraints, {circuit.n_vars} wires)")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="eigen-zkit", description=__doc__)
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("stark_prove", help="prove a PIL trace")
    p.add_argument("--stark_struct", "-s", required=True)
    p.add_argument("--piljson", "-p", required=True)
    p.add_argument("--const_pols", "-c", required=True)
    p.add_argument("--cm_pols", "-m", required=True)
    p.add_argument("--output", "-o", required=True, help="zkin.json output")
    p.add_argument("--circom", help="verifier .circom output")
    p.add_argument("--prover_addr", default="")
    p.add_argument("--agg_stage", action="store_true")
    p.add_argument("--norm_stage", action="store_true")
    p.add_argument("--skip_main", action="store_true")
    p.set_defaults(func=_cmd_stark_prove)

    p = sub.add_parser("stark_verify", help="verify a zkin.json proof")
    p.add_argument("--stark_struct", "-s", required=True)
    p.add_argument("--piljson", "-p", required=True)
    p.add_argument("--const_pols", "-c", required=True)
    p.add_argument("--proof", "-f", required=True)
    p.set_defaults(func=_cmd_stark_verify)

    p = sub.add_parser("compressor12_setup",
                       help="build the c12 trace layout for a verifier circuit")
    p.add_argument("--r1cs", "-r", help="circom .r1cs input (interop path)")
    p.add_argument("--input", "-i", help="inner proof zkin.json (native path)")
    p.add_argument("--inner_pil", help="inner PIL json (native path)")
    p.add_argument("--inner_struct", help="inner starkStruct (native path)")
    p.add_argument("--inner_const", help="inner .const (native path)")
    p.add_argument("--pil", "-p", required=True, help="output c12 .pil.json")
    p.add_argument("--const", "-c", required=True, help="output .const")
    p.add_argument("--exec", "-e", required=True, help="output .exec")
    p.add_argument("--force_n_bits", "--force-n-bits", type=int, default=0)
    p.add_argument("--norm_stage", action="store_true")
    p.add_argument("--agg_stage", action="store_true")
    p.add_argument("--skip_main", action="store_true")
    p.set_defaults(func=_cmd_compressor12_setup)

    p = sub.add_parser("compressor12_exec", help="witness pass -> .cm")
    p.add_argument("--input", "-i", required=True, help="zkin.json")
    p.add_argument("--pil", "-p", required=True)
    p.add_argument("--exec", "-e", required=True)
    p.add_argument("--commit", "-m", required=True, help="output .cm")
    p.set_defaults(func=_cmd_compressor12_exec)

    p = sub.add_parser("join_zkin", help="merge two zkin inputs")
    p.add_argument("--zkin1", required=True)
    p.add_argument("--zkin2", required=True)
    p.add_argument("--zkinout", required=True)
    p.set_defaults(func=_cmd_join_zkin)

    p = sub.add_parser("groth16_setup")
    p.add_argument("--curve_type", default="BN128")
    p.add_argument("--circuit", required=True, help="pickled circuit")
    p.add_argument("--pk", required=True)
    p.add_argument("--vk", required=True)
    p.add_argument("--to_hex", action="store_true")
    p.set_defaults(func=_cmd_groth16_setup)

    p = sub.add_parser("groth16_prove")
    p.add_argument("--curve_type", default="BN128")
    p.add_argument("--circuit", required=True, help="pickled circuit")
    p.add_argument("--pk", required=True)
    p.add_argument("--proof", required=True)
    p.add_argument("--public_input", required=True)
    p.add_argument("--to_hex", action="store_true")
    p.set_defaults(func=_cmd_groth16_prove)

    p = sub.add_parser("groth16_verify")
    p.add_argument("--curve_type", default="BN128")
    p.add_argument("--vk", required=True)
    p.add_argument("--proof", required=True)
    p.add_argument("--public_input", required=True)
    p.set_defaults(func=_cmd_groth16_verify)

    p = sub.add_parser("bls_wrap", help="wrap a BN254 Groth16 proof into a "
                       "BLS12-381 Groth16 proof (gnark-bridge equivalent)")
    p.add_argument("--vk", required=True)
    p.add_argument("--proof", required=True)
    p.add_argument("--public_input", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--reuse_setup", action="store_true",
                   help="cache/reuse the outer setup in output_dir")
    p.set_defaults(func=_cmd_bls_wrap)

    p = sub.add_parser("generate_verifier")
    p.add_argument("--vk", required=True)
    p.add_argument("--sol", required=True)
    p.set_defaults(func=_cmd_generate_verifier)

    p = sub.add_parser("compile",
                       help="compile a circom source (supported subset)")
    p.add_argument("--circuit", "-i", required=True, help=".circom source")
    p.add_argument("--prime", "-p", default="bn128",
                   choices=["bn128", "bls12381", "goldilocks"])
    p.add_argument("--input", help="inputs json (for the witness)")
    p.add_argument("--link", "-l", action="append", help="include dirs")
    p.add_argument("--output", "-o", help="output basename")
    p.add_argument("--opt", "-O", type=int, default=2, choices=[0, 1, 2],
                   help="constraint simplification level (circom "
                        "--O0/--O1/--O2; default O2, like circom)")
    p.set_defaults(func=_cmd_compile)

    args = ap.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
