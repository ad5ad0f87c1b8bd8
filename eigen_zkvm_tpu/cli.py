"""eigen-zkit-compatible command line (reference: zkit/src/main.rs:232-255).

Usage: python -m eigen_zkvm_tpu.cli <command> [options]

Commands land as their layers are built; currently:
  stark_prove   prove a PIL trace (GL), self-verify, write zkin.json/circom
  stark_verify  verify a zkin.json proof against PIL + starkStruct + const
  join_zkin     merge two recursive1 zkin inputs for aggregation
"""
from __future__ import annotations

import argparse
import json
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
    p.add_argument("--norm_stage", action="store_true", default=True)
    p.add_argument("--skip_main", action="store_true")
    p.set_defaults(func=_cmd_stark_prove)

    p = sub.add_parser("stark_verify", help="verify a zkin.json proof")
    p.add_argument("--stark_struct", "-s", required=True)
    p.add_argument("--piljson", "-p", required=True)
    p.add_argument("--const_pols", "-c", required=True)
    p.add_argument("--proof", "-f", required=True)
    p.set_defaults(func=_cmd_stark_verify)

    p = sub.add_parser("join_zkin", help="merge two zkin inputs")
    p.add_argument("--zkin1", required=True)
    p.add_argument("--zkin2", required=True)
    p.add_argument("--zkinout", required=True)
    p.set_defaults(func=_cmd_join_zkin)

    args = ap.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
