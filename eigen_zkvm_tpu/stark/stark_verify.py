"""Native STARK verifier: transcript replay + constraint check + FRI re-fold.

Matches the reference verifier (starky/src/stark_verify.rs): replays the
Fiat-Shamir schedule, executes the compiled verifier code at xi, checks
Q * Z_H == C (eSTARK eq. 30), then re-verifies all Merkle query proofs and
the FRI folding chain.
"""
from __future__ import annotations

import numpy as np

from ..fields import f3g
from ..fields import gl64 as gl
from .backends import get_backend
from .fri import FRI
from .vm import execute_code_one


def stark_verify(proof, const_root, starkinfo, stark_struct, program) -> bool:
    merkle_cls, transcript_cls = get_backend(stark_struct.verificationHashType)
    transcript = transcript_cls()
    N = 1 << stark_struct.nBits
    nbits = stark_struct.nBits
    extend_bits = stark_struct.nBitsExt - stark_struct.nBits

    evals = np.asarray(proof.evals, dtype=np.uint64)
    publics = np.asarray(proof.publics, dtype=np.uint64)
    challenges = np.zeros((8, 3), dtype=np.uint64)

    for i in range(publics.shape[0]):
        dim = proof.public_dims[i] if proof.public_dims else 1
        transcript.put_elements([int(x) for x in publics[i, :dim]])

    transcript.put_root(proof.root1)
    challenges[0] = transcript.get_field()  # u
    challenges[1] = transcript.get_field()  # defVal
    transcript.put_root(proof.root2)
    challenges[2] = transcript.get_field()  # gamma
    challenges[3] = transcript.get_field()  # beta
    transcript.put_root(proof.root3)
    challenges[4] = transcript.get_field()  # vc
    transcript.put_root(proof.root4)
    challenges[7] = transcript.get_field()  # xi
    for i in range(evals.shape[0]):
        transcript.put_elements([int(x) for x in evals[i]])
    challenges[5] = transcript.get_field()  # v1
    challenges[6] = transcript.get_field()  # v2

    xi = challenges[7]
    x_n = f3g.exp(xi, N)
    Z = f3g.sub(x_n, f3g.ONE)
    w_n = np.uint64(gl.root_of_unity(nbits))
    Zp = f3g.sub(f3g.exp(f3g.mul_base(xi, w_n), N), f3g.ONE)

    ctx_vals = {
        "evals": evals, "publics": publics, "challenges": challenges,
        "Z": Z, "Zp": Zp,
    }
    res = execute_code_one(ctx_vals, program.verifier_code.first)

    x_acc = f3g.ONE.copy()
    q = f3g.ZERO.copy()
    for i in range(starkinfo.q_deg):
        ev_i = starkinfo.ev_idx.get("cm", 0, starkinfo.qs[i])
        q = f3g.add(q, f3g.mul(x_acc, evals[ev_i]))
        x_acc = f3g.mul(x_acc, x_n)
    q_z = f3g.mul(q, Z)
    if not np.array_equal(res, q_z):
        return False

    fri = FRI(stark_struct, merkle_cls)
    roots = [proof.root1, proof.root2, proof.root3, proof.root4, const_root]
    w_full = np.uint64(gl.root_of_unity(nbits + extend_bits))

    def check_query(query, idx):
        for qi, root in enumerate(roots):
            vals, mp = query[qi]
            if not merkle_cls.verify_group_proof(root, mp, idx, vals):
                return None
        x = gl.mul(np.uint64(gl.SHIFT), gl.exp(w_full, idx))
        xx = f3g.from_base(x)
        ctx_q = {
            "tree1": np.asarray(query[0][0], dtype=np.uint64),
            "tree2": np.asarray(query[1][0], dtype=np.uint64),
            "tree3": np.asarray(query[2][0], dtype=np.uint64),
            "tree4": np.asarray(query[3][0], dtype=np.uint64),
            "consts": np.asarray(query[4][0], dtype=np.uint64),
            "evals": evals, "publics": publics, "challenges": challenges,
            "xDivXSubXi": f3g.mul(xx, f3g.inv(f3g.sub(xx, challenges[7]))),
            "xDivXSubWXi": f3g.mul(xx, f3g.inv(
                f3g.sub(xx, f3g.mul_base(challenges[7], w_n)))),
        }
        val = execute_code_one(ctx_q, program.verifier_query_code.first)
        return val[None, :]

    return fri.verify(transcript, proof.fri_proof, check_query)
