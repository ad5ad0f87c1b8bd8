#!/usr/bin/env python3
"""Extract the public Poseidon-Goldilocks (t=12, "opt" form) round constants.

The constants are the standard pil-stark / plonky2-lineage Poseidon constants
for the Goldilocks field; the reference keeps them as Rust u64 literal tables
(reference: starky/src/poseidon_constants_opt.rs).  This script parses those
numeric tables once and stores them as an .npz artifact consumed by
eigen_zkvm_tpu.hash.poseidon_gl.  Constants are public mathematical data, not
code.

Shapes: C flat, M 12x12, P 12x12, S flat ((2t-1)*n_rounds_p).
"""
import re
import sys

import numpy as np

SRC = "/root/reference/starky/src/poseidon_constants_opt.rs"
OUT = "/root/repo/eigen_zkvm_tpu/data/poseidon_gl_opt.npz"


def parse(text):
    # Split into the four top-level `vec![ ... ]` blocks for c, m, p, s.
    blocks = {}
    for name in ("c_str", "m_str", "p_str", "s_str"):
        m = re.search(rf"let {name}[^=]*=\s*vec!\[", text)
        assert m, name
        start = m.end() - 1
        depth = 0
        for i in range(start, len(text)):
            if text[i] == "[":
                depth += 1
            elif text[i] == "]":
                depth -= 1
                if depth == 0:
                    blocks[name] = text[start : i + 1]
                    break
    return blocks


def numbers(block):
    return [int(x, 0) for x in re.findall(r"0x[0-9a-fA-F_]+|\b\d[\d_]*\b", block)]


def nested(block):
    # Top-level vec![ vec![..], vec![..] ] -> list of lists.
    inner = re.findall(r"vec!\[([^\[\]]*)\]", block[1:])
    return [numbers(b) for b in inner if b.strip()]


def main():
    text = open(SRC).read()
    blocks = parse(text)
    c = np.array(numbers(blocks["c_str"]), dtype=np.uint64)
    m = np.array(nested(blocks["m_str"]), dtype=np.uint64)
    p = np.array(nested(blocks["p_str"]), dtype=np.uint64)
    s = np.array(numbers(blocks["s_str"]), dtype=np.uint64)
    t, nrf, nrp = 12, 8, 22
    assert m.shape == (t, t), m.shape
    assert p.shape == (t, t), p.shape
    assert len(s) == (2 * t - 1) * nrp, len(s)
    # C layout (opt): (nrf/2+1)*t pre/partial-lead constants + nrp partial
    # constants + (nrf/2-1)*t tail constants (+ trailing zeros in some dumps).
    print("C:", len(c), "M:", m.shape, "P:", p.shape, "S:", len(s))
    np.savez(OUT, C=c, M=m, P=p, S=s)
    print("wrote", OUT)


if __name__ == "__main__":
    sys.exit(main())
