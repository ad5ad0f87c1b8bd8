"""Extract the POSEIDON12 custom-gate round constants (CPOSEIDON) from the
reference source (recursion/src/compressor12/constants.rs) into a .npy table.

These are the *non-optimized* Poseidon-GL round constants: 31 rows x 12, one
row per c12 POSEIDON12 gate row (30 rounds + terminal row of zeros).
"""
import re
import sys

import numpy as np

SRC = "/root/reference/recursion/src/compressor12/constants.rs"
OUT = "eigen_zkvm_tpu/data/cposeidon_gl.npy"


def main():
    text = open(SRC).read()
    body = text.split("CPOSEIDON", 1)[1]
    body = body[body.index("=") + 1 :]
    body = body[body.index("[") + 1 : body.index("]")]
    vals = [int(tok.strip(), 0) for tok in body.split(",") if tok.strip()]
    assert len(vals) == 372, len(vals)
    arr = np.array(vals, dtype=np.uint64).reshape(31, 12)
    np.save(OUT, arr)
    print(f"wrote {OUT}: {arr.shape}")


if __name__ == "__main__":
    sys.exit(main())
