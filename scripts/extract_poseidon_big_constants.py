"""Extract circomlib Poseidon-BN128 "opt" constants from the reference's
generated Rust table (starky/src/poseidon_bn128_constants_opt.rs) into an
npz of 4xu64 little-endian limb arrays, one set per state width t=2..17.

The table layout follows load_constants (poseidon_bn128_opt.rs:11-68):
c_str[t-2] -> C (per-round constants), m_str[t-2] -> M [t][t],
p_str[t-2] -> P [t][t], s_str[t-2] -> S (sparse partial-round rows).
Run once; data committed as eigen_zkvm_tpu/data/poseidon_bn128_opt.npz.
"""
import re

import numpy as np

import sys

CURVES = {
    "bn128": ("/root/reference/starky/src/poseidon_bn128_constants_opt.rs",
              "eigen_zkvm_tpu/data/poseidon_bn128_opt.npz",
              [56, 57, 56, 60, 60, 63, 64, 63, 60, 66, 60, 65, 70, 60, 64, 68]),
    "bls12381": ("/root/reference/starky/src/poseidon_bls12381_constants_opt.rs",
                 "eigen_zkvm_tpu/data/poseidon_bls12381_opt.npz",
                 [55, 55, 56, 56, 56, 56, 57, 57, 57, 57, 57, 57, 57, 57, 59, 59]),
}
SRC, OUT, N_ROUNDS_P = CURVES[sys.argv[1] if len(sys.argv) > 1 else "bn128"]


def limbs(x: int) -> list[int]:
    return [(x >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]


def main():
    text = open(SRC).read()
    # split the four top-level tables by their declaration markers
    decls = [m.start() for m in re.finditer(r"let [cmps]_str", text)]
    decls.append(len(text))
    tables = []
    for i in range(4):
        seg = text[decls[i]:decls[i + 1]]
        hexes = re.findall(r'"(0x[0-9a-fA-F]+)"', seg)
        tables.append(hexes)
    c_str, m_str, p_str, s_str = tables

    out = {}
    ci = mi = pi = si = 0
    for t in range(2, 18):
        idx = t - 2
        n_p = N_ROUNDS_P[idx]
        n_c = t * 8 + n_p  # 8 full rounds of t constants (folded) + partials
        # reference C tables per t: (half_f+1)*t + n_p + (half_f-1)*t = 8t + n_p? verify by count
        c = [int(h, 16) for h in c_str[ci:ci + n_c]]
        ci += n_c
        m = [int(h, 16) for h in m_str[mi:mi + t * t]]
        mi += t * t
        p = [int(h, 16) for h in p_str[pi:pi + t * t]]
        pi += t * t
        s = [int(h, 16) for h in s_str[si:si + n_p * (2 * t - 1)]]
        si += n_p * (2 * t - 1)
        out[f"C_{t}"] = np.array([limbs(x) for x in c], dtype=np.uint64)
        out[f"M_{t}"] = np.array([limbs(x) for x in m], dtype=np.uint64).reshape(t, t, 4)
        out[f"P_{t}"] = np.array([limbs(x) for x in p], dtype=np.uint64).reshape(t, t, 4)
        out[f"S_{t}"] = np.array([limbs(x) for x in s], dtype=np.uint64)
    assert ci == len(c_str) and mi == len(m_str) and pi == len(p_str) and si == len(s_str), \
        (ci, len(c_str), mi, len(m_str), pi, len(p_str), si, len(s_str))
    np.savez_compressed(OUT, **out)
    print("wrote", OUT, "tables:", len(out))


if __name__ == "__main__":
    main()
