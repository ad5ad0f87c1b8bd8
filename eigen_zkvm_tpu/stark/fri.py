"""FRI low-degree commit/fold/query, vectorized over fold groups.

Protocol semantics (fold schedule, transcript order, query/proof layout)
match the reference (starky/src/fri.rs).  The fold itself is re-shaped for
vector hardware: instead of per-group scalar iFFT + Horner (reference
fri.rs:112-126), ALL groups fold at once — one batched iNTT over the group
axis, a per-group scaled twiddle, and one batched Horner evaluation.
"""
from __future__ import annotations

import numpy as np

from ..fields import f3g, f5g
from ..fields import gl64 as gl
from ..hash.merkle_gl import MerkleTreeGL
from ..poly import ntt


class FRIProof:
    def __init__(self, n_steps: int):
        # queries[si]: {"root": digest[4] or None, "pol_queries": [per-query data]}
        self.queries = [{"root": None, "pol_queries": []} for _ in range(n_steps)]
        self.last = None  # [n_last, 3]


class FRI:
    def __init__(self, stark_struct, merkle_cls=MerkleTreeGL, engine=None,
                 dim: int = 3):
        """`dim` selects the soundness extension: 3 = GF(p^3) (the
        reference protocol), 5 = GF(p^5) — which the reference declares
        but never wires through the fold ("TODO: Support F5G",
        starky/src/fri.rs:309,319-331); here both fold end-to-end."""
        assert dim in (3, 5), f"unsupported extension dim {dim}"
        self.dim = dim
        self.ext = f3g if dim == 3 else f5g
        self.merkle_cls = merkle_cls
        self.engine = engine
        self.in_nbits = stark_struct.nBitsExt
        self.max_deg_nbits = stark_struct.nBits
        self.n_queries = stark_struct.nQueries
        self.steps = stark_struct.steps

    def _challenge(self, transcript) -> np.ndarray:
        """Draw one GF(p^dim) fold challenge.  dim=3 keeps the reference's
        exact transcript semantics (transcript.rs get_field); dim=5 drains
        five sponge elements (no reference semantics exist to match)."""
        if self.dim == 3:
            return transcript.get_field()
        return np.array([transcript.get_fields1() for _ in range(self.dim)],
                        dtype=np.uint64)

    def _tpu(self) -> bool:
        if self.merkle_cls is not MerkleTreeGL:
            return False
        if self.engine is not None:
            return self.engine.tpu_commit
        import os

        if os.environ.get("EIGEN_ZKVM_TPU_COMMIT"):
            from ..ops import commit_tpu

            return commit_tpu.enabled()
        return False

    def _merkelize(self, buf, width, height):
        """GL fold-commit trees ride the TPU commit backend when enabled."""
        if self._tpu():
            from ..ops import commit_tpu

            return commit_tpu.tpu_merkelize(buf)
        return self.merkle_cls().merkelize(buf, width, height)

    def prove(self, transcript, pol, query_pol, device_pair=None,
              prefetch=None):
        """pol: [2^in_nbits, 3] extension values on the shifted coset.

        With `device_pair` the whole fold chain runs on the accelerator
        (ops/fri_jax.py): per step only special_x (24 B up) and the fold
        root (32 B down) cross the link; query rows return via one batched
        gather per tree (`prefetch`)."""
        if device_pair is not None:
            assert self.dim == 3, "device fold chain is GF(p^3)-only"
            return self._prove_device(transcript, device_pair, query_pol,
                                      prefetch)
        pol_bits = pol.shape[0].bit_length() - 1
        assert 1 << pol_bits == pol.shape[0]
        assert pol_bits == self.in_nbits
        assert pol.shape[1] == self.dim, \
            f"pol carries dim {pol.shape[1]}, FRI configured for {self.dim}"

        shift = np.uint64(gl.SHIFT)
        shift_inv = gl.inv(shift)
        trees = []
        proof = FRIProof(len(self.steps))

        for si, step in enumerate(self.steps):
            reduction_bits = pol_bits - step.nBits
            pol2_n = 1 << (pol_bits - reduction_bits)
            n_x = pol.shape[0] // pol2_n
            special_x = self._challenge(transcript)

            if si == 0:
                pol2_e = pol[:pol2_n].copy()
            else:
                # groups: ppar[i, g] = pol[i*pol2_n + g] -> [n_x, pol2_n, dim]
                ppar = pol.reshape(n_x, pol2_n, self.dim)
                ppar_c = ntt.intt(ppar)  # batched iNTT over group axis
                # scale coeff j of group g by (shift_inv * w_full^-g)^j
                wi = gl.inv(np.uint64(gl.root_of_unity(pol_bits)))
                g_idx = np.arange(pol2_n, dtype=np.uint64)
                sinv_g = gl.mul(shift_inv, gl.exp_vec(wi, g_idx))  # [pol2_n]
                jpow = _pow_matrix(sinv_g, n_x)  # [n_x, pol2_n]
                ppar_c = gl.mul(ppar_c, jpow[:, :, None])
                # Horner at special_x across the group axis
                pol2_e = _eval_pol_batched(ppar_c, special_x, self.ext)

            if si < len(self.steps) - 1:
                n_groups = 1 << self.steps[si + 1].nBits
                group_size = (1 << step.nBits) // n_groups
                # leaf i <- [pol2_e[j*n_groups + i] for j] flattened x dim
                etb = pol2_e.reshape(group_size, n_groups,
                                     self.dim).transpose(1, 0, 2)
                etb = np.ascontiguousarray(
                    etb.reshape(n_groups, group_size * self.dim))
                tree = self._merkelize(etb, self.dim * group_size, n_groups)
                trees.append(tree)
                proof.queries[si + 1]["root"] = tree.root()
                transcript.put_root(tree.root())
            else:
                for e in pol2_e:
                    transcript.put_elements([int(v) for v in e])

            pol = pol2_e
            pol_bits -= reduction_bits
            for _ in range(reduction_bits):
                shift_inv = gl.mul(shift_inv, shift_inv)
                shift = gl.mul(shift, shift)

        proof.last = pol.copy()
        return self._query_phase(transcript, proof, trees, query_pol,
                                 prefetch)

    def _prove_device(self, transcript, pair, query_pol, prefetch):
        """Device-resident fold chain — bit-exact with the host path."""
        from ..ops import fri_jax

        pol_bits = self.in_nbits
        shift_inv = gl.inv(np.uint64(gl.SHIFT))
        trees = []
        proof = FRIProof(len(self.steps))
        pol2_e = None

        for si, step in enumerate(self.steps):
            reduction_bits = pol_bits - step.nBits
            special_x = transcript.get_field()

            if si == 0:
                pair = (pair[0][: 1 << step.nBits],
                        pair[1][: 1 << step.nBits])
            else:
                pair = fri_jax.fold(pair, special_x, pol_bits, step.nBits,
                                    int(shift_inv))

            if si < len(self.steps) - 1:
                tree = fri_jax.fold_tree(pair, step.nBits,
                                         self.steps[si + 1].nBits)
                trees.append(tree)
                proof.queries[si + 1]["root"] = tree.root()
                transcript.put_root(tree.root())
            else:
                lo = np.asarray(pair[0]).astype(np.uint64)
                hi = np.asarray(pair[1]).astype(np.uint64)
                pol2_e = lo | (hi << np.uint64(32))
                for e in pol2_e:
                    transcript.put_elements([int(e[0]), int(e[1]), int(e[2])])

            pol_bits = step.nBits
            for _ in range(reduction_bits):
                shift_inv = gl.mul(shift_inv, shift_inv)

        proof.last = pol2_e.copy()
        return self._query_phase(transcript, proof, trees, query_pol,
                                 prefetch)

    def _query_phase(self, transcript, proof, trees, query_pol, prefetch):
        ys = transcript.get_permutations(self.n_queries, self.steps[0].nBits)
        if prefetch is not None:
            prefetch(ys)
        ys_si = list(ys)
        for si in range(len(self.steps)):
            if si > 0 and hasattr(trees[si - 1], "prefetch"):
                trees[si - 1].prefetch(ys_si)
            for y in ys_si:
                if si == 0:
                    proof.queries[si]["pol_queries"].append(query_pol(y))
                else:
                    proof.queries[si]["pol_queries"].append(
                        [trees[si - 1].get_group_proof(y)])
            if si < len(self.steps) - 1:
                ys_si = [y % (1 << self.steps[si + 1].nBits) for y in ys_si]
        return proof

    def verify(self, transcript, proof: FRIProof, check_query) -> bool:
        assert len(proof.queries) == len(self.steps)
        special_x = []
        for si in range(len(self.steps)):
            special_x.append(self._challenge(transcript))
            if si < len(self.steps) - 1:
                transcript.put_root(proof.queries[si + 1]["root"])
            else:
                for e in proof.last:
                    transcript.put_elements([int(v) for v in e])

        ys = transcript.get_permutations(self.n_queries, self.steps[0].nBits)
        pol_bits = self.in_nbits
        shift = np.uint64(gl.SHIFT)

        for si, step in enumerate(self.steps):
            proof_item = proof.queries[si]
            reduction_bits = pol_bits - step.nBits
            for i in range(self.n_queries):
                if si == 0:
                    pgroup_e = check_query(proof_item["pol_queries"][i], ys[i])
                    if pgroup_e is None:
                        return False
                else:
                    vals, mp = proof_item["pol_queries"][i][0]
                    if not self.merkle_cls.verify_group_proof(
                            proof_item["root"], mp, ys[i], vals):
                        return False
                    pgroup_e = np.asarray(vals,
                                          dtype=np.uint64).reshape(-1, self.dim)

                pgroup_c = ntt.intt(pgroup_e)
                sinv = gl.inv(gl.mul(shift, gl.exp(
                    np.uint64(gl.root_of_unity(pol_bits)), ys[i])))
                x_eval = self.ext.mul_base(special_x[si], sinv)
                ev = _eval_pol_one(pgroup_c, x_eval, self.ext)

                if si < len(self.steps) - 1:
                    next_n_groups = 1 << self.steps[si + 1].nBits
                    group_idx = ys[i] // next_n_groups
                    nxt = np.asarray(
                        proof.queries[si + 1]["pol_queries"][i][0][0],
                        dtype=np.uint64).reshape(-1, self.dim)
                    if not np.array_equal(ev, nxt[group_idx]):
                        return False
                else:
                    if not np.array_equal(ev, proof.last[ys[i]]):
                        return False

            pol_bits = step.nBits
            for _ in range(reduction_bits):
                shift = gl.mul(shift, shift)
            if si < len(self.steps) - 1:
                ys = [y % (1 << self.steps[si + 1].nBits) for y in ys]

        # final degree check
        if pol_bits < (self.in_nbits - self.max_deg_nbits):
            max_deg = 0
        else:
            max_deg = 1 << (pol_bits - (self.in_nbits - self.max_deg_nbits))
        last_pol_c = ntt.intt(np.asarray(proof.last, dtype=np.uint64))
        if np.any(last_pol_c[max_deg + 1 :] != 0):
            return False
        return True


def _pow_matrix(bases: np.ndarray, n: int) -> np.ndarray:
    """[n, len(bases)]: row j = bases**j (cumulative product down rows)."""
    out = np.ones((n, bases.shape[0]), dtype=np.uint64)
    for j in range(1, n):
        out[j] = gl.mul(out[j - 1], bases)
    return out


def _eval_pol_batched(coeffs: np.ndarray, x: np.ndarray,
                      ext=f3g) -> np.ndarray:
    """Horner over axis 0: coeffs [deg, G, dim], x [dim] -> [G, dim]."""
    deg = coeffs.shape[0]
    res = coeffs[deg - 1]
    xb = np.broadcast_to(x[None, :], res.shape)
    for j in range(deg - 2, -1, -1):
        res = ext.add(ext.mul(res, xb), coeffs[j])
    return res


def _eval_pol_one(coeffs: np.ndarray, x: np.ndarray, ext=f3g) -> np.ndarray:
    """Horner: coeffs [deg, dim], x [dim] -> [dim]."""
    res = coeffs[-1]
    for j in range(coeffs.shape[0] - 2, -1, -1):
        res = ext.add(ext.mul(res, x), coeffs[j])
    return res
