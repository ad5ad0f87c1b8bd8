"""Poseidon-GL permutation as a Pallas TPU kernel.

One kernel instance runs the full 30-round ladder for a lane-block of
hashes with the state resident in VMEM — no HBM round trips between rounds
(the XLA path, ops/poseidon_jax.py, materializes between fused clusters).
Layout is transposed to [12, B]: the 12 state elements ride the sublanes,
the hash batch rides the 128-wide lanes, so every u32 op fills the VPU.

Falls back to interpret mode off-TPU; digests are bit-exact with
hash/poseidon_gl.py (golden-tested in tests/test_pallas.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hash import poseidon_gl as pnp

T = 12
_HALF_F = 4
_N_P = 22

_P_LO = np.uint32(0x00000001)
_P_HI = np.uint32(0xFFFFFFFF)

# plain u64 numpy tables (split into u32 pairs at trace time)
_C = pnp.C.astype(np.uint64)
_M = pnp.M.astype(np.uint64)
_PM = pnp.PMAT.astype(np.uint64)
_S = pnp.S.astype(np.uint64)


def _c32(x) -> tuple:
    x = int(x)
    return (np.uint32(x & 0xFFFFFFFF), np.uint32(x >> 32))


# the field ops are the tested jnp implementations (ops/gl_jax.py) — pure
# elementwise u32 code, traceable inside the kernel body where everything
# stays VMEM-resident
from . import gl_jax as _g

_add = _g.add
_mul = _g.mul
_pow7 = _g.pow7


def _kernel(lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    st = [(lo_ref[i, :], hi_ref[i, :]) for i in range(T)]

    def add_row(state, crow):
        return [_add(state[i], _c32(crow[i])) for i in range(T)]

    def mat_layer(state, mat):
        out = []
        for i in range(T):
            acc = None
            for j in range(T):
                term = _mul(state[j], _c32(mat[j][i]))
                acc = term if acc is None else _add(acc, term)
            out.append(acc)
        return out

    st = add_row(st, _C[0:T])
    for r in range(_HALF_F - 1):
        st = [_pow7(x) for x in st]
        st = add_row(st, _C[(r + 1) * T : (r + 2) * T])
        st = mat_layer(st, _M)
    st = [_pow7(x) for x in st]
    st = add_row(st, _C[_HALF_F * T : (_HALF_F + 1) * T])
    st = mat_layer(st, _PM)
    for r in range(_N_P):
        s0 = _pow7(st[0])
        s0 = _add(s0, _c32(_C[(_HALF_F + 1) * T + r]))
        base = (2 * T - 1) * r
        st0 = [s0] + st[1:]
        new0 = None
        for j in range(T):
            term = _mul(st0[j], _c32(_S[base + j]))
            new0 = term if new0 is None else _add(new0, term)
        st = [new0] + [
            _add(st[k], _mul(s0, _c32(_S[base + T + k - 1])))
            for k in range(1, T)]
    base = (_HALF_F + 1) * T + _N_P
    for r in range(_HALF_F - 1):
        st = [_pow7(x) for x in st]
        st = add_row(st, _C[base + r * T : base + (r + 1) * T])
        st = mat_layer(st, _M)
    st = [_pow7(x) for x in st]
    st = mat_layer(st, _M)

    for i in range(T):
        out_lo_ref[i, :] = st[i][0]
        out_hi_ref[i, :] = st[i][1]


@partial(jax.jit, static_argnames=("block", "interpret"))
def permute_t(state_lo, state_hi, block: int = 512,
              interpret: bool = False):
    """Transposed permutation: [12, B] u32 pair in and out."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = state_lo.shape[1]
    assert B % block == 0, (B, block)
    grid = (B // block,)
    spec = pl.BlockSpec((T, block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((T, B), jnp.uint32)] * 2
    lo, hi = pl.pallas_call(
        _kernel, grid=grid,
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=out_shape, interpret=interpret,
    )(state_lo, state_hi)
    return lo, hi


def permute(state):
    """[B, 12] u32 pair -> [B, 12] u32 pair (ops/poseidon_jax.py interface),
    padding the batch up to a block multiple."""
    lo, hi = state
    B = lo.shape[0]
    block = 256 if B >= 256 else max(8, B)
    padded = -(-B // block) * block
    if padded != B:
        lo = jnp.pad(lo, ((0, padded - B), (0, 0)))
        hi = jnp.pad(hi, ((0, padded - B), (0, 0)))
    try:
        olo, ohi = permute_t(lo.T, hi.T, block=block)
    except ValueError:
        # non-TPU lowering: run the kernel under the Pallas interpreter
        olo, ohi = permute_t(lo.T, hi.T, block=block, interpret=True)
    return (olo.T[:B], ohi.T[:B])
