"""Column-vectorized executor for compiled Segments.

This is the core architectural divergence from the reference: instead of a
per-row bytecode interpreter (reference: starky/src/interpreter.rs, the
prover's hot inner loop), each 3-address Section is executed as ONE whole-
column array operation over the full domain.  `next`-row references become
rolls; dim-1/dim-3 value mixing follows F3G semantics.  The same section
stream lowers to jax/jnp unchanged (ops/vm_jax.py), where XLA fuses the
chain into a handful of TPU kernels.

Row-order equivalence argument: the reference executes the full section list
per row i (i ascending, `(i+next)%N` wraparound).  A prime (next-row) read in
some section is always preceded, in the same section list, by the section
that computes that same prime quantity (codegen emits dependencies first), so
whole-column evaluation in section order observes exactly the same values as
the row-major schedule.
"""
from __future__ import annotations

import numpy as np

from ..fields import f3g
from ..fields import gl64 as gl
from .starkinfo_codegen import Node, Section
from .types import parse_pil_number


class ProverContext:
    """All prover buffers, each a [deg, width] uint64 matrix per section."""

    def __init__(self, starkinfo, stark_struct):
        self.starkinfo = starkinfo
        self.nbits = stark_struct.nBits
        self.nbits_ext = stark_struct.nBitsExt
        self.N = 1 << self.nbits
        self.Next = 1 << self.nbits_ext
        N, Next = self.N, self.Next
        sN = starkinfo.map_sectionsN

        def zeros(deg, width):
            return np.zeros((deg, width), dtype=np.uint64)

        self.sections = {
            "cm1_n": zeros(N, sN.cm1_n),
            "cm2_n": zeros(N, sN.cm2_n),
            "cm3_n": zeros(N, sN.cm3_n),
            "cm4_n": zeros(N, sN.cm4_n),
            "tmpexp_n": zeros(N, sN.tmpexp_n),
            "cm1_2ns": zeros(Next, sN.cm1_n),
            "cm2_2ns": zeros(Next, sN.cm2_n),
            "cm3_2ns": zeros(Next, sN.cm3_n),
            "cm4_2ns": zeros(Next, sN.cm4_n),
            "q_2ns": zeros(Next, starkinfo.q_dim),
            "f_2ns": zeros(Next, 3),
            "const_n": zeros(N, starkinfo.n_constants),
            "const_2ns": zeros(Next, starkinfo.n_constants),
        }
        self.x_n = None  # [N]
        self.x_2ns = None  # [Next]
        self.zhinv_2ns = None  # [Next] (tiled periodic Z_H^-1)
        self.challenges = np.zeros((8, 3), dtype=np.uint64)
        self.publics = np.zeros((0, 3), dtype=np.uint64)
        self.evals = np.zeros((0, 3), dtype=np.uint64)
        self.x_div_x_sub_xi = None  # [Next, 3]
        self.x_div_x_sub_wxi = None  # [Next, 3]
        # device-resident buffer cache shared by the TPU commit backend
        # (ops/commit_tpu.py) and segment executor (ops/vm_jax.py)
        self._tpu_cache: dict = {}
        self.engine = None  # stark_gen installs the resolved Engine


def _roll(arr: np.ndarray, next_: int) -> np.ndarray:
    """value at row i becomes arr[(i + next) % N]."""
    if next_ == 0:
        return arr
    return np.roll(arr, -next_, axis=0)


def _read(ctx: ProverContext, node: Node, dom: str, n: int, next_: int):
    """Resolve a src Node to (array [n, d], d)."""
    si = ctx.starkinfo
    t = node.type_
    if t == "tmp":
        raise KeyError("tmp read resolved by executor")
    if t == "const":
        buf = ctx.sections["const_n" if dom == "n" else "const_2ns"]
        col = buf[:, node.id : node.id + 1]
        if node.prime:
            col = _roll(col, 1 if dom == "n" else next_)
        else:
            col = col.copy()  # snapshot: later sections may write this buffer
        return col, 1
    if t in ("cm", "tmpExp"):
        # resolve via cm_n/cm_2ns (NOT node.p): exp->cm converted nodes carry
        # no position, exactly like the reference interpreter (interpreter.rs
        # get_ref "cm" branch).
        if t == "cm":
            pol_id = si.cm_n[node.id] if dom == "n" else si.cm_2ns[node.id]
        else:
            pol_id = si.tmpexp_n[node.id]
        p = si.var_pol_map[pol_id]
        buf = ctx.sections[p.section]
        col = buf[:, p.section_pos : p.section_pos + p.dim]
        if node.prime:
            col = _roll(col, next_)
        else:
            col = col.copy()
        return col, p.dim
    if t == "number":
        v = parse_pil_number(node.value)
        return np.full((n, 1), v, dtype=np.uint64), 1
    if t == "public":
        return np.broadcast_to(ctx.publics[node.id : node.id + 1, 0:1], (n, 1)), 1
    if t == "challenge":
        return np.broadcast_to(ctx.challenges[node.id][None, :], (n, 3)), 3
    if t == "eval":
        return np.broadcast_to(ctx.evals[node.id][None, :], (n, 3)), 3
    if t == "x":
        x = ctx.x_n if dom == "n" else ctx.x_2ns
        return x[:, None], 1
    if t == "Zi":
        return ctx.zhinv_2ns[:, None], 1
    if t == "xDivXSubXi":
        return ctx.x_div_x_sub_xi, 3
    if t == "xDivXSubWXi":
        return ctx.x_div_x_sub_wxi, 3
    raise ValueError(f"Invalid reference type get {t}")


def _binop(op: str, a, da, b, db):
    """F3G-semantics binary op on ([n,da], da) x ([n,db], db)."""
    if op == "mul":
        if da == db == 1:
            return gl.mul(a, b), 1
        if da == 3 and db == 3:
            return f3g.mul(a, b), 3
        if da == 3:
            return f3g.mul_base(a, b[:, 0]), 3  # [n,3] scaled by [n] base
        return f3g.mul_base(b, a[:, 0]), 3
    if op == "add":
        if da == db:
            return gl.add(a, b), da
        if da == 3:  # ext + base: add to c0
            out = a.copy()
            out[:, 0:1] = gl.add(a[:, 0:1], b)
            return out, 3
        out = b.copy()
        out[:, 0:1] = gl.add(b[:, 0:1], a)
        return out, 3
    if op == "sub":
        if da == db:
            return gl.sub(a, b), da
        if da == 3:
            out = a.copy()
            out[:, 0:1] = gl.sub(a[:, 0:1], b)
            return out, 3
        out = gl.neg(b)
        out[:, 0:1] = gl.sub(a, b[:, 0:1])
        return out, 3
    raise ValueError(op)


def execute_segment(ctx: ProverContext, segment, dom: str):
    """Run segment.first over the whole domain, vectorized."""
    si = ctx.starkinfo
    n = ctx.N if dom == "n" else ctx.Next
    next_ = 1 if dom == "n" else (1 << (ctx.nbits_ext - ctx.nbits))
    tmps: dict = {}

    def read(node):
        if node.type_ == "tmp":
            return tmps[node.id]
        return _read(ctx, node, dom, n, next_)

    for sec in segment.first:
        if sec.op in ("add", "sub", "mul"):
            a, da = read(sec.src[0])
            b, db = read(sec.src[1])
            val, dv = _binop(sec.op, a, da, b, db)
        elif sec.op == "muladd":
            a, da = read(sec.src[0])
            b, db = read(sec.src[1])
            c, dc = read(sec.src[2])
            val, dv = _binop("mul", a, da, b, db)
            val, dv = _binop("add", val, dv, c, dc)
        elif sec.op == "copy":
            val, dv = read(sec.src[0])
        else:
            raise ValueError(f"Invalid op {sec.op}")

        dest = sec.dest
        if dest.type_ == "tmp":
            tmps[dest.id] = (val, dv)
            continue
        # buffer writes
        if dest.type_ in ("cm", "tmpExp"):
            pol_id = (si.cm_n[dest.id] if dom == "n" else si.cm_2ns[dest.id]) \
                if dest.type_ == "cm" else si.tmpexp_n[dest.id]
            p = si.var_pol_map[pol_id]
            buf = ctx.sections[p.section]
            off, width = p.section_pos, p.dim
        elif dest.type_ == "q":
            buf = ctx.sections["q_2ns"]
            off, width = dest.id, si.q_dim
        elif dest.type_ == "f":
            buf = ctx.sections["f_2ns"]
            off, width = dest.id, 3
        else:
            raise ValueError(f"Invalid reference type set {dest.type_}")

        out = val
        if dv < width:  # pad dim-1 value into dim-3 slot
            out = np.zeros((n, width), dtype=np.uint64)
            out[:, :dv] = val
        elif dv > width:
            raise ValueError("dim overflow on write")
        if dest.prime:
            out = np.roll(out, next_, axis=0)
        buf[:, off : off + width] = out


def execute_code_one(ctx_vals: dict, code: list, q_dim: int = 3):
    """Scalar executor for verifier code (single point, F3G values).

    ctx_vals keys: consts [k], tree1..4 [vals], evals [m,3], publics [m,3],
    challenges [8,3], x [3], Z/Zp [3], xDivXSubXi/xDivXSubWXi [3].
    """
    tmp: dict = {}

    def extract(arr, pos, dim):
        if dim == 1:
            return f3g.from_base(np.uint64(arr[pos]))
        return np.asarray(arr[pos : pos + 3], dtype=np.uint64)

    def get_ref(r: Node):
        t = r.type_
        if t == "tmp":
            return tmp[r.id]
        if t in ("tree1", "tree2", "tree3", "tree4"):
            return extract(ctx_vals[t], r.tree_pos, r.dim)
        if t == "const":
            return f3g.from_base(np.uint64(ctx_vals["consts"][r.id]))
        if t == "eval":
            return np.asarray(ctx_vals["evals"][r.id], dtype=np.uint64)
        if t == "number":
            return f3g.from_base(np.uint64(parse_pil_number(r.value)))
        if t == "public":
            return np.asarray(ctx_vals["publics"][r.id], dtype=np.uint64)
        if t == "challenge":
            return np.asarray(ctx_vals["challenges"][r.id], dtype=np.uint64)
        if t == "xDivXSubXi":
            return np.asarray(ctx_vals["xDivXSubXi"], dtype=np.uint64)
        if t == "xDivXSubWXi":
            return np.asarray(ctx_vals["xDivXSubWXi"], dtype=np.uint64)
        if t == "x":
            return np.asarray(ctx_vals["challenges"][7], dtype=np.uint64)
        if t == "Z":
            return np.asarray(ctx_vals["Zp" if r.prime else "Z"], dtype=np.uint64)
        raise ValueError(f"Invalid reference type, get: {t}")

    dest = code[-1].dest
    for ci in code:
        src = [get_ref(s) for s in ci.src]
        if ci.op == "add":
            res = f3g.add(src[0], src[1])
        elif ci.op == "sub":
            res = f3g.sub(src[0], src[1])
        elif ci.op == "mul":
            res = f3g.mul(src[0], src[1])
        elif ci.op == "muladd":
            res = f3g.add(f3g.mul(src[0], src[1]), src[2])
        elif ci.op == "copy":
            res = src[0]
        else:
            raise ValueError(f"Invalid op: {ci.op}")
        assert ci.dest.type_ == "tmp", ci.dest.type_
        tmp[ci.dest.id] = res
    return get_ref(dest)
