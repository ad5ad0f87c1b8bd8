"""Device executor for compiled constraint Segments — the quotient pass
on the TPU.

Mirrors stark/vm.py (the column-vectorized numpy executor) over
ops/gl_jax.py limb pairs: every 3-address Section becomes a whole-column
GL/F3 vector op, the section stream is traced ONCE per (segment, domain)
into a single XLA computation, and XLA fuses the chain into a handful of
TPU kernels.  The reference's per-row bytecode interpreter
(starky/src/interpreter.rs) is the hot prover loop this replaces.

Opt-in via EIGEN_ZKVM_TPU_VM=1 (stark/stark_gen.py dispatches here);
only the sections a segment actually reads/writes are transferred.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import gl_jax as g
from ..stark.types import parse_pil_number

# GL value on device: (lo, hi) u32 pair, arrays [n, width]


def _roll(a, k: int):
    if k == 0:
        return a
    return (jnp.roll(a[0], -k, axis=0), jnp.roll(a[1], -k, axis=0))


def _f3_mul(a, b):
    """F3G product over GL pairs with last axis 3 (fields/f3g.py mul)."""
    def c(x, i):
        return (x[0][..., i : i + 1], x[1][..., i : i + 1])
    a0, a1, a2 = c(a, 0), c(a, 1), c(a, 2)
    b0, b1, b2 = c(b, 0), c(b, 1), c(b, 2)
    aa = g.mul(g.add(a0, a1), g.add(b0, b1))
    bb = g.mul(g.add(a0, a2), g.add(b0, b2))
    cc = g.mul(g.add(a1, a2), g.add(b1, b2))
    dd = g.mul(a0, b0)
    ee = g.mul(a1, b1)
    ff = g.mul(a2, b2)
    gg = g.sub(dd, ee)
    c0 = g.sub(g.add(cc, gg), ff)
    c1 = g.sub(g.add(aa, cc), g.add(g.add(ee, ee), dd))
    c2 = g.sub(bb, gg)
    return (jnp.concatenate([c0[0], c1[0], c2[0]], axis=-1),
            jnp.concatenate([c0[1], c1[1], c2[1]], axis=-1))


def _f3_inv(a):
    """F3G inverse via the adjugate/norm formula (fields/f3g.py inv),
    over GL pairs with last axis 3."""
    def c(x, i):
        return (x[0][..., i], x[1][..., i])
    a0, a1, a2 = c(a, 0), c(a, 1), c(a, 2)
    aa = g.mul(a0, a0)
    ac = g.mul(a0, a2)
    ba = g.mul(a1, a0)
    bb = g.mul(a1, a1)
    bc = g.mul(a1, a2)
    cc = g.mul(a2, a2)
    aaa = g.mul(aa, a0)
    aac = g.mul(aa, a2)
    abc = g.mul(ba, a2)
    abb = g.mul(ba, a1)
    acc = g.mul(ac, a2)
    bbb = g.mul(bb, a1)
    bcc = g.mul(bc, a2)
    ccc = g.mul(cc, a2)
    t = g.neg(aaa)
    t = g.sub(t, aac)
    t = g.sub(t, aac)
    t = g.add(t, abc)
    t = g.add(t, abc)
    t = g.add(t, abc)
    t = g.add(t, abb)
    t = g.sub(t, acc)
    t = g.sub(t, bbb)
    t = g.add(t, bcc)
    t = g.sub(t, ccc)
    tinv = g.inv(t)
    i1 = g.neg(aa)
    i1 = g.sub(i1, ac)
    i1 = g.sub(i1, ac)
    i1 = g.add(i1, bc)
    i1 = g.add(i1, bb)
    i1 = g.sub(i1, cc)
    i1 = g.mul(i1, tinv)
    i2 = g.mul(g.sub(ba, cc), tinv)
    i3 = g.mul(g.add(g.sub(ac, bb), cc), tinv)
    return (jnp.stack([i1[0], i2[0], i3[0]], axis=-1),
            jnp.stack([i1[1], i2[1], i3[1]], axis=-1))


@jax.jit
def _xdiv_kernel(xlo, xhi, xi_lo, xi_hi, wxi_lo, wxi_hi):
    """xDivXSubXi / xDivXSubWXi over the extended coset: x/(x - xi) with x
    base-field [Next] and xi/wxi F3 points."""
    n = xlo.shape[0]
    zeros = jnp.zeros((n, 2), jnp.uint32)
    den = (jnp.concatenate([xlo[:, None], zeros[:, :1], zeros[:, 1:]], -1),
           jnp.concatenate([xhi[:, None], zeros[:, :1], zeros[:, 1:]], -1))
    out = []
    for plo, phi in ((xi_lo, xi_hi), (wxi_lo, wxi_hi)):
        d = g.sub(den, (jnp.broadcast_to(plo[None, :], (n, 3)),
                        jnp.broadcast_to(phi[None, :], (n, 3))))
        di = _f3_inv(d)
        out.append(g.mul(di, (xlo[:, None], xhi[:, None])))
    return tuple(out)


def compute_xdiv(ctx, xi, wxi):
    """Device xDivXSubXi/xDivXSubWXi; deposits the pairs in ctx._tpu_cache
    (step52ns reads them without a re-upload) and returns numpy arrays."""
    cache = getattr(ctx, "_tpu_cache", None)
    if cache is not None and "x_2ns" in cache:
        xlo, xhi = cache["x_2ns"]
    else:
        xlo, xhi = _split64(np.asarray(ctx.x_2ns))
        if cache is not None:
            cache["x_2ns"] = (xlo, xhi)
    xi_p = _split64(np.asarray(xi))
    wxi_p = _split64(np.asarray(wxi))
    pair_xi, pair_wxi = _xdiv_kernel(xlo, xhi, xi_p[0], xi_p[1],
                                     wxi_p[0], wxi_p[1])
    if cache is not None:
        cache["x_div_x_sub_xi"] = pair_xi
        cache["x_div_x_sub_wxi"] = pair_wxi
    return _join64(*pair_xi), _join64(*pair_wxi)


@partial(jax.jit, static_argnames=("nbits",))
def _geo_scaled(base_lo, base_hi, w_lo, w_hi, nbits: int):
    """[2^nbits] GL pair base * w^i (i ascending) by log-depth doubling —
    bit-exact with host gl.mul(base, gl.exp_vec(w, arange))."""
    lo, hi = base_lo, base_hi          # [1] = base * w^0
    cur = (w_lo, w_hi)                 # [1] = w^(2^k)
    for _ in range(nbits):
        seg = g.mul((lo, hi), (jnp.broadcast_to(cur[0], lo.shape),
                               jnp.broadcast_to(cur[1], hi.shape)))
        lo = jnp.concatenate([lo, seg[0]])
        hi = jnp.concatenate([hi, seg[1]])
        cur = g.mul(cur, cur)
    return lo, hi


@partial(jax.jit, static_argnames=("reps",))
def _tile_pair(lo, hi, reps: int):
    return jnp.tile(lo, reps), jnp.tile(hi, reps)


def seed_domains(ctx):
    """Build the x_n / x_2ns / zhinv_2ns domain vectors ON DEVICE and
    deposit them in ctx._tpu_cache: in the device-VM prove the host never
    materializes or uploads them (at the north star each is a 2^24 u64
    vector — ~134 MB of host exp_vec work + tunnel upload per prove)."""
    import numpy as _np

    from ..fields import gl64 as _gl

    cache = ctx._tpu_cache

    def scal(v):
        v = int(v)
        return (jnp.asarray([v & 0xFFFFFFFF], jnp.uint32),
                jnp.asarray([v >> 32], jnp.uint32))

    one = scal(1)
    shift = scal(_gl.SHIFT)
    w_n = scal(_gl.root_of_unity(ctx.nbits))
    w_ext = scal(_gl.root_of_unity(ctx.nbits_ext))
    cache["x_n"] = _geo_scaled(one[0], one[1], w_n[0], w_n[1], ctx.nbits)
    cache["x_2ns"] = _geo_scaled(shift[0], shift[1], w_ext[0], w_ext[1],
                                 ctx.nbits_ext)
    eb = ctx.nbits_ext - ctx.nbits
    sn = _gl.exp(_np.uint64(_gl.SHIFT), 1 << ctx.nbits)
    w_eb = _np.uint64(_gl.root_of_unity(eb))
    zh = _gl.sub(_gl.mul(sn, _gl.exp_vec(
        w_eb, _np.arange(1 << eb, dtype=_np.uint64))), _np.uint64(1))
    plo, phi = _split64(_gl.inv(zh))
    cache["zhinv_2ns"] = _tile_pair(plo, phi,
                                    (1 << ctx.nbits_ext) >> eb)


def _set_c0(a, v):
    """Replace component 0 of an F3 pair with GL pair v ([n,1])."""
    return (jnp.concatenate([v[0], a[0][:, 1:]], axis=-1),
            jnp.concatenate([v[1], a[1][:, 1:]], axis=-1))


def _binop(op: str, a, da: int, b, db: int):
    if op == "mul":
        if da == db == 1:
            return g.mul(a, b), 1
        if da == 3 and db == 3:
            return _f3_mul(a, b), 3
        if da == 3:
            return g.mul(a, b), 3            # [n,3] * [n,1] broadcast
        return g.mul(b, a), 3
    if op == "add":
        if da == db:
            return g.add(a, b), da
        if da == 3:
            return _set_c0(a, g.add((a[0][:, :1], a[1][:, :1]), b)), 3
        return _set_c0(b, g.add((b[0][:, :1], b[1][:, :1]), a)), 3
    if op == "sub":
        if da == db:
            return g.sub(a, b), da
        if da == 3:
            return _set_c0(a, g.sub((a[0][:, :1], a[1][:, :1]), b)), 3
        nb = g.neg(b)
        return _set_c0(nb, g.sub(a, (b[0][:, :1], b[1][:, :1]))), 3
    raise ValueError(op)


def _analyze(ctx, segment, dom: str):
    """(read sections, written sections, aux reads) for one segment."""
    si = ctx.starkinfo
    reads, writes, aux = set(), set(), set()

    def sec_of(node, write):
        t = node.type_
        if t == "const":
            reads.add("const_n" if dom == "n" else "const_2ns")
        elif t in ("cm", "tmpExp"):
            if t == "cm":
                pol_id = si.cm_n[node.id] if dom == "n" else si.cm_2ns[node.id]
            else:
                pol_id = si.tmpexp_n[node.id]
            name = si.var_pol_map[pol_id].section
            (writes if write else reads).add(name)
        elif t == "q":
            writes.add("q_2ns")
        elif t == "f":
            writes.add("f_2ns")
        elif t == "x":
            aux.add("x_n" if dom == "n" else "x_2ns")
        elif t == "Zi":
            aux.add("zhinv_2ns")
        elif t == "xDivXSubXi":
            aux.add("x_div_x_sub_xi")
        elif t == "xDivXSubWXi":
            aux.add("x_div_x_sub_wxi")
        elif t == "public":
            aux.add("publics")
        elif t == "challenge":
            aux.add("challenges")
        elif t == "eval":
            aux.add("evals")

    for sec in segment.first:
        for s in sec.src:
            sec_of(s, write=False)
        sec_of(sec.dest, write=True)
    return reads, writes, aux


def _trace_segment(si, segment, dom: str, nbits: int, nbits_ext: int,
                   state: dict, ma=None):
    """Pure function of `state` (dict name -> GL pair); returns the updated
    written sections.  Called under jax.jit."""
    out, _ = _trace_ops(si, segment.first, dom, nbits, nbits_ext,
                        state, {}, (), ma)
    return out


def _trace_ops(si, ops, dom: str, nbits: int, nbits_ext: int,
               state: dict, tmp_state: dict, keep: tuple, ma=None):
    """Pure function of (`state`: dict name -> GL pair, `tmp_state`: dict
    tmp-id -> GL pair carried across a program split); returns (updated
    written sections, kept tmps for `keep`).  Called under jax.jit.

    Under a mesh (`ma`), every full-domain buffer is row-sharded: the column
    ops are elementwise in rows, and the next-row rotations become
    collective-permute halo exchanges XLA inserts (stark_gen.rs:786-963
    row-chunking analog)."""
    from ..parallel import meshctx

    n = (1 << nbits) if dom == "n" else (1 << nbits_ext)
    next_ = 1 if dom == "n" else (1 << (nbits_ext - nbits))
    bufs = {k: (meshctx.rows(v, ma) if v[0].shape[0] == n else v)
            for k, v in state.items()}
    # live-in tmps: their F-dimension rides in the array shape
    tmps: dict = {i: (pair, pair[0].shape[-1])
                  for i, pair in tmp_state.items()}

    def read(node):
        t = node.type_
        if t == "tmp":
            return tmps[node.id]
        if t == "const":
            buf = bufs["const_n" if dom == "n" else "const_2ns"]
            col = (buf[0][:, node.id : node.id + 1],
                   buf[1][:, node.id : node.id + 1])
            if node.prime:
                col = _roll(col, 1 if dom == "n" else next_)
            return col, 1
        if t in ("cm", "tmpExp"):
            if t == "cm":
                pol_id = si.cm_n[node.id] if dom == "n" else si.cm_2ns[node.id]
            else:
                pol_id = si.tmpexp_n[node.id]
            p = si.var_pol_map[pol_id]
            buf = bufs[p.section]
            col = (buf[0][:, p.section_pos : p.section_pos + p.dim],
                   buf[1][:, p.section_pos : p.section_pos + p.dim])
            if node.prime:
                col = _roll(col, next_)
            return col, p.dim
        if t == "number":
            v = parse_pil_number(node.value)
            return (jnp.full((n, 1), v & 0xFFFFFFFF, jnp.uint32),
                    jnp.full((n, 1), v >> 32, jnp.uint32)), 1
        if t == "public":
            p = bufs["publics"]
            return (jnp.broadcast_to(p[0][node.id : node.id + 1, 0:1], (n, 1)),
                    jnp.broadcast_to(p[1][node.id : node.id + 1, 0:1], (n, 1))), 1
        if t == "challenge":
            ch = bufs["challenges"]
            return (jnp.broadcast_to(ch[0][node.id][None, :], (n, 3)),
                    jnp.broadcast_to(ch[1][node.id][None, :], (n, 3))), 3
        if t == "eval":
            e = bufs["evals"]
            return (jnp.broadcast_to(e[0][node.id][None, :], (n, 3)),
                    jnp.broadcast_to(e[1][node.id][None, :], (n, 3))), 3
        if t == "x":
            x = bufs["x_n" if dom == "n" else "x_2ns"]
            return (x[0][:, None], x[1][:, None]), 1
        if t == "Zi":
            z = bufs["zhinv_2ns"]
            return (z[0][:, None], z[1][:, None]), 1
        if t == "xDivXSubXi":
            return bufs["x_div_x_sub_xi"], 3
        if t == "xDivXSubWXi":
            return bufs["x_div_x_sub_wxi"], 3
        raise ValueError(f"Invalid reference type get {t}")

    written = set()
    # Optional fusion-window cap (see _segment_compiler_options for the
    # default XLA:CPU mitigation): a periodic optimization_barrier over
    # every live value bounds how deep any fusion pass can look.  Off by
    # default — the TPU pipeline's cost-modeled fusion handles these
    # graphs, and on CPU the pass is disabled outright instead.
    barrier_every = int(os.environ.get("EIGEN_ZKVM_VM_BARRIER", "0"))

    def _barrier_all():
        nonlocal bufs, tmps
        names = sorted(bufs)
        keys = sorted(tmps)
        flat = [bufs[s] for s in names] + [tmps[k][0] for k in keys]
        flat = jax.lax.optimization_barrier(flat)
        bufs = dict(zip(names, flat[: len(names)]))
        tmps = {k: (v, tmps[k][1])
                for k, v in zip(keys, flat[len(names):])}

    for opno, sec in enumerate(ops):
        if barrier_every and opno and opno % barrier_every == 0:
            _barrier_all()
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
        if dest.type_ in ("cm", "tmpExp"):
            pol_id = (si.cm_n[dest.id] if dom == "n" else si.cm_2ns[dest.id]) \
                if dest.type_ == "cm" else si.tmpexp_n[dest.id]
            p = si.var_pol_map[pol_id]
            name, off, width = p.section, p.section_pos, p.dim
        elif dest.type_ == "q":
            name, off, width = "q_2ns", dest.id, si.q_dim
        elif dest.type_ == "f":
            name, off, width = "f_2ns", dest.id, 3
        else:
            raise ValueError(f"Invalid reference type set {dest.type_}")

        lo, hi = val
        if dv < width:
            pad = width - dv
            lo = jnp.concatenate([lo, jnp.zeros((n, pad), jnp.uint32)], -1)
            hi = jnp.concatenate([hi, jnp.zeros((n, pad), jnp.uint32)], -1)
        elif dv > width:
            raise ValueError("dim overflow on write")
        if dest.prime:
            lo = jnp.roll(lo, next_, axis=0)
            hi = jnp.roll(hi, next_, axis=0)
        buf = bufs[name]
        bufs[name] = (buf[0].at[:, off : off + width].set(lo),
                      buf[1].at[:, off : off + width].set(hi))
        written.add(name)
    return ({k: bufs[k] for k in written},
            {i: tmps[i][0] for i in keep})


_jit_cache: dict = {}


def _slice_plan(ops, max_ops: int):
    """Bounded program slices of an op stream + the live-in tmp set at
    every slice entry.

    The real zkVM machine PILs compile to 5-7K column ops per segment;
    traced as ONE XLA program that is hundreds of thousands of HLO
    instructions — more than the (remote) compile helper survives
    (round-4: SIGKILL on the RV32 machine's step42ns at 2^16 rows).
    Sliced, each sub-program stays bounded and the only cross-slice
    state is the written sections plus the tmps that are live at the
    boundary (upward-exposed reads downstream of earlier writes)."""
    n = len(ops)
    bounds = list(range(0, n, max_ops)) + [n]
    slices = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)
              if bounds[i] < bounds[i + 1]]
    sl_reads, sl_writes = [], []
    for a, b in slices:
        r, w = set(), set()
        for sec in ops[a:b]:
            for s in sec.src:          # src before dest: upward-exposed
                if s.type_ == "tmp" and s.id not in w:
                    r.add(s.id)
            if sec.dest.type_ == "tmp":
                w.add(sec.dest.id)
        sl_reads.append(r)
        sl_writes.append(w)
    live_ins = []
    written_before: set = set()
    read_after = [set() for _ in slices] + [set()]
    for k in range(len(slices) - 1, -1, -1):
        read_after[k] = read_after[k + 1] | sl_reads[k]
    for k in range(len(slices)):
        live_ins.append(read_after[k] & written_before
                        if k else set())
        written_before |= sl_writes[k]
    return slices, live_ins


def _execute_segment_sliced(ctx, segment, dom: str, state: dict,
                            max_ops: int, ma):
    """Run one segment as a chain of bounded jit programs; sections and
    live tmps stay device-resident between slices."""
    si = ctx.starkinfo
    ops = segment.first
    slices, live_ins = _slice_plan(ops, max_ops)
    tmp_state: dict = {}
    out_all: dict = {}
    state = dict(state)
    for k, (a, b) in enumerate(slices):
        keep = tuple(sorted(live_ins[k + 1])) if k + 1 < len(slices) else ()
        key = (id(segment), k, dom, ctx.nbits, ctx.nbits_ext, ma, max_ops)
        ent = _jit_cache.get(key)
        fn = ent[1] if ent is not None and ent[0] is segment else None
        if fn is None:
            ops_k = ops[a:b]
            fn = jax.jit(
                lambda st, ts, _ops=ops_k, _keep=keep: _trace_ops(
                    si, _ops, dom, ctx.nbits, ctx.nbits_ext, st, ts,
                    _keep, ma),
                compiler_options=_segment_compiler_options())
            _jit_cache[key] = (segment, fn)
        out, tmp_state = fn(state, tmp_state)
        state.update(out)
        out_all.update(out)
    return out_all


def _segment_compiler_options() -> dict | None:
    """XLA:CPU cannot compile the segment programs with instruction fusion
    enabled: fusion clones a producer into each consumer, and the
    vc-compression Horner fold (one multiply of the accumulator per
    identity) makes the cloning compound per level — the compiled code's
    WORK grows exponentially in identity count (measured: the 16-identity
    chain AIR's step42ns runs 9 ms with fusion off and does not finish in
    20+ minutes with it on; jaxpr size is linear either way).  The TPU
    pipeline's cost-modeled fusion does not have this pathology, so only
    CPU-backed compiles drop the pass."""
    import jax

    if jax.default_backend() == "cpu":
        return {"xla_disable_hlo_passes": "fusion"}
    return None


def _split64(a: np.ndarray):
    a = np.ascontiguousarray(a)
    return (jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((a >> np.uint64(32)).astype(np.uint32)))


def _join64(lo, hi) -> np.ndarray:
    return (np.asarray(lo).astype(np.uint64)
            | (np.asarray(hi).astype(np.uint64) << np.uint64(32)))


def _sum_mod(pair):
    """Sum a [N, d] GL pair over axis 0 (log-depth pairwise folding)."""
    lo, hi = pair
    n = lo.shape[0]
    while n > 1:
        half = n // 2
        head = (lo[:half], hi[:half])
        tail = (lo[half : 2 * half], hi[half : 2 * half])
        s = g.add(head, tail)
        if n % 2:
            s = g.add(s, (jnp.concatenate([lo[-1:],
                                           jnp.zeros_like(lo[: half - 1])]),
                          jnp.concatenate([hi[-1:],
                                           jnp.zeros_like(hi[: half - 1])])))
        lo, hi = s
        n = half
    return lo[0], hi[0]


@partial(jax.jit, static_argnames=("nbits",))
def _levs_kernel(xlo, xhi, wlo, whi, nbits: int):
    """LEv/LpEv on device: geometric powers by doubling (log-depth concat)
    then iNTT — bit-exact with host ntt.intt(_geometric(...))."""
    from . import ntt_jax

    outs = []
    for plo, phi in ((xlo, xhi), (wlo, whi)):
        pow_lo = jnp.concatenate([jnp.ones((1, 1), jnp.uint32),
                                  jnp.zeros((1, 2), jnp.uint32)], -1)
        pow_hi = jnp.zeros((1, 3), jnp.uint32)
        cur = (plo[None, :], phi[None, :])        # r^(2^k) as [1, 3]
        for _ in range(nbits):
            nxt_lo, nxt_hi = _f3_mul((pow_lo, pow_hi),
                                     (jnp.broadcast_to(cur[0], pow_lo.shape),
                                      jnp.broadcast_to(cur[1], pow_hi.shape)))
            pow_lo = jnp.concatenate([pow_lo, nxt_lo], 0)
            pow_hi = jnp.concatenate([pow_hi, nxt_hi], 0)
            cur = _f3_mul(cur, cur)
        outs.append(ntt_jax.intt((pow_lo, pow_hi), nbits))
    return tuple(outs)


def compute_levs(ctx, xis, wxis):
    """Device (LEv, LpEv) pairs for compute_evals — nothing big uploads."""
    xp = _split64(np.asarray(xis))
    wp = _split64(np.asarray(wxis))
    lev, lpev = _levs_kernel(xp[0], xp[1], wp[0], wp[1], ctx.nbits)
    return lev, lpev


def compute_evals(ctx, LEv, LpEv):
    """Openings at xi / w*xi on device: for every ev_map entry, the dot of
    its (strided) extended column with the Lagrange vector, summed mod p.
    Sections come from ctx._tpu_cache when resident; one tiny download.
    LEv/LpEv may be host [N, 3] arrays or device GL pairs."""
    si = ctx.starkinfo
    stride = 1 << (ctx.nbits_ext - ctx.nbits)
    entries = []
    for ev in si.ev_map:
        if ev.type_ == "const":
            entries.append(("const_2ns", int(ev.id), 1, bool(ev.prime)))
        elif ev.type_ == "cm":
            p = si.var_pol_map[si.cm_2ns[ev.id]]
            entries.append((p.section, int(p.section_pos), int(p.dim),
                            bool(ev.prime)))
        else:
            raise ValueError(f"Invalid ev type: {ev.type_}")
    needed = sorted({e[0] for e in entries})
    cache = getattr(ctx, "_tpu_cache", None)

    def fetch(name):
        if cache is not None and name in cache:
            return cache[name]
        pair = _split64(ctx.sections[name])
        if cache is not None and name not in _NO_CACHE:
            cache[name] = pair
        return pair

    state = {name: fetch(name) for name in needed}
    state["LEv"] = LEv if isinstance(LEv, tuple) else _split64(np.asarray(LEv))
    state["LpEv"] = LpEv if isinstance(LpEv, tuple) \
        else _split64(np.asarray(LpEv))

    from ..parallel import meshctx

    ma = meshctx.active()
    key = ("evals", id(si), ctx.nbits, ctx.nbits_ext, ma)
    ent = _jit_cache.get(key)
    # keep the starkinfo reference: it guards id() reuse after GC
    fn = ent[1] if ent is not None and ent[0] is si else None
    if fn is None:
        ents = tuple(entries)

        def run(st):
            outs_lo, outs_hi = [], []
            for sec, off, dim, prime in ents:
                lo, hi = meshctx.rows(st[sec], ma)
                v = (lo[::stride, off : off + dim],
                     hi[::stride, off : off + dim])
                l = st["LpEv"] if prime else st["LEv"]
                if dim == 1:
                    prod = g.mul(l, v)
                else:
                    prod = _f3_mul(v, l)
                slo, shi = _sum_mod(prod)
                outs_lo.append(slo)
                outs_hi.append(shi)
            return jnp.stack(outs_lo), jnp.stack(outs_hi)

        fn = jax.jit(run)
        _jit_cache[key] = (si, fn)
    lo, hi = fn(state)
    return _join64(lo, hi)


# buffers the host mutates between segments — never served from the cache
_NO_CACHE = {"cm1_n", "cm2_n", "cm3_n", "cm4_n", "tmpexp_n",
             "publics", "challenges", "evals"}


def execute_segment(ctx, segment, dom: str):
    """Drop-in for stark/vm.execute_segment: upload the segment's read/write
    sets, run the jitted trace, scatter results back into ctx.sections.

    Big device-stable buffers (const/ext sections, domain vectors) are
    served from ctx._tpu_cache when present — the commit backend
    (ops/commit_tpu.py) deposits LDE results there, so the quotient pass
    reads them without a re-upload, and segment outputs refresh the cache."""
    si = ctx.starkinfo
    reads, writes, aux = _analyze(ctx, segment, dom)
    cache = getattr(ctx, "_tpu_cache", None)

    def fetch(name, host):
        if cache is not None and name not in _NO_CACHE:
            hit = cache.get(name)
            if hit is None:
                hit = _split64(np.asarray(host))
                cache[name] = hit
            return hit
        return _split64(np.asarray(host))

    state = {}
    for name in reads | writes:
        state[name] = fetch(name, ctx.sections[name])
    for name in aux:
        arr = getattr(ctx, name) if name != "publics" else ctx.publics
        state[name] = fetch(name, arr)

    from ..parallel import meshctx

    ma = meshctx.active()
    # program splitting: segments past the op budget run as a chain of
    # bounded programs (the zkVM machine PILs are 5-7K ops per segment —
    # one fused program of that size kills the XLA compile helper)
    split = os.environ.get("EIGEN_ZKVM_VM_SPLIT_OPS", "")
    max_ops = int(split) if split else 1024
    if max_ops and len(segment.first) > max_ops:
        out = _execute_segment_sliced(ctx, segment, dom, state, max_ops, ma)
    else:
        key = (id(segment), dom, ctx.nbits, ctx.nbits_ext, ma)
        ent = _jit_cache.get(key)
        fn = ent[1] if ent is not None and ent[0] is segment else None
        if fn is None:
            fn = jax.jit(lambda st: _trace_segment(
                si, segment, dom, ctx.nbits, ctx.nbits_ext, st, ma),
                compiler_options=_segment_compiler_options())
            _jit_cache[key] = (segment, fn)
        out = fn(state)
    resident = getattr(getattr(ctx, "engine", None), "device_resident", False)
    for name, pair in out.items():
        if cache is not None and name not in _NO_CACHE:
            cache[name] = pair
        if resident and name.endswith("2ns"):
            continue  # stays device-only; FRI/evals/Q read the cache
        ctx.sections[name][:, :] = _join64(pair[0], pair[1])


def enabled() -> bool:
    """Env-gated only: the executor is backend-agnostic (tests run it on
    CPU; production points it at the TPU via the default device)."""
    return bool(os.environ.get("EIGEN_ZKVM_TPU_VM"))
