"""eSTARK prover: 4-stage commit + deep FRI, fully column-vectorized.

Stage structure and Fiat-Shamir schedule replicate the reference prover
(starky/src/stark_gen.rs) bit-for-bit; every hot loop is re-expressed as
whole-column batched array ops:

  stage1  commit trace            -> LDE + Merkle (batched)
  stage2  plookup H1/H2           -> vectorized segment + stable sort
  stage3  grand-product Z         -> log-depth prefix product
  stage4  Q = C / Z_H on coset    -> vectorized segment + batched NTT shuffle
  evals   openings at xi, w*xi    -> batched Lagrange iNTT + modular reduce
  FRI     deep quotient + folds   -> batched group iNTT/Horner
"""
from __future__ import annotations

import numpy as np

from ..fields import f3g
from ..fields import gl64 as gl
from ..poly import ntt
from .backends import get_backend
from .engine import Engine
from .fri import FRI, FRIProof
from ..utils.profiler import Prof, sync_enabled
from ..utils import structlog
from .vm import ProverContext, execute_segment


def _exec_segment(ctx, segment, dom):
    """Dispatch one compiled segment: the device executor when the engine
    says so (ops/vm_jax.py), else the native cache-blocked host executor
    (native/vm_host.cpp), else the numpy column VM."""
    import os

    if ctx.engine.tpu_vm:
        from ..ops import vm_jax

        return vm_jax.execute_segment(ctx, segment, dom)
    if not os.environ.get("EIGEN_ZKVM_NO_NATIVE"):
        from . import vm_native

        if vm_native.execute_segment(ctx, segment, dom):
            return
    execute_segment(ctx, segment, dom)


class StarkProof:
    def __init__(self):
        self.root1 = self.root2 = self.root3 = self.root4 = None
        self.rootC = None
        self.fri_proof: FRIProof | None = None
        self.evals = None      # [n_ev, 3]
        self.publics = None    # [n_pub, 3]
        self.public_dims = []  # per-public value dim (1 or 3) for transcript
        self.prover_addr = ""


def _pol_ref(ctx: ProverContext, pol_id: int):
    p = ctx.starkinfo.var_pol_map[pol_id]
    buf = ctx.sections[p.section]
    return buf, p.section_pos, p.dim


def get_pol(ctx: ProverContext, pol_id: int) -> np.ndarray:
    """Extract a polynomial as extension values [deg, 3]."""
    buf, off, dim = _pol_ref(ctx, pol_id)
    out = np.zeros((buf.shape[0], 3), dtype=np.uint64)
    out[:, :dim] = buf[:, off : off + dim]
    return out


def set_pol(ctx: ProverContext, pol_id: int, pol: np.ndarray):
    buf, off, dim = _pol_ref(ctx, pol_id)
    buf[:, off : off + dim] = pol[:, :dim]


def calculate_h1h2(f: np.ndarray, t: np.ndarray):
    """Plookup halves (reference stark_gen.rs calculate_H1H2): merge f into t
    by first-occurrence index with a stable sort, split even/odd."""
    t_keys = [tuple(int(x) for x in row) for row in t]
    idx_t = {}
    for i, k in enumerate(t_keys):
        idx_t[k] = i
    n_t, n_f = t.shape[0], f.shape[0]
    keys = np.empty(n_t + n_f, dtype=np.int64)
    keys[:n_t] = np.arange(n_t)
    for i, row in enumerate(f):
        k = tuple(int(x) for x in row)
        if k not in idx_t:
            raise ValueError(f"Number not included: {k}")
        keys[n_t + i] = idx_t[k]
    order = np.argsort(keys, kind="stable")
    s = np.concatenate([t, f], axis=0)[order]
    h1 = s[0::2]
    h2 = s[1::2]
    return h1, h2


def calculate_z(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """Z[0]=1, Z[i] = prod_{k<i} num[k]/den[k]; checks full product == 1."""
    ratios = f3g.mul(num, f3g.inv(den))
    acc = f3g.prefix_product(ratios)
    assert np.array_equal(acc[-1], f3g.ONE), "calculate_z: product != 1"
    z = np.empty_like(acc)
    z[0] = f3g.ONE
    z[1:] = acc[:-1]
    return z


def _tpu_commit(ctx):
    """The on-device commit backend, when the engine selected it."""
    if not ctx.engine.tpu_commit:
        return None
    from ..ops import commit_tpu

    return commit_tpu


def _extend_and_merkelize(ctx: ProverContext, section: str, merkle_cls):
    """LDE a *_n section to its *_2ns twin and Merkle-commit it.

    Device engine: the LDE pair stays on the accelerator (deposited in
    ctx._tpu_cache for the VM/evals/FRI passes); the host *_2ns section is
    only materialized when a host consumer still needs it (mixed mode)."""
    from ..hash.merkle_gl import MerkleTreeGL

    n_pols = ctx.sections[section].shape[1]
    ext_name = section.replace("_n", "_2ns")
    if n_pols == 0 and merkle_cls is MerkleTreeGL \
            and ctx.Next & (ctx.Next - 1) == 0:
        from ..hash.merkle_gl import ZeroMerkleTreeGL

        return ZeroMerkleTreeGL.build(ctx.Next)
    tpu = _tpu_commit(ctx) if merkle_cls is MerkleTreeGL and n_pols else None
    if tpu is not None:
        tree = tpu.tpu_extend_and_merkelize(
            ctx.sections[section], ctx.nbits, ctx.nbits_ext,
            cache=getattr(ctx, "_tpu_cache", None), cache_key=ext_name)
        if not ctx.engine.device_resident:
            ctx.sections[ext_name][:, :] = tree.elements
        return tree
    lde = ntt.interpolate(ctx.sections[section], ctx.nbits, ctx.nbits_ext) \
        if n_pols else np.zeros((ctx.Next, 0), dtype=np.uint64)
    ctx.sections[ext_name][:, :] = lde
    tree = merkle_cls().merkelize(lde, n_pols, ctx.Next)
    return tree


def _merkelize(ctx: ProverContext, section: str, merkle_cls):
    from ..hash.merkle_gl import MerkleTreeGL

    buf = ctx.sections[section]
    tpu = _tpu_commit(ctx) if merkle_cls is MerkleTreeGL and buf.shape[1] else None
    if tpu is not None:
        cache = getattr(ctx, "_tpu_cache", None)
        pair = cache.get(section) if cache is not None else None
        host_buf = None if (ctx.engine.device_resident and pair is not None) \
            else buf
        return tpu.tpu_merkelize(host_buf, cache=cache, cache_key=section,
                                 pair=pair, shape=buf.shape)
    return merkle_cls().merkelize(buf, buf.shape[1], buf.shape[0])


def stark_gen(cm_pols, const_pols, const_tree, starkinfo,
              program, stark_struct, prover_addr: str = "") -> StarkProof:
    merkle_cls, transcript_cls = get_backend(stark_struct.verificationHashType)
    prof = Prof("stark_gen")
    ctx = ProverContext(starkinfo, stark_struct)
    ctx.engine = Engine(stark_struct.nBitsExt)
    structlog.log_event("stark_gen.start", nbits=stark_struct.nBits,
                        nbits_ext=stark_struct.nBitsExt,
                        hash=stark_struct.verificationHashType,
                        engine=repr(ctx.engine))
    if sync_enabled():
        def _drain():
            import jax

            vals = list(getattr(ctx, "_tpu_cache", {}).values())
            if vals:
                jax.block_until_ready(vals)
        prof.sync = _drain
    N, Next = ctx.N, ctx.Next
    extend_bits = ctx.nbits_ext - ctx.nbits

    n_cm = starkinfo.n_cm1

    # trace + preprocessed columns
    ctx.sections["cm1_n"][:, :] = cm_pols.write_buff()
    ctx.sections["const_n"][:, :] = const_pols.write_buff()
    const_pair = getattr(const_tree, "_elem_pair", None)
    if ctx.engine.device_resident and const_pair is not None:
        # device-built const tree (stark_setup): the extended constants
        # stay on the accelerator, serving VM/evals reads from the cache
        ctx._tpu_cache["const_2ns"] = const_pair
    else:
        ctx.sections["const_2ns"][:, :] = const_tree.to_extend()

    # domains
    w_n = np.uint64(gl.root_of_unity(ctx.nbits))
    w_ext = np.uint64(gl.root_of_unity(ctx.nbits_ext))
    shift = np.uint64(gl.SHIFT)
    if ctx.engine.tpu_vm:
        # device VM: the x / Z_H^-1 domain vectors are built ON DEVICE
        # (log-doubling kernels, bit-exact) — the host neither computes
        # nor uploads them (134 MB each at 2^24 through the tunnel)
        from ..ops import vm_jax as _vmj

        _vmj.seed_domains(ctx)
    else:
        ctx.x_n = gl.exp_vec(w_n, np.arange(N, dtype=np.uint64))
        ctx.x_2ns = gl.mul(shift,
                           gl.exp_vec(w_ext, np.arange(Next, dtype=np.uint64)))
        # Z_H^-1 on the extended coset: 1/(shift^N * w_eb^i - 1), period 2^eb
        sn = gl.exp(shift, N)
        w_eb = np.uint64(gl.root_of_unity(extend_bits))
        zh = gl.sub(gl.mul(sn, gl.exp_vec(
            w_eb, np.arange(1 << extend_bits, dtype=np.uint64))),
            np.uint64(1))
        ctx.zhinv_2ns = np.tile(gl.inv(zh), Next >> extend_bits)

    # publics
    n_pub = len(starkinfo.publics)
    ctx.publics = np.zeros((n_pub, 3), dtype=np.uint64)
    public_dims = []
    for i, pe in enumerate(starkinfo.publics):
        if pe.polType == "cmP":
            ctx.publics[i, 0] = ctx.sections["cm1_n"][pe.idx, pe.polId]
            public_dims.append(1)
        elif pe.polType == "imP":
            val, dim = _calculate_exp_at_point(ctx, program.publics_code[i], pe.idx)
            ctx.publics[i, :dim] = val[:dim]
            public_dims.append(dim)
        else:
            raise ValueError(f"Invalid public type {pe.polType}")

    transcript = transcript_cls()
    for i in range(n_pub):
        transcript.put_elements([int(x) for x in ctx.publics[i, : public_dims[i]]])

    # ---- stage 1
    tree1 = _extend_and_merkelize(ctx, "cm1_n", merkle_cls)
    transcript.put_root(tree1.root())
    ctx.challenges[0] = transcript.get_field()  # u
    ctx.challenges[1] = transcript.get_field()  # defVal

    _exec_segment(ctx, program.step2prev, "n")
    for pu in starkinfo.pu_ctx:
        f_pol = get_pol(ctx, starkinfo.exp2pol[pu.f_exp_id])
        t_pol = get_pol(ctx, starkinfo.exp2pol[pu.t_exp_id])
        h1, h2 = calculate_h1h2(f_pol, t_pol)
        set_pol(ctx, starkinfo.cm_n[n_cm], h1)
        n_cm += 1
        set_pol(ctx, starkinfo.cm_n[n_cm], h2)
        n_cm += 1

    prof.tick("stage1 trace commit")
    # ---- stage 2
    tree2 = _extend_and_merkelize(ctx, "cm2_n", merkle_cls)
    transcript.put_root(tree2.root())
    ctx.challenges[2] = transcript.get_field()  # gamma
    ctx.challenges[3] = transcript.get_field()  # beta

    _exec_segment(ctx, program.step3prev, "n")
    for o in list(starkinfo.pu_ctx) + list(starkinfo.pe_ctx) + list(starkinfo.ci_ctx):
        p_num = get_pol(ctx, starkinfo.exp2pol[o.num_id])
        p_den = get_pol(ctx, starkinfo.exp2pol[o.den_id])
        z = calculate_z(p_num, p_den)
        set_pol(ctx, starkinfo.cm_n[n_cm], z)
        n_cm += 1

    _exec_segment(ctx, program.step3, "n")

    prof.tick("stage2 h1/h2 commit")
    # ---- stage 3
    tree3 = _extend_and_merkelize(ctx, "cm3_n", merkle_cls)
    transcript.put_root(tree3.root())
    ctx.challenges[4] = transcript.get_field()  # vc
    prof.tick("stage3a cm3 commit")

    _exec_segment(ctx, program.step42ns, "2ns")
    prof.tick("stage3b step42ns")

    # Q split: monomial blocks of size N, coset-unscale, recombine on ext domain
    q_dim, q_deg = starkinfo.q_dim, starkinfo.q_deg
    from ..hash.merkle_gl import MerkleTreeGL as _MTGL

    tpu = _tpu_commit(ctx) if merkle_cls is _MTGL else None
    q_pair = ctx._tpu_cache.get("q_2ns") if tpu is not None else None
    if q_deg > 0 and q_pair is not None:
        # device path: the quotient is already resident from step42ns
        from ..ops.commit_tpu import _join as _tpu_join

        pair = tpu.tpu_q_split(q_pair, q_dim, q_deg, ctx.nbits, ctx.nbits_ext)
        ctx._tpu_cache["cm4_2ns"] = pair
        if not ctx.engine.device_resident:
            # mixed mode only: a host consumer (native VM / host FRI) may
            # still read the section.  Fully resident, this download is
            # ~GBs over the tunnel for nothing — tree4 merkelizes from
            # the cached pair and step52ns reads the cache.
            ctx.sections["cm4_2ns"][:, :] = _tpu_join(*pair)
    elif q_deg > 0:
        qq1 = ntt.intt(ctx.sections["q_2ns"])  # [Next, q_dim] coefficients
        qq2 = np.zeros((Next, q_dim * q_deg), dtype=np.uint64)
        shift_inv_n = gl.exp(gl.inv(shift), N)
        cur_s = np.uint64(1)
        for p in range(q_deg):
            qq2[:N, q_dim * p : q_dim * (p + 1)] = gl.mul(
                qq1[p * N : (p + 1) * N], cur_s)
            cur_s = gl.mul(cur_s, shift_inv_n)
        ctx.sections["cm4_2ns"][:, :] = ntt.ntt(qq2)

    prof.tick("stage3 z commit")
    # ---- stage 4
    tree4 = _merkelize(ctx, "cm4_2ns", merkle_cls)
    transcript.put_root(tree4.root())
    ctx.challenges[7] = transcript.get_field()  # xi

    # evals at xi and w*xi via Lagrange iNTT
    xi = ctx.challenges[7]
    shift_inv = gl.inv(shift)
    xis = f3g.mul_base(xi, shift_inv)
    wxis = f3g.mul_base(f3g.mul_base(xi, w_n), shift_inv)

    if ctx.engine.tpu_vm and len(starkinfo.ev_map):
        from .engine import accel_active
        from ..ops import vm_jax

        if accel_active():
            # Lagrange vectors built ON device (geometric powers + iNTT)
            # — no [N, 3] upload rides the host link
            levs = vm_jax.compute_levs(ctx, xis, wxis)
        else:
            levs = (ntt.intt(_geometric(xis, N)),
                    ntt.intt(_geometric(wxis, N)))
        evals = vm_jax.compute_evals(ctx, *levs)
    else:
        from .. import native

        LEv = ntt.intt(_geometric(xis, N))
        LpEv = ntt.intt(_geometric(wxis, N))
        nv = native.gl_vec if hasattr(native.gl_vec, "f3_dot") else None
        evals = np.zeros((len(starkinfo.ev_map), 3), dtype=np.uint64)
        for i, ev in enumerate(starkinfo.ev_map):
            if ev.type_ == "const":
                buf = ctx.sections["const_2ns"]
                off, dim = ev.id, 1
            elif ev.type_ == "cm":
                p = starkinfo.var_pol_map[starkinfo.cm_2ns[ev.id]]
                buf = ctx.sections[p.section]
                off, dim = p.section_pos, p.dim
            else:
                raise ValueError(f"Invalid ev type: {ev.type_}")
            l = LpEv if ev.prime else LEv
            r = nv.f3_dot(l, buf, 1 << extend_bits, off, dim) \
                if nv is not None else None
            if r is not None:
                evals[i] = r
                continue
            v = buf[:: 1 << extend_bits, off : off + dim]  # stride 2^eb
            if dim == 1:
                prod = gl.mul(l, v)  # broadcast [N,3] * [N,1]
            else:
                prod = f3g.mul(v, l)
            evals[i] = gl.sum_mod(prod, axis=0)
    ctx.evals = evals

    for i in range(evals.shape[0]):
        transcript.put_elements([int(x) for x in evals[i]])

    ctx.challenges[5] = transcript.get_field()  # v1
    ctx.challenges[6] = transcript.get_field()  # v2

    # xDivXSubXi / xDivXSubWXi over the extended coset
    wxi = f3g.mul_base(xi, w_n)

    if ctx.engine.tpu_vm:
        from ..ops import vm_jax

        ctx.x_div_x_sub_xi, ctx.x_div_x_sub_wxi = vm_jax.compute_xdiv(
            ctx, xi, wxi)
    else:
        from .. import native

        x_buff = ctx.x_2ns  # [Next] base
        if native.gl_vec is not None and hasattr(native.gl_vec, "f3_xdiv"):
            # fused native pass: adjugate + one batched norm inversion
            # (the numpy form's two [Next, 3] batch inversions were the
            # single hottest stage-4 item at 2^23: ~17 s each)
            ctx.x_div_x_sub_xi = native.gl_vec.f3_xdiv(x_buff, xi)
            ctx.x_div_x_sub_wxi = native.gl_vec.f3_xdiv(x_buff, wxi)
        else:
            den = f3g.from_base(x_buff)
            denw = den.copy()
            den = f3g.sub(den, np.broadcast_to(xi[None, :], (Next, 3)))
            denw = f3g.sub(denw, np.broadcast_to(wxi[None, :], (Next, 3)))
            ctx.x_div_x_sub_xi = f3g.mul_base(f3g.inv(den), x_buff)
            ctx.x_div_x_sub_wxi = f3g.mul_base(f3g.inv(denw), x_buff)

    _exec_segment(ctx, program.step52ns, "2ns")
    prof.tick("stage4 quotient + openings")

    trees = [tree1, tree2, tree3, tree4, const_tree]

    def query_pol(idx: int):
        return [t.get_group_proof(idx) for t in trees]

    def prefetch(idxs):
        """Batch the per-tree query gathers (one device round trip per
        tree instead of one per (tree, query))."""
        for t in trees:
            if hasattr(t, "prefetch"):
                t.prefetch(idxs)

    fri = FRI(stark_struct, merkle_cls, engine=ctx.engine)
    if ctx.engine.device_resident and "f_2ns" in ctx._tpu_cache:
        fri_proof = fri.prove(transcript, None, query_pol,
                              device_pair=ctx._tpu_cache["f_2ns"],
                              prefetch=prefetch)
    else:
        fri_pol = ctx.sections["f_2ns"].copy()
        fri_proof = fri.prove(transcript, fri_pol, query_pol,
                              prefetch=prefetch)

    proof = StarkProof()
    proof.rootC = const_tree.root()
    prof.tick("fri")
    prof.done()
    proof.root1 = tree1.root()
    proof.root2 = tree2.root()
    proof.root3 = tree3.root()
    proof.root4 = tree4.root()
    proof.fri_proof = fri_proof
    proof.evals = evals
    proof.publics = ctx.publics
    proof.public_dims = public_dims
    proof.prover_addr = prover_addr
    return proof


def _geometric(r: np.ndarray, n: int) -> np.ndarray:
    """[1, r, r^2, ..., r^(n-1)] for extension r [3] -> [n, 3]."""
    out = np.zeros((n, 3), dtype=np.uint64)
    out[0] = f3g.ONE
    rb = np.broadcast_to(r[None, :], (n, 3)).copy()
    rb[0] = f3g.ONE
    return f3g.prefix_product(rb)


def _calculate_exp_at_point(ctx: ProverContext, segment, idx: int):
    """Evaluate a publics segment's final value at one row (vectorized run)."""
    tmps: dict = {}
    from .vm import _binop, _read

    n, next_ = ctx.N, 1

    def read(node):
        if node.type_ == "tmp":
            return tmps[node.id]
        return _read(ctx, node, "n", n, next_)

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
            raise ValueError(sec.op)
        assert sec.dest.type_ == "tmp", "publics code writes only tmps"
        tmps[sec.dest.id] = (val, dv)

    val, dv = tmps[segment.first[-1].dest.id]
    out = np.zeros(3, dtype=np.uint64)
    out[:dv] = val[idx]
    return out, dv
