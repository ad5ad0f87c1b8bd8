"""Encoder + dispatcher for the native host segment executor.

Lowers a compiled Segment (stark/starkinfo_codegen.py) to the flat
instruction table consumed by native/vm_host.cpp and runs it in one C call.
The semantics mirror stark/vm.py exactly (same _read/_binop rules); proofs
are byte-identical (tests/test_vm_native.py).

Block execution caveat: vm_host.cpp processes all instructions for one
64-row block before the next, so within one segment every column that is
both READ and WRITTEN must use the SAME row shift for both — a differing
shift would make some block read rows another block has not produced (or
has already overwritten).  `_encode` rejects such segments and the
dispatcher falls back to the whole-column numpy VM, so correctness never
depends on the native path.
"""
from __future__ import annotations

import ctypes

import numpy as np

from .types import parse_pil_number

OP = {"add": 0, "sub": 1, "mul": 2, "copy": 3, "muladd": 4}
K_SEC, K_TMP, K_NUM, K_BCAST = 0, 1, 2, 3

# buffer table order: sections first (fixed list), then aux arrays
_SECTIONS = ["cm1_n", "cm2_n", "cm3_n", "cm4_n", "tmpexp_n",
             "cm1_2ns", "cm2_2ns", "cm3_2ns", "cm4_2ns",
             "q_2ns", "f_2ns", "const_n", "const_2ns"]
_AUX = ["x_n", "x_2ns", "zhinv_2ns", "x_div_x_sub_xi", "x_div_x_sub_wxi",
        "publics", "challenges", "evals"]
_BUF_IDX = {name: i for i, name in enumerate(_SECTIONS + _AUX)}

_encode_cache: dict = {}
_lib = None
_lib_checked = False


def _get_lib():
    global _lib, _lib_checked
    if not _lib_checked:
        from .. import native

        _lib = native.vm_host
        _lib_checked = True
    return _lib


class _Enc:
    """One Segment lowered for one domain."""

    __slots__ = ("instrs", "n_tmp", "max_shift")

    def __init__(self, instrs, n_tmp, max_shift):
        self.instrs = instrs
        self.n_tmp = n_tmp
        self.max_shift = max_shift


def _encode(si, widths: dict, segment, dom: str, nbits: int, nbits_ext: int):
    """Segment -> _Enc, or None if it needs the whole-column fallback."""
    next_ = 1 if dom == "n" else (1 << (nbits_ext - nbits))
    rows = []
    tmp_ids: dict = {}
    read_shifts: dict = {}   # (buf, col) -> set of shifts
    write_shifts: dict = {}

    def tmp_slot(tid):
        if tid not in tmp_ids:
            tmp_ids[tid] = len(tmp_ids)
        return tmp_ids[tid]

    def col_of(node):
        """(buf_idx, off, stride, dim) for a section-backed node."""
        t = node.type_
        if t == "const":
            name = "const_n" if dom == "n" else "const_2ns"
            return _BUF_IDX[name], int(node.id), widths[name], 1
        if t == "cm":
            pol_id = si.cm_n[node.id] if dom == "n" else si.cm_2ns[node.id]
        else:  # tmpExp
            pol_id = si.tmpexp_n[node.id]
        p = si.var_pol_map[pol_id]
        return (_BUF_IDX[p.section], int(p.section_pos), widths[p.section],
                int(p.dim))

    def enc_src(node):
        t = node.type_
        if t == "tmp":
            return [K_TMP, 0, 0, 0, 0, 0, tmp_slot(node.id)]
        if t == "number":
            return [K_NUM, 1, 0, 0, 0, 0, parse_pil_number(node.value)]
        if t in ("const", "cm", "tmpExp"):
            buf, off, stride, dim = col_of(node)
            shift = next_ if node.prime else 0
            for c in range(dim):
                read_shifts.setdefault((buf, off + c), set()).add(shift)
            return [K_SEC, dim, buf, off, stride, shift, 0]
        if t == "public":
            return [K_BCAST, 1, _BUF_IDX["publics"], int(node.id), 3, 0, 0]
        if t == "challenge":
            return [K_BCAST, 3, _BUF_IDX["challenges"], int(node.id), 3, 0, 0]
        if t == "eval":
            return [K_BCAST, 3, _BUF_IDX["evals"], int(node.id), 3, 0, 0]
        if t == "x":
            name = "x_n" if dom == "n" else "x_2ns"
            return [K_SEC, 1, _BUF_IDX[name], 0, 1, 0, 0]
        if t == "Zi":
            return [K_SEC, 1, _BUF_IDX["zhinv_2ns"], 0, 1, 0, 0]
        if t == "xDivXSubXi":
            return [K_SEC, 3, _BUF_IDX["x_div_x_sub_xi"], 0, 3, 0, 0]
        if t == "xDivXSubWXi":
            return [K_SEC, 3, _BUF_IDX["x_div_x_sub_wxi"], 0, 3, 0, 0]
        raise KeyError(t)

    ZSRC = [0] * 7
    try:
        for sec in segment.first:
            op = OP[sec.op]
            srcs = [enc_src(s) for s in sec.src]
            while len(srcs) < 3:
                srcs.append(ZSRC)

            dest = sec.dest
            if dest.type_ == "tmp":
                dst = [K_TMP, 0, 0, 0, 0, 0, tmp_slot(dest.id)]
            else:
                if dest.type_ in ("cm", "tmpExp"):
                    buf, off, stride, width = col_of(dest)
                elif dest.type_ == "q":
                    buf = _BUF_IDX["q_2ns"]
                    off, stride, width = int(dest.id), widths["q_2ns"], si.q_dim
                elif dest.type_ == "f":
                    buf = _BUF_IDX["f_2ns"]
                    off, stride, width = int(dest.id), 3, 3
                else:
                    raise KeyError(dest.type_)
                shift = next_ if dest.prime else 0
                for c in range(width):
                    write_shifts.setdefault((buf, off + c), set()).add(shift)
                dst = [K_SEC, buf, off, stride, width, shift, 0]
            rows.append([op] + dst + [len(sec.src)]
                        + srcs[0] + srcs[1] + srcs[2])
    except KeyError:
        return None

    # block-hazard check: every column both read and written in this segment
    # must use one identical shift on both sides (see module docstring)
    for col, ws in write_shifts.items():
        rs = read_shifts.get(col)
        if rs is not None and (len(ws) > 1 or len(rs) > 1 or ws != rs):
            return None

    instrs = np.ascontiguousarray(np.asarray(rows, dtype=np.int64))
    assert instrs.shape[1] == 30
    max_shift = 0
    for r in rows:
        max_shift = max(max_shift, r[6], r[14], r[21], r[28])
    return _Enc(instrs, len(tmp_ids), int(max_shift))


def execute_segment(ctx, segment, dom: str) -> bool:
    """Native run; returns False if the caller must use the numpy VM."""
    lib = _get_lib()
    if lib is None:
        return False
    si = ctx.starkinfo
    key = (id(segment), dom, ctx.nbits, ctx.nbits_ext)
    ent = _encode_cache.get(key)
    # the stored segment reference guards id() reuse after GC (and keeps
    # the segment alive so the guard holds)
    if ent is None or ent[0] is not segment:
        widths = {name: ctx.sections[name].shape[1] for name in _SECTIONS}
        try:
            enc = _encode(si, widths, segment, dom, ctx.nbits, ctx.nbits_ext)
        except Exception:
            enc = None
        _encode_cache[key] = ent = (segment, enc)
    enc = ent[1]
    if enc is None:
        return False

    n = ctx.N if dom == "n" else ctx.Next

    bufs = [ctx.sections[name] for name in _SECTIONS]
    aux = {"x_n": ctx.x_n, "x_2ns": ctx.x_2ns, "zhinv_2ns": ctx.zhinv_2ns,
           "x_div_x_sub_xi": ctx.x_div_x_sub_xi,
           "x_div_x_sub_wxi": ctx.x_div_x_sub_wxi,
           "publics": ctx.publics, "challenges": ctx.challenges,
           "evals": ctx.evals}
    for name in _AUX:
        a = aux[name]
        bufs.append(a if a is not None else np.zeros(1, dtype=np.uint64))
    for a in bufs:
        if a.dtype != np.uint64 or not a.flags["C_CONTIGUOUS"]:
            return False

    ptrs = np.array([a.__array_interface__["data"][0] for a in bufs],
                    dtype=np.uint64)
    scratch = np.empty(max(1, enc.n_tmp) * 3 * 64, dtype=np.uint64)
    tdim = np.zeros(max(1, enc.n_tmp), dtype=np.int64)
    lib.vm_exec_segment(
        enc.instrs.__array_interface__["data"][0], enc.instrs.shape[0],
        ptrs.__array_interface__["data"][0], n, enc.n_tmp, enc.max_shift,
        scratch.__array_interface__["data"][0],
        tdim.__array_interface__["data"][0])
    return True


def bind(lib):
    """ctypes argtypes for vm_host (called from native/__init__)."""
    vp = ctypes.c_void_p
    st = ctypes.c_size_t
    lib.vm_exec_segment.argtypes = [vp, st, vp, st, st, st, vp, vp]
    return lib
