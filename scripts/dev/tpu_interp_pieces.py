"""Piecewise timing of the four-step interpolate at 2^20x8."""
import time, sys, os
import numpy as np, jax, jax.numpy as jnp
from functools import partial
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from eigen_zkvm_tpu.ops import ntt_pallas as nt
from eigen_zkvm_tpu.ops import gl_jax as g
from eigen_zkvm_tpu.fields import gl64 as gl

P = 0xFFFFFFFF00000001
rng = np.random.default_rng(7)

def timed(fn, x, reps=4, label=""):
    f1 = jax.jit(partial(fn, k=1)); f4 = jax.jit(partial(fn, k=1+reps))
    for f in (f1, f4):
        r = f(x); np.asarray(jax.tree.leaves(r)[0][:1, :1])
    ts = {}
    for nm, f in (("1", f1), ("4", f4)):
        t0 = time.perf_counter()
        r = f(x); np.asarray(jax.tree.leaves(r)[0][:1, :1])
        ts[nm] = time.perf_counter() - t0
    per = (ts["4"] - ts["1"]) / reps
    print(f"{label}: {per*1e3:.2f}ms", flush=True)

nbits, npols = 20, 8
vals = rng.integers(0, 2**63, size=(1 << nbits, npols), dtype=np.uint64) % np.uint64(P)
lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))

def full_ntt(x, k=1):
    a, b = x
    for _ in range(k):
        a, b = nt.ntt((a, b), nbits)
    return a, b
timed(full_ntt, (lo, hi), label="ntt(20) full")

# pass-1 kernel only: 2^9 over [512, 2^11*8]
l2 = lo.reshape(512, -1); h2 = hi.reshape(512, -1)
def k9(x, k=1):
    a, b = x
    for _ in range(k):
        a, b = nt.ntt_axis0((a, b), 9)
    return a, b
timed(k9, (l2, h2), label="k9 pass (64MB)")

# twiddle table build alone (nbits=20, a=9)
def twbuild(x, k=1):
    a, b = x
    acc = (a[:1,:1], b[:1,:1])
    for _ in range(k):
        tw = nt._four_step_twiddle(20, 9, int(gl.root_of_unity(20)))
        acc = g.add(acc, (tw[0][:1,:1], tw[1][:1,:1]))
    return acc
timed(twbuild, (lo, hi), label="twiddle build [512,2048]")

# twiddle mul + transpose at [512, 2048, 8]
tw = jax.jit(lambda: nt._four_step_twiddle(20, 9, int(gl.root_of_unity(20))))()
def twtr(x, k=1):
    a, b = x
    for _ in range(k):
        A3 = (a.reshape(512, 2048, 8), b.reshape(512, 2048, 8))
        B = g.mul(A3, (tw[0][:, :, None], tw[1][:, :, None]))
        a = B[0].transpose(1, 0, 2).reshape(2048, 512 * 8)[:512, :16384]
        b = B[1].transpose(1, 0, 2).reshape(2048, 512 * 8)[:512, :16384]
    return a, b
timed(twtr, (l2, h2), label="twiddle-mul+transpose")

# transpose only
def tronly(x, k=1):
    a, b = x
    for _ in range(k):
        a = a.reshape(512, 2048, 8).transpose(1, 0, 2).reshape(2048, 4096)[:512, :16384//4]
        b = b.reshape(512, 2048, 8).transpose(1, 0, 2).reshape(2048, 4096)[:512, :16384//4]
        a = jnp.pad(a, ((0,0),(0,16384-4096)))
        b = jnp.pad(b, ((0,0),(0,16384-4096)))
    return a, b
timed(tronly, (l2, h2), label="transpose only (approx)")
