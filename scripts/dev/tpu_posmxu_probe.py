"""Dev probe: MXU Poseidon kernel on the real chip (correctness + rate)."""
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from eigen_zkvm_tpu.ops import poseidon_mxu as pm
from eigen_zkvm_tpu.hash import poseidon_gl as pnp

P = 0xFFFFFFFF00000001
rng = np.random.default_rng(5)
B = 2048
st = rng.integers(0, 2**63, size=(B, 12), dtype=np.uint64) % np.uint64(P)
xt = st.T
lo = jnp.asarray((xt & np.uint64(0xFFFFFFFF)).astype(np.uint32))
hi = jnp.asarray((xt >> np.uint64(32)).astype(np.uint32))
t0 = time.time()
olo, ohi = pm.permute_t(lo, hi, block=1024)
got = (np.asarray(olo).astype(np.uint64) | (np.asarray(ohi).astype(np.uint64) << np.uint64(32))).T
print(f"mxu kernel compile+run {time.time()-t0:.1f}s", flush=True)
want = pnp.permute(st[:, :8], st[:, 8:])
print("bit-exact on TPU:", np.array_equal(want, got), flush=True)

B = 1 << 20
st = rng.integers(0, 2**63, size=(12, B), dtype=np.uint64) % np.uint64(P)
lo = jnp.asarray((st & np.uint64(0xFFFFFFFF)).astype(np.uint32))
hi = jnp.asarray((st >> np.uint64(32)).astype(np.uint32))

@partial(jax.jit, static_argnums=(2,))
def chained(a, b, reps):
    for _ in range(reps):
        a, b = pm.permute_t(a, b, block=1024)
    return a, b

outs = {}
for reps in (1, 4):
    r = chained(lo, hi, reps); np.asarray(r[0][:1, :1])
    t0 = time.perf_counter()
    r = chained(lo, hi, reps); np.asarray(r[0][:1, :1])
    outs[reps] = time.perf_counter() - t0
per = (outs[4] - outs[1]) / 3
print(f"mxu permute 2^20 states: {per*1e3:.2f}ms -> {B/per/1e6:.1f} M perms/s", flush=True)
