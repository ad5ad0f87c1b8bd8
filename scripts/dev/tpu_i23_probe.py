import os, sys, time
mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
os.environ["EIGEN_ZKVM_NTT"] = mode
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from eigen_zkvm_tpu.ops import ntt_jax
P = 0xFFFFFFFF00000001
rng = np.random.default_rng(3)
vals = rng.integers(0, 2**63, size=(1 << 23, 1), dtype=np.uint64) % np.uint64(P)
lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
t0 = time.time()
r = ntt_jax.interpolate_jit((lo, hi), 23, 24)
x = np.asarray(r[0][:1, :1])
print(f"{mode}: interpolate 23->24 width1 ok in {time.time()-t0:.1f}s", flush=True)
