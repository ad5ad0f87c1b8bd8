import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from eigen_zkvm_tpu.ops import poseidon_jax as pj
for nb in (20, 23, 24):
    n = 1 << nb
    lvl = (jnp.ones((n, 4), jnp.uint32), jnp.zeros((n, 4), jnp.uint32))
    t0 = time.time()
    try:
        r = pj._level_step_jit(lvl)
        x = np.asarray(r[0][:1, :1])
        print(f"level 2^{nb}: ok {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"level 2^{nb}: FAIL {type(e).__name__} {str(e)[:80]}", flush=True)
