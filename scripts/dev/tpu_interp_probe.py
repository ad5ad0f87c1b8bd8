"""Dev probe: Pallas interpolate rate at 2^20x8 and 2^23x8."""
import time, sys, os
import numpy as np, jax, jax.numpy as jnp
from functools import partial
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from eigen_zkvm_tpu.ops import ntt_pallas as nt

P = 0xFFFFFFFF00000001
rng = np.random.default_rng(7)

def bench(nbits, npols, reps=3):
    vals = rng.integers(0, 2**63, size=(1 << nbits, npols), dtype=np.uint64) % np.uint64(P)
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))

    @partial(jax.jit, static_argnums=(1, 2, 3))
    def chained(pr, nb, nbe, reps):
        for _ in range(reps):
            r = nt.interpolate(pr, nb, nbe)
            pr = (r[0][:1 << nb], r[1][:1 << nb])
        return pr

    outs = {}
    for rp in (1, 1 + reps):
        t0 = time.time()
        r = chained((lo, hi), nbits, nbits + 1, rp)
        _ = np.asarray(r[0][:1, :1])
        print(f"2^{nbits} reps={rp} cold {time.time()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        r = chained((lo, hi), nbits, nbits + 1, rp)
        _ = np.asarray(r[0][:1, :1])
        outs[rp] = time.perf_counter() - t0
    per = (outs[1 + reps] - outs[1]) / reps
    n, ne = 1 << nbits, 1 << (nbits + 1)
    bf = (n // 2 * nbits + ne // 2 * (nbits + 1)) * npols
    print(f"pallas interpolate 2^{nbits}x{npols}: {per*1e3:.1f}ms -> "
          f"{bf/per/1e9:.2f} G butterflies/s", flush=True)

bench(20, 8)
bench(23, 8, reps=2)
