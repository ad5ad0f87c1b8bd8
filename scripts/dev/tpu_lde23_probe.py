import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from eigen_zkvm_tpu.ops import commit_tpu
P = 0xFFFFFFFF00000001
rng = np.random.default_rng(3)
vals = rng.integers(0, 2**63, size=(1 << 23, 1), dtype=np.uint64) % np.uint64(P)
t0 = time.time()
tree = commit_tpu.tpu_extend_and_merkelize(vals, 23, 24)
r = tree.root()
print(f"extend+merkelize 2^23 w1 ok in {time.time()-t0:.1f}s root={[int(x) for x in r][:2]}", flush=True)
