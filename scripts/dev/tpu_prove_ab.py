"""A/B the 2^20x8 device prove across kernel-dispatch configs."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
cfg = sys.argv[1]  # e.g. "ladder,xla"
ntt, pos = cfg.split(",")
os.environ["EIGEN_ZKVM_NTT"] = {"ladder": "ladder", "pallas": "auto"}[ntt]
os.environ["EIGEN_ZKVM_POSEIDON"] = {"xla": "xla", "mxu": "auto"}[pos]
sys.path.insert(0, "/root/repo")
from scripts.bench_big import build_chain_air
from eigen_zkvm_tpu.stark.stark_gen import stark_gen
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
from eigen_zkvm_tpu.stark.types import StarkStruct, Step

nbits, width = 20, 8
pil, const_pols, cm = build_chain_air(nbits, width)
steps = []
cur = nbits + 1
while cur > 4:
    steps.append(Step(cur))
    cur -= 5
steps.append(Step(cur))
ss = StarkStruct(nBits=nbits, nBitsExt=nbits + 1, nQueries=8,
                 verificationHashType="GL", steps=steps)
setup = StarkSetup(const_pols, pil, ss)
best = 1e9
for k in range(3):
    t0 = time.perf_counter()
    proof = stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, ss)
    dt = time.perf_counter() - t0
    best = min(best, dt)
    print(f"{cfg} run{k}: {dt:.2f}s", flush=True)
print(f"RESULT {cfg}: best {best:.2f}s", flush=True)
