import os, sys, time
sys.path.insert(0, "/root/repo")
from scripts.bench_big import build_chain_air
from eigen_zkvm_tpu.stark.stark_gen import stark_gen
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
from eigen_zkvm_tpu.stark.stark_verify import stark_verify
from eigen_zkvm_tpu.stark.types import StarkStruct, Step

nbits, width = 23, 8
t0 = time.time()
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
print(f"setup {time.time()-t0:.1f}s", flush=True)
for k in range(3):
    t0 = time.perf_counter()
    proof = stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, ss)
    print(f"2^23x8 prove run{k}: {time.perf_counter()-t0:.2f}s", flush=True)
ok = stark_verify(proof, setup.const_root, setup.starkinfo, ss, setup.program)
print("verified:", ok, flush=True)
