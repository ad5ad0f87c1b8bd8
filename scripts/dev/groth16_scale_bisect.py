"""Bisect the outer-prove verification failure by constraint count."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from eigen_zkvm_tpu.curves import bls12_381 as bls
from eigen_zkvm_tpu.groth16.groth16 import prove, setup, verify
from eigen_zkvm_tpu.recursion.circuit import CircuitBuilder

def run(n):
    b = CircuitBuilder(prime=bls.R)
    want = pow(3, n + 1, bls.R)
    out = b.public(want)
    x = b.wire(b.sig(3))
    acc = x
    for _ in range(n):
        acc = b.mul(acc, x)
    b.assert_eq(acc, out)
    t0 = time.time()
    pk, vk = setup(bls, b.constraints, b.n_vars, b.n_publics)
    t1 = time.time()
    proof, pubs = prove(bls, pk, b.constraints, b.w)
    t2 = time.time()
    ok = verify(bls, vk, proof, pubs)
    print(f"n={n}: constraints={len(b.constraints)} setup={t1-t0:.0f}s "
          f"prove={t2-t1:.0f}s verified={ok}", flush=True)
    return ok

for n in (4, 16, 64, 256, 1024, 4096, 16384):
    if not run(n):
        break
# same chain on BN254
from eigen_zkvm_tpu.curves import bn254 as bn
def run_bn(n):
    b = CircuitBuilder(prime=bn.R)
    want = pow(3, n + 1, bn.R)
    out = b.public(want)
    x = b.wire(b.sig(3))
    acc = x
    for _ in range(n):
        acc = b.mul(acc, x)
    b.assert_eq(acc, out)
    pk, vk = setup(bn, b.constraints, b.n_vars, b.n_publics)
    proof, pubs = prove(bn, pk, b.constraints, b.w)
    ok = verify(bn, vk, proof, pubs)
    print(f"bn254 n={n}: verified={ok}", flush=True)
    return ok
for n in (1024, 16384):
    if not run_bn(n):
        break
