"""The device segment executor (ops/vm_jax.py) must produce proofs
byte-identical to the numpy column VM (stark/vm.py)."""
import os

import pytest

from eigen_zkvm_tpu.examples import fibonacci
from eigen_zkvm_tpu.stark.types import StarkStruct, Step
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
from eigen_zkvm_tpu.stark.stark_gen import stark_gen
from eigen_zkvm_tpu.stark.serializer import stark_proof_to_json


@pytest.mark.slow
def test_vm_jax_matches_numpy(monkeypatch):
    NB = 8
    pil, const_pols, make_trace = fibonacci.build(NB)
    cm = make_trace()
    ss = StarkStruct(nBits=NB, nBitsExt=NB + 1, nQueries=4,
                     verificationHashType="GL",
                     steps=[Step(NB + 1), Step(NB - 3)])
    setup = StarkSetup(const_pols, pil, ss)
    monkeypatch.delenv("EIGEN_ZKVM_TPU_VM", raising=False)
    p0 = stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                   setup.program, ss)
    monkeypatch.setenv("EIGEN_ZKVM_TPU_VM", "1")
    p1 = stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                   setup.program, ss)
    assert stark_proof_to_json(p0) == stark_proof_to_json(p1)
    # program splitting (the real-machine-PIL device path): every segment
    # forced into 8-op slices with live-tmp threading must still produce
    # the byte-identical proof
    monkeypatch.setenv("EIGEN_ZKVM_VM_SPLIT_OPS", "8")
    from eigen_zkvm_tpu.ops import vm_jax

    vm_jax._jit_cache.clear()
    p2 = stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                   setup.program, ss)
    assert stark_proof_to_json(p0) == stark_proof_to_json(p2)
