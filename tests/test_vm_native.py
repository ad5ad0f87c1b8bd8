"""The native host segment executor (native/vm_host.cpp via
stark/vm_native.py) must produce proofs byte-identical to the numpy column
VM (stark/vm.py) — same contract as the device executor test."""
import numpy as np
import pytest

from eigen_zkvm_tpu import native
from eigen_zkvm_tpu.examples import fibonacci, plookup, permutation
from eigen_zkvm_tpu.stark.serializer import stark_proof_to_json
from eigen_zkvm_tpu.stark.stark_gen import stark_gen
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
from eigen_zkvm_tpu.stark.types import StarkStruct, Step
from eigen_zkvm_tpu.stark import vm_native


def _prove(example, nbits, monkeypatch, use_native):
    pil, const_pols, make_trace = example.build(nbits)
    cm = make_trace()
    ss = StarkStruct(nBits=nbits, nBitsExt=nbits + 1, nQueries=4,
                     verificationHashType="GL",
                     steps=[Step(nbits + 1), Step(nbits - 3)])
    setup = StarkSetup(const_pols, pil, ss)
    if use_native:
        monkeypatch.delenv("EIGEN_ZKVM_NO_NATIVE", raising=False)
    else:
        monkeypatch.setenv("EIGEN_ZKVM_NO_NATIVE", "1")
    return stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                     setup.program, ss)


@pytest.mark.skipif(native.vm_host is None, reason="no native vm_host")
@pytest.mark.parametrize("example", [fibonacci, plookup, permutation])
def test_vm_native_matches_numpy(example, monkeypatch):
    vm_native._encode_cache.clear()
    p_native = _prove(example, 8, monkeypatch, use_native=True)
    p_numpy = _prove(example, 8, monkeypatch, use_native=False)
    assert stark_proof_to_json(p_native) == stark_proof_to_json(p_numpy)


@pytest.mark.skipif(native.vm_host is None, reason="no native vm_host")
def test_vm_native_covers_segments():
    """The quotient (2ns) segments of a lookup-free AIR must take the native
    path (no silent always-fallback)."""
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup

    pil, const_pols, make_trace = fibonacci.build(8)
    ss = StarkStruct(nBits=8, nBitsExt=9, nQueries=4,
                     verificationHashType="GL", steps=[Step(9), Step(5)])
    setup = StarkSetup(const_pols, pil, ss)
    from eigen_zkvm_tpu.stark.vm import ProverContext

    ctx = ProverContext(setup.starkinfo, ss)
    widths = {name: ctx.sections[name].shape[1]
              for name in vm_native._SECTIONS}
    enc = vm_native._encode(setup.starkinfo, widths,
                            setup.program.step42ns, "2ns", 8, 9)
    assert enc is not None and enc.instrs.shape[0] > 0
