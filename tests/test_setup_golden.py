"""End-to-end commitment chain vs the reference's golden fixtures."""
import numpy as np
import pytest

from eigen_zkvm_tpu.hash.merkle_gl import MerkleTreeGL
from eigen_zkvm_tpu.poly import ntt
from eigen_zkvm_tpu.stark.polsarray import PolsArray
from eigen_zkvm_tpu.stark.types import load_pil, load_starkstruct

from conftest import reference_fixture


def test_fib_gl_const_root_golden():
    """Must equal the root hardcoded in the reference's stark_setup test
    (starky/src/stark_setup.rs test_stark_setup_gl)."""
    pil = load_pil(reference_fixture("fib.pil.json.gl"))
    ss = load_starkstruct(reference_fixture("starkStruct.json.gl"))
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(reference_fixture("fib.const.gl"))
    lde = ntt.interpolate(const_pols.buffer, ss.nBits, ss.nBitsExt)
    tree = MerkleTreeGL().merkelize(lde, const_pols.nPols, 1 << ss.nBitsExt)
    assert [int(x) for x in tree.root()] == [
        15302509084042343527, 985081440042889555, 14692153289195851822, 1611894784155222896]


def test_setup_checkpoint_roundtrip(tmp_path):
    """save/load must reproduce a setup that proves + verifies
    (reference stark_setup.rs serde checkpoint parity)."""
    from eigen_zkvm_tpu.stark.polsarray import PolsArray
    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.stark_verify import stark_verify
    from eigen_zkvm_tpu.stark.types import load_pil, load_starkstruct
    import numpy as np

    pil = load_pil(reference_fixture("fib.pil.json.gl"))
    ss = load_starkstruct(reference_fixture("starkStruct.json.gl"))
    cp = PolsArray(pil, PolsArray.CONSTANT).load(reference_fixture("fib.const.gl"))
    cm = PolsArray(pil, PolsArray.COMMIT).load(reference_fixture("fib.cm.gl"))
    setup = StarkSetup(cp, pil, ss)
    path = str(tmp_path / "setup.bin")
    setup.save(path)
    loaded = StarkSetup.load(path)
    assert np.array_equal(loaded.const_root, setup.const_root)
    proof = stark_gen(cm, cp, loaded.const_tree, loaded.starkinfo,
                      loaded.program, ss)
    assert stark_verify(proof, loaded.const_root, loaded.starkinfo, ss,
                        loaded.program)
