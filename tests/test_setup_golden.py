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
