"""Authored example circuits: golden equality with reference fixtures and
full prove/verify through the PIL authoring API."""
import json

import numpy as np
import pytest

from eigen_zkvm_tpu.cli import _pil_to_json
from eigen_zkvm_tpu.examples import connection, fibonacci, permutation, plookup
from eigen_zkvm_tpu.stark.stark_gen import stark_gen
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
from eigen_zkvm_tpu.stark.stark_verify import stark_verify
from eigen_zkvm_tpu.stark.types import StarkStruct, Step

from conftest import reference_fixture

SS = StarkStruct(nBits=10, nBitsExt=11, nQueries=3,
                 verificationHashType="GL", steps=[Step(11), Step(5)])


def test_fibonacci_golden_vs_reference_fixture():
    """The authored PIL, constants and trace are byte-identical with
    starky/data/fib.{pil.json.gl,const.gl,cm.gl} — proofs from the authoring
    path are bit-exact with the reference's."""
    pil, cp, mk = fibonacci.build(10)
    ref_pil = json.load(open(reference_fixture("fib.pil.json.gl")))
    assert json.dumps(_pil_to_json(pil), sort_keys=True) == \
        json.dumps(ref_pil, sort_keys=True)
    ref_cp = np.fromfile(reference_fixture("fib.const.gl"),
                         dtype="<u8").reshape(1024, 1)
    assert np.array_equal(cp.buffer, ref_cp)
    ref_cm = np.fromfile(reference_fixture("fib.cm.gl"),
                         dtype="<u8").reshape(1024, 2)
    cm = mk((int(ref_cm[0, 0]), int(ref_cm[0, 1])))
    assert np.array_equal(cm.buffer, ref_cm)


@pytest.mark.parametrize("mod", [fibonacci, plookup, permutation, connection])
def test_example_proves(mod):
    pil, cp, mk = mod.build(10)
    cm = mk()
    setup = StarkSetup(cp, pil, SS)
    pf = stark_gen(cm, cp, setup.const_tree, setup.starkinfo,
                   setup.program, SS)
    assert stark_verify(pf, setup.const_root, setup.starkinfo, SS,
                        setup.program)
