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


def test_poseidon_example_proves():
    """starkjs `poseidon` analog: one-round-per-row Poseidon AIR, digest
    publics match the engine permutation (reference poseidong.pil)."""
    from eigen_zkvm_tpu.examples import poseidon
    from eigen_zkvm_tpu.hash import poseidon_gl as pnp

    pil, cp, mk, ref = poseidon.build(6)
    rng = np.random.default_rng(11)
    inputs = [int(x) for x in rng.integers(
        0, 2**63, size=12, dtype=np.uint64) % np.uint64(pnp.gl.P_INT)]
    cm = mk(inputs)
    ss = StarkStruct(nBits=6, nBitsExt=7, nQueries=2,
                     verificationHashType="GL", steps=[Step(7), Step(3)])
    setup = StarkSetup(cp, pil, ss)
    proof = stark_gen(cm, cp, setup.const_tree, setup.starkinfo,
                      setup.program, ss)
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                        setup.program)
    names = [p.name for p in pil.publics]
    pubs = {n: int(proof.publics[i, 0]) for i, n in enumerate(names)}
    want = ref(inputs)
    assert [pubs[f"out{j}"] for j in range(4)] == want
    # the AIR's permutation == the production engines' permutation
    eng = pnp.permute(np.array([inputs[:8]], dtype=np.uint64),
                      np.array([inputs[8:]], dtype=np.uint64))[0]
    assert want == [int(x) for x in eng[:4]]
    # tampering a round output breaks the constraints
    cm.buffer[5, 3] ^= 1
    bad = stark_gen(cm, cp, setup.const_tree, setup.starkinfo,
                    setup.program, ss)
    assert not stark_verify(bad, setup.const_root, setup.starkinfo, ss,
                            setup.program)


def test_simple_vm_example_proves():
    """starkjs `simple_vm` analog: the MiniRV machine at toy size proving
    a branchy tape-folding program."""
    from eigen_zkvm_tpu.examples import simple_vm

    pil, cp, mk, ref, machine = simple_vm.build(10)
    tape = [6, 3, 250, 40, 99, 100, 7]
    cm = mk(tape)
    ss = StarkStruct(nBits=10, nBitsExt=11, nQueries=2,
                     verificationHashType="GL", steps=[Step(11), Step(5)])
    setup = StarkSetup(cp, pil, ss)
    proof = stark_gen(cm, cp, setup.const_tree, setup.starkinfo,
                      setup.program, ss)
    assert stark_verify(proof, setup.const_root, setup.starkinfo, ss,
                        setup.program)
    acc, cnt = ref(tape)
    names = [p.name for p in pil.publics]
    pubs = {n: int(proof.publics[i, 0]) for i, n in enumerate(names)}
    assert pubs.get("x2_out", pubs.get("x2")) == acc
