"""zkin JSON roundtrip: serialized proofs re-verify; joins follow reference shape."""
import json

from eigen_zkvm_tpu.stark.polsarray import PolsArray
from eigen_zkvm_tpu.stark.serializer import (join_zkin, stark_proof_from_json,
                                             stark_proof_to_json)
from eigen_zkvm_tpu.stark.stark_gen import stark_gen
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
from eigen_zkvm_tpu.stark.stark_verify import stark_verify
from eigen_zkvm_tpu.stark.types import load_pil, load_starkstruct

from conftest import reference_fixture


def _prove(pil_file, const_file, cm_file, struct_file="starkStruct.json.gl"):
    pil = load_pil(reference_fixture(pil_file))
    ss = load_starkstruct(reference_fixture(struct_file))
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(reference_fixture(const_file))
    cm_pols = PolsArray(pil, PolsArray.COMMIT).load(reference_fixture(cm_file))
    setup = StarkSetup(const_pols, pil, ss)
    proof = stark_gen(cm_pols, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, ss)
    return proof, setup, ss


def test_zkin_roundtrip_verifies():
    proof, setup, ss = _prove("fib.pil.json.gl", "fib.const.gl", "fib.cm.gl")
    s = stark_proof_to_json(proof, ss.verificationHashType)
    d = json.loads(s)
    # schema spot-checks (serializer.rs layout)
    assert set(["root1", "root2", "root3", "root4", "evals", "s0_vals1",
                "s0_siblings1", "s0_valsC", "s0_siblingsC", "finalPol",
                "publics", "rootC"]).issubset(d.keys())
    assert isinstance(d["root1"], list) and len(d["root1"]) == 4
    assert all(isinstance(x, str) for x in d["root1"])
    assert all(len(e) == 3 for e in d["evals"])
    # roundtrip must still verify
    proof2 = stark_proof_from_json(s)
    assert stark_verify(proof2, setup.const_root, setup.starkinfo, ss, setup.program)
    # and serialize identically
    assert stark_proof_to_json(proof2, ss.verificationHashType) == s


def test_zkin_tampered_rejected():
    proof, setup, ss = _prove("fib.pil.json.gl", "fib.const.gl", "fib.cm.gl")
    d = json.loads(stark_proof_to_json(proof, ss.verificationHashType))
    d["evals"][0][0] = str((int(d["evals"][0][0]) + 1) % (2**64 - 2**32 + 1))
    proof2 = stark_proof_from_json(json.dumps(d))
    assert not stark_verify(proof2, setup.const_root, setup.starkinfo, ss, setup.program)


def test_join_zkin_shape():
    z1 = {"root1": ["1"], "publics": ["1", "2", "3", "4", "5", "6"], "rootC": ["9"]}
    z2 = {"root1": ["2"], "publics": ["7"]}
    out = join_zkin(z1, z2)
    assert out["a_root1"] == ["1"] and out["b_root1"] == ["2"]
    assert out["publics"] == ["1", "2"]          # minus the last 4 (rootC limbs)
    assert out["rootC"] == ["9"]
    assert list(out.keys()) == sorted(out.keys())  # BTreeMap ordering
