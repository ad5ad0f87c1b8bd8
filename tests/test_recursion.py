"""Recursion layer: native verifier circuit + compressor12 pipeline."""
import numpy as np
import pytest

from eigen_zkvm_tpu.fields import gl64 as gl
from eigen_zkvm_tpu.stark.polsarray import PolsArray
from eigen_zkvm_tpu.stark.serializer import stark_proof_to_dict
from eigen_zkvm_tpu.stark.stark_gen import stark_gen
from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
from eigen_zkvm_tpu.stark.types import (StarkStruct, Step, load_pil,
                                        load_starkstruct, parse_pil_number)
from eigen_zkvm_tpu.recursion.circuit import CircuitBuilder, P, W
from eigen_zkvm_tpu.recursion.compressor12 import (StarkOption,
                                                   compressor12_setup,
                                                   prove_compressed,
                                                   read_exec_file,
                                                   write_exec_file)
from eigen_zkvm_tpu.recursion.plonk_setup import exec_witness

from conftest import reference_fixture


# ---------- builder / gadget units ----------

def test_builder_mul_inv_bits():
    b = CircuitBuilder()
    x = b.wire(b.sig(12345))
    y = b.wire(b.sig(99999))
    z = b.mul(x + y, y - W(k=3))
    assert b.val(z) == (12345 + 99999) * (99999 - 3) % P
    xi = b.inv(x)
    assert b.val(b.mul(x, xi)) == 1
    bits = b.bits(b.wire(b.sig(0xDEADBEEF12345678)), 64)
    assert sum(b.val(bit) << i for i, bit in enumerate(bits)) == 0xDEADBEEF12345678
    assert b.check()


def test_builder_f3_ops_match_field():
    from eigen_zkvm_tpu.fields import f3g
    rng = np.random.default_rng(7)
    b = CircuitBuilder()
    av = rng.integers(0, P, 3, dtype=np.uint64)
    bv = rng.integers(0, P, 3, dtype=np.uint64)
    a = tuple(b.wire(b.sig(int(x))) for x in av)
    bb = tuple(b.wire(b.sig(int(x))) for x in bv)
    prod = b.f3_mul(a, bb)
    assert np.array_equal(b.f3_val(prod), f3g.mul(av, bv))
    inv = b.f3_inv(a)
    assert np.array_equal(b.f3_val(inv), f3g.inv(av))
    assert b.check()


def test_poseidon_gadget_matches_hash():
    from eigen_zkvm_tpu.hash import poseidon_gl
    rng = np.random.default_rng(3)
    vals = [int(x) for x in rng.integers(0, P, 12, dtype=np.uint64)]
    b = CircuitBuilder()
    out = b.poseidon([b.sig(v) for v in vals])
    expect = poseidon_gl.permute(
        np.array(vals[:8], dtype=np.uint64)[None, :],
        np.array(vals[8:], dtype=np.uint64)[None, :])[0]
    assert [b.w[s] for s in out] == [int(x) for x in expect]
    assert b.check()


# ---------- full c12 layer ----------

@pytest.fixture(scope="module")
def fib_proof():
    pil = load_pil(reference_fixture("fib.pil.json.gl"))
    ss = load_starkstruct(reference_fixture("starkStruct.json.gl"))
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(
        reference_fixture("fib.const.gl"))
    cm_pols = PolsArray(pil, PolsArray.COMMIT).load(
        reference_fixture("fib.cm.gl"))
    setup = StarkSetup(const_pols, pil, ss)
    proof = stark_gen(cm_pols, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, ss)
    return proof, setup, ss


def _check_pil_identities(pil, const_pols, cm_pols, n_bits):
    cbuf, mbuf = const_pols.buffer, cm_pols.buffer
    N = 1 << n_bits
    pubvals = {p.id: int(mbuf[p.idx, p.polId]) for p in pil.publics}
    cache = {}

    def roll(col, nxt):
        return np.roll(col, -1) if nxt else col

    def ev(i):
        if i not in cache:
            cache[i] = ev_e(pil.expressions[i])
        return cache[i]

    def ev_e(e):
        if e.op == "cm":
            return roll(mbuf[:, e.id], e.next)
        if e.op == "const":
            return roll(cbuf[:, e.id], e.next)
        if e.op == "exp":
            return roll(ev(e.id), e.next)
        if e.op == "public":
            return np.full(N, pubvals[e.id], dtype=np.uint64)
        if e.op == "number":
            return np.full(N, parse_pil_number(e.value), dtype=np.uint64)
        if e.op == "add":
            return gl.add(ev_e(e.values[0]), ev_e(e.values[1]))
        if e.op == "sub":
            return gl.sub(ev_e(e.values[0]), ev_e(e.values[1]))
        if e.op == "mul":
            return gl.mul(ev_e(e.values[0]), ev_e(e.values[1]))
        raise ValueError(e.op)

    for pi in pil.polIdentities:
        assert not np.any(ev(pi.e)), f"identity {pi.e} violated"


def test_c12_circuit_and_trace(fib_proof):
    proof, setup, ss = fib_proof
    zkin = stark_proof_to_dict(proof, "GL")
    circuit, psetup = compressor12_setup(zkin, setup, ss,
                                         StarkOption(skip_main=True))
    assert circuit.check()
    assert circuit.n_publics == len(zkin["publics"])
    cm = exec_witness(circuit, psetup)
    _check_pil_identities(psetup.pil, psetup.const_pols, cm, psetup.n_bits)
    # tampered witness must break the trace identities
    bad = CircuitBuilder()
    bad.w = list(circuit.w)
    bad.w[1] = (bad.w[1] + 1) % P
    bad.constraints = circuit.constraints
    bad.custom_gates = circuit.custom_gates
    assert not bad.check()


def test_exec_file_roundtrip(tmp_path, fib_proof):
    proof, setup, ss = fib_proof
    zkin = stark_proof_to_dict(proof, "GL")
    _, psetup = compressor12_setup(zkin, setup, ss, StarkOption(skip_main=True))
    path = str(tmp_path / "fib.exec")
    write_exec_file(path, psetup)
    adds, s_map = read_exec_file(path)
    assert adds.shape == (len(psetup.plonk_additions), 4)
    assert np.array_equal(s_map, psetup.s_map)


def test_c12_layer_prove_small(fib_proof):
    """Full recursion layer on a reduced config: base proof with fewer
    queries -> smaller verifier circuit -> provable c12 trace."""
    pil = load_pil(reference_fixture("fib.pil.json.gl"))
    small = StarkStruct(nBits=10, nBitsExt=11, nQueries=3,
                        verificationHashType="GL",
                        steps=[Step(11), Step(5)])
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(
        reference_fixture("fib.const.gl"))
    cm_pols = PolsArray(pil, PolsArray.COMMIT).load(
        reference_fixture("fib.cm.gl"))
    setup = StarkSetup(const_pols, pil, small)
    proof = stark_gen(cm_pols, const_pols, setup.const_tree, setup.starkinfo,
                      setup.program, small)
    zkin = stark_proof_to_dict(proof, "GL")
    c12_proof, (c12_setup, c12_ss, psetup) = prove_compressed(
        zkin, setup, small, StarkOption(skip_main=True))
    assert int(c12_proof.publics[0, 0]) == int(zkin["publics"][0])


@pytest.mark.slow
def test_aggregation_tree_four_proofs(fib_proof):
    """Fold four recursive1 proofs through one shared aggregation circuit
    (reference: test/stark_aggregation.sh pairwise loop)."""
    from eigen_zkvm_tpu.recursion.aggregation import aggregate_recursive1

    pil = load_pil(reference_fixture("fib.pil.json.gl"))
    Q = 2
    base_ss = StarkStruct(nBits=10, nBitsExt=11, nQueries=Q,
                          verificationHashType="GL",
                          steps=[Step(11), Step(5)])
    cp = PolsArray(pil, PolsArray.CONSTANT).load(
        reference_fixture("fib.const.gl"))
    cm = PolsArray(pil, PolsArray.COMMIT).load(
        reference_fixture("fib.cm.gl"))
    setup0 = StarkSetup(cp, pil, base_ss)
    p0 = stark_gen(cm, cp, setup0.const_tree, setup0.starkinfo,
                   setup0.program, base_ss)
    zkin0 = stark_proof_to_dict(p0, "GL")
    p1, (s1, ss1, _) = prove_compressed(
        zkin0, setup0, base_ss, StarkOption(skip_main=True), n_queries=Q)
    zkin1 = stark_proof_to_dict(p1, "GL")
    p2, (s2, ss2, ps2) = prove_compressed(
        zkin1, s1, ss1, StarkOption(), n_queries=Q, force_n_bits=15)
    zkin2 = stark_proof_to_dict(p2, "GL")
    final_zkin, (agg_setup, agg_ss, agg_ps) = aggregate_recursive1(
        [zkin2] * 4, s2, ss2, force_n_bits=15, n_queries=Q)
    # base public survives through every fold
    assert final_zkin["publics"][0] == zkin0["publics"][0]
