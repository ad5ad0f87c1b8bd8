"""circom front-end: parse + elaborate + prove the supported subset."""
import pytest

from eigen_zkvm_tpu.curves import bn254
from eigen_zkvm_tpu.dsl.elaborate import compile_circom
from eigen_zkvm_tpu.groth16.groth16 import prove, setup, verify

MULTIPLIER = r"""
pragma circom 2.0.0;
template Multiplier() {
    signal input a;
    signal input b;
    signal output c;
    c <== a*b;
}
component main = Multiplier();
"""

NUM2BITS = r"""
template Num2Bits(n) {
    signal input in;
    signal output out[n];
    var lc1=0;
    var e2=1;
    for (var i = 0; i<n; i++) {
        out[i] <-- (in >> i) & 1;
        out[i] * (out[i] -1 ) === 0;
        lc1 += out[i] * e2;
        e2 = e2+e2;
    }
    lc1 === in;
}
template Main() {
    signal input x;
    signal output bits[8];
    component n2b = Num2Bits(8);
    n2b.in <== x;
    for (var i=0; i<8; i++) { bits[i] <== n2b.out[i]; }
}
component main = Main();
"""

# the gl.circom _inv1 pattern: extended Euclid over a sub-prime modulus,
# running inside a bigger field (stark-circuits/circuits/gl.circom)
INV_FN = r"""
function inv(a, p) {
    var t = 0; var r = p; var newt = 1; var newr = a % p;
    while (newr != 0) {
        var q = r \ newr;
        var aux1 = newt; var aux2 = t - q*newt;
        t = aux1; newt = aux2;
        aux1 = newr; aux2 = r - q*newr;
        r = aux1; newr = aux2;
    }
    if (t < 0) { t = t + p; }
    return t;
}
template Inv() {
    signal input in;
    signal output out;
    var p = 0xFFFFFFFF00000001;
    out <-- inv(in, p);
    signal k <-- (in * out) \ p;
    in * out === k*p + 1;
}
component main = Inv();
"""


def test_multiplier_compiles_and_proves():
    b = compile_circom(MULTIPLIER, {"a": 3, "b": 11}, prime=bn254.R)
    assert b.check()
    assert b.n_publics == 1
    pk, vk = setup(bn254, b.constraints, b.n_vars, b.n_publics)
    pf, pubs = prove(bn254, pk, b.constraints, b.w)
    assert pubs == [33]
    assert verify(bn254, vk, pf, pubs)
    assert not verify(bn254, vk, pf, [34])


def test_num2bits_component_loops_lc():
    b = compile_circom(NUM2BITS, {"x": 0b10110101}, prime=bn254.R)
    assert b.check()
    bits = [b.w[i] for i in range(1, 9)]
    assert bits == [(0b10110101 >> i) & 1 for i in range(8)]
    # the constraint structure must not depend on the witness (the lc1
    # accumulator stays a linear expression, not a collapsed value)
    b2 = compile_circom(NUM2BITS, {"x": 77}, prime=bn254.R)
    assert b.constraints == b2.constraints
    pk, vk = setup(bn254, b.constraints, b.n_vars, b.n_publics)
    for bb in (b, b2):
        pf, pubs = prove(bn254, pk, bb.constraints, bb.w)
        assert verify(bn254, vk, pf, pubs)


def test_function_with_while_and_signed_ops():
    GL = 0xFFFFFFFF00000001
    for x in (12345, 987654321, 2):
        b = compile_circom(INV_FN, {"in": x}, prime=bn254.R)
        assert b.check()
        # output wire holds the GL inverse
        assert b.w[1] == pow(x, GL - 2, GL)


def test_bad_witness_rejected():
    b = compile_circom(MULTIPLIER, {"a": 3, "b": 11}, prime=bn254.R)
    b.w[1] = 34  # tamper the public output
    assert not b.check()


def test_compile_over_goldilocks_feeds_compressor():
    """circom-subset circuits over the GL prime drop into the compressor
    pipeline (the reference's compile -> compressor12 path)."""
    from eigen_zkvm_tpu.recursion.plonk_setup import PlonkSetup, exec_witness

    b = compile_circom(MULTIPLIER, {"a": 6, "b": 7})  # GL prime default
    ps = PlonkSetup(b)
    cm = exec_witness(b, ps)
    assert cm.buffer.shape[0] == 1 << ps.n_bits


CUSTOM_CMULADD = """
pragma circom 2.0.6;
pragma custom_templates;

template custom CMulAdd() {
    // GF(p^3) a*b + c; signal order matches plonk_setup's CMULADD layout
    signal input a[3];
    signal input b[3];
    signal input c[3];
    signal output out[3];
    var A = (a[0]+a[1]) * (b[0]+b[1]);
    var B = (a[0]+a[2]) * (b[0]+b[2]);
    var C = (a[1]+a[2]) * (b[1]+b[2]);
    var D = a[0]*b[0];
    var E = a[1]*b[1];
    var F = a[2]*b[2];
    out[0] <-- C + D - E - F + c[0];
    out[1] <-- A + C - 2*E - D + c[1];
    out[2] <-- B - D + E + c[2];
}

template Main() {
    signal input a[3];
    signal input b[3];
    signal input c[3];
    signal output out[3];
    component g = CMulAdd();
    for (var i = 0; i < 3; i++) {
        g.a[i] <== a[i];
        g.b[i] <== b[i];
        g.c[i] <== c[i];
    }
    for (var i = 0; i < 3; i++) {
        out[i] <== g.out[i];
    }
}

component main = Main();
"""


def test_custom_template_records_gate():
    """`template custom` bodies compute witness only; one gate use is
    recorded with the declared signals, and the compressor pipeline packs
    it like a native CMulAdd gate."""
    import numpy as np

    from eigen_zkvm_tpu.fields import f3g
    from eigen_zkvm_tpu.recursion.plonk_setup import PlonkSetup, exec_witness

    a, b_, c = (3, 4, 5), (7, 8, 9), (10, 11, 12)
    builder = compile_circom(
        CUSTOM_CMULADD,
        {"a": list(a), "b": list(b_), "c": list(c)})
    gates = [g for g in builder.custom_gates if g[0] == "CMulAdd"]
    assert len(gates) == 1 and len(gates[1 - 1][1]) == 12
    want = f3g.add(f3g.mul(np.array(a, dtype=np.uint64),
                           np.array(b_, dtype=np.uint64)),
                   np.array(c, dtype=np.uint64))
    got = [builder.w[s] for s in gates[0][1][9:12]]
    assert got == [int(x) for x in want]
    assert builder.check()

    ps = PlonkSetup(builder)
    cm = exec_witness(builder, ps)
    assert cm.buffer.shape[0] == 1 << ps.n_bits
