"""Constraint simplification (circom --O1/--O2 parity,
dsl_compile/src/input_user.rs:55 get_simplification_style)."""
import copy

from eigen_zkvm_tpu.curves import bn254
from eigen_zkvm_tpu.dsl.elaborate import compile_circom
from eigen_zkvm_tpu.dsl.simplify import simplify
from eigen_zkvm_tpu.groth16.groth16 import prove, setup, verify

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


def _satisfied(b):
    P = b.P

    def ev(lc):
        return sum(b.w[s] * c for s, c in lc.items()) % P

    return all((ev(A) * ev(B) - ev(C)) % P == 0 for A, B, C in b.constraints)


def test_o2_shrinks_and_stays_satisfied():
    b = compile_circom(NUM2BITS, {"x": 0b10110101}, prime=bn254.R)
    nc0, nw0 = len(b.constraints), len(b.w)
    st = simplify(b, level=2)
    assert st["constraints_after"] < nc0
    assert st["signals_after"] < nw0
    assert _satisfied(b)
    assert b.check()
    # publics (the 8 output bits) survive in place
    assert [b.w[i + 1] for i in range(8)] == [1, 0, 1, 0, 1, 1, 0, 1]


def test_o1_removes_only_renames():
    b1 = compile_circom(NUM2BITS, {"x": 77}, prime=bn254.R)
    b2 = copy.deepcopy(b1)
    s1 = simplify(b1, level=1)
    s2 = simplify(b2, level=2)
    # O1 strictly between O0 and O2
    assert s1["constraints_after"] < s1["constraints_before"]
    assert s2["constraints_after"] <= s1["constraints_after"]
    assert _satisfied(b1) and _satisfied(b2)


def test_groth16_roundtrip_after_simplify():
    b = compile_circom(NUM2BITS, {"x": 201}, prime=bn254.R)
    simplify(b, level=2)
    pk, vk = setup(bn254, b.constraints, b.n_vars, b.n_publics)
    prf, pubs = prove(bn254, pk, b.constraints, b.w)
    assert verify(bn254, vk, prf, pubs)
    pubs_bad = list(pubs)
    pubs_bad[0] = (pubs_bad[0] + 1) % bn254.R
    assert not verify(bn254, vk, prf, pubs_bad)


def test_custom_gate_signals_protected():
    from eigen_zkvm_tpu.recursion.circuit import CircuitBuilder

    b = CircuitBuilder()
    x = b.public(5)
    y = b.wire(b.sig(7))
    z = b.wire(b.sig(35))
    b.assert_eq(z, b.mul(x, y))          # quadratic, stays
    w2 = b.wire(b.sig(7))
    b.assert_eq(w2, y)                   # rename — but w2 is gate-pinned
    b.custom_gates.append(("Dummy", [w2.sid() if hasattr(w2, "sid")
                                     else next(iter(w2.lc))]))
    gate_sig = b.custom_gates[0][1][0]
    val = b.w[gate_sig]
    simplify(b, level=2)
    g2 = b.custom_gates[0][1][0]
    assert b.w[g2] == val                # survived, value intact
    assert _satisfied(b)


def test_sym_table_names_and_simplify_remap(tmp_path):
    """.sym emission (dsl_compile compilation_user.rs sym output role):
    hierarchical names, witness ids, -1 for aliased/eliminated signals."""
    from eigen_zkvm_tpu.dsl.elaborate import write_sym

    b = compile_circom(NUM2BITS, {"x": 0b1010}, prime=bn254.R)
    names = {fq: sid for fq, sid, _ in b.sym}
    assert "main.x" in names and names["main.x"] >= 1
    assert "main.bits[0]" in names
    assert "main.n2b.out[7]" in names and "main.n2b.in" in names
    # subcomponent input is an alias of main.x -> no own witness signal
    assert names["main.n2b.in"] == -1 or \
        names["main.n2b.in"] == names["main.x"]
    simplify(b, level=2)
    names2 = dict((fq, sid) for fq, sid, _ in b.sym)
    # publics survive with the same positions; eliminated signals -> -1
    assert names2["main.bits[3]"] == names["main.bits[3]"]
    p = tmp_path / "c.sym"
    write_sym(b, str(p))
    lines = p.read_text().strip().splitlines()
    assert len(lines) == len(b.sym)
    assert lines[0].count(",") == 3
