"""CLI `compile` command: .r1cs/.wtns/.sym emission + -O levels
(zkit/src/main.rs:232 compile subcommand parity)."""
import json
import subprocess
import sys

SRC = r"""
pragma circom 2.0.0;
template Pythag() {
    signal input a;
    signal input b;
    signal output c2;
    signal a2;
    signal b2;
    a2 <== a*a;
    b2 <== b*b;
    c2 <== a2 + b2;
}
component main = Pythag();
"""


def _run(tmp_path, opt):
    circ = tmp_path / "py.circom"
    circ.write_text(SRC)
    inp = tmp_path / "in.json"
    inp.write_text(json.dumps({"a": 3, "b": 4}))
    out = tmp_path / f"out{opt}"
    r = subprocess.run(
        [sys.executable, "-m", "eigen_zkvm_tpu.cli", "compile",
         "-i", str(circ), "--input", str(inp), "-o", str(out),
         "-O", str(opt), "-p", "bn128"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    return out, r.stdout


def test_cli_compile_artifacts_and_opt(tmp_path):
    out0, log0 = _run(tmp_path, 0)
    out2, log2 = _run(tmp_path, 2)
    for base in (out0, out2):
        for ext in (".r1cs", ".wtns", ".sym"):
            assert base.with_suffix(ext).exists(), ext
    # O2 must not report more constraints than O0
    import re

    def ncons(log):
        return int(re.search(r"\((\d+) constraints", log).group(1))

    assert ncons(log2) <= ncons(log0)
    # the .r1cs parses back and the witness satisfies it
    from eigen_zkvm_tpu.algebraic.r1cs_file import load_r1cs
    from eigen_zkvm_tpu.algebraic.witness import load_witness

    r1cs = load_r1cs(str(out2) + ".r1cs")
    w = load_witness(str(out2) + ".wtns")
    P = r1cs.prime

    def ev(lc):
        return sum(int(w[s]) * c for s, c in lc.items()) % P

    for A, B, C in r1cs.constraints:
        assert (ev(A) * ev(B) - ev(C)) % P == 0
    # 3-4-5: public output c2 = 25
    assert int(w[1]) == 25
    sym = (tmp_path / "out2.sym").read_text()
    assert "main.c2" in sym and "main.a2" in sym


PARAM_CUSTOM = r"""
pragma circom 2.0.6;
pragma custom_templates;

template custom Scale(k) {
    signal input x;
    signal output y;
    y <-- k * x;
}

template Main() {
    signal input a;
    signal output out;
    signal mid;
    component g = Scale(5);
    g.x <== a + 1;
    mid <== g.y;
    out <== mid + 2;
}

component main = Main();
"""


def test_cli_compile_o2_parameterized_custom_gate(tmp_path):
    """-O2 over a parameterized `template custom` (3-tuple custom_gates
    entry: name, sigs, args) must not crash and must keep the gate's
    signals + args intact through witness compaction."""
    circ = tmp_path / "pc.circom"
    circ.write_text(PARAM_CUSTOM)
    inp = tmp_path / "in.json"
    inp.write_text(json.dumps({"a": 3}))
    out = tmp_path / "outpc"
    r = subprocess.run(
        [sys.executable, "-m", "eigen_zkvm_tpu.cli", "compile",
         "-i", str(circ), "--input", str(inp), "-o", str(out),
         "-O", "2", "-p", "goldilocks"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    # direct API check: args survive simplify, remapped signals are live
    from eigen_zkvm_tpu.dsl.elaborate import compile_circom
    from eigen_zkvm_tpu.dsl.simplify import simplify

    b = compile_circom(PARAM_CUSTOM, {"a": 3})
    simplify(b, level=2)
    (name, sigs, args), = b.custom_gates
    assert name == "Scale" and args == (5,)
    for s in sigs:
        assert 0 <= s < len(b.w)
    # the gate's witness relation still holds after compaction: y = 5*x
    x, y = (int(b.w[s]) for s in sigs)
    assert y == (5 * x) % b.P
