"""File-level Groth16 API: setup / prove / verify / Solidity verifier.

JSON schema matches the reference (groth16/src/json_utils.rs): G1 points as
{"x","y"} decimal (or 0x-hex) strings, G2 points as {"x":[c0,c1],
"y":[c0,c1]}, verification key keys vk_alpha_1 / vk_beta_1 / vk_beta_2 /
vk_gamma_2 / vk_delta_1 / vk_delta_2 / IC, proof keys pi_a / pi_b / pi_c,
both carrying protocol="groth16" and the curve name.

The Solidity verifier is rendered from the same ZoKrates-derived template
as the reference (groth16/src/template.rs CONTRACT_TEMPLATE +
generate_verifier, api.rs:389-470).
"""
from __future__ import annotations

import json

from . import groth16 as core
from .groth16 import Proof, ProvingKey, VerifyingKey


def _curve(name: str):
    if name in ("BN128", "bn128", "BN254", "bn254"):
        from ..curves import bn254
        return bn254, "bn128"
    if name in ("BLS12381", "bls12381", "BLS12-381"):
        from ..curves import bls12_381
        return bls12_381, "bls12381"
    raise ValueError(f"unknown curve {name}")


def _s(x: int, to_hex: bool) -> str:
    return format(x, "#066x") if to_hex else str(x)


def _g1_json(pt, to_hex=False):
    if pt is None:
        return {"x": _s(0, to_hex), "y": _s(0, to_hex)}
    return {"x": _s(pt[0], to_hex), "y": _s(pt[1], to_hex)}


def _g2_json(pt, to_hex=False):
    if pt is None:
        return {"x": [_s(0, to_hex)] * 2, "y": [_s(0, to_hex)] * 2}
    return {"x": [_s(pt[0][0], to_hex), _s(pt[0][1], to_hex)],
            "y": [_s(pt[1][0], to_hex), _s(pt[1][1], to_hex)]}


def _num(s: str) -> int:
    return int(s, 16) if s.startswith("0x") or s.startswith("0X") else int(s)


def _g1_parse(d):
    x, y = _num(d["x"]), _num(d["y"])
    return None if x == y == 0 else (x, y)


def _g2_parse(d):
    x = (_num(d["x"][0]), _num(d["x"][1]))
    y = (_num(d["y"][0]), _num(d["y"][1]))
    return None if x == (0, 0) and y == (0, 0) else (x, y)


def vk_to_json(vk: VerifyingKey, to_hex=False) -> str:
    return json.dumps({
        "protocol": "groth16",
        "curve": vk.curve_name,
        "vk_alpha_1": _g1_json(vk.alpha1, to_hex),
        "vk_beta_2": _g2_json(vk.beta2, to_hex),
        "vk_gamma_2": _g2_json(vk.gamma2, to_hex),
        "vk_delta_2": _g2_json(vk.delta2, to_hex),
        "IC": [_g1_json(p, to_hex) for p in vk.ic],
    }, indent=1)


def vk_from_json(s: str) -> VerifyingKey:
    d = json.loads(s)
    return VerifyingKey(
        curve_name=d.get("curve", "bn128"),
        alpha1=_g1_parse(d["vk_alpha_1"]),
        beta2=_g2_parse(d["vk_beta_2"]),
        gamma2=_g2_parse(d["vk_gamma_2"]),
        delta2=_g2_parse(d["vk_delta_2"]),
        ic=[_g1_parse(p) for p in d["IC"]])


def proof_to_json(proof: Proof, curve_name: str, to_hex=False) -> str:
    return json.dumps({
        "pi_a": _g1_json(proof.a, to_hex),
        "pi_b": _g2_json(proof.b, to_hex),
        "pi_c": _g1_json(proof.c, to_hex),
        "protocol": "groth16",
        "curve": curve_name,
    }, indent=1)


def proof_from_json(s: str) -> Proof:
    d = json.loads(s)
    return Proof(a=_g1_parse(d["pi_a"]), b=_g2_parse(d["pi_b"]),
                 c=_g1_parse(d["pi_c"]))


def publics_to_json(publics) -> str:
    return json.dumps([str(int(x)) for x in publics])


def publics_from_json(s: str) -> list[int]:
    return [_num(x) for x in json.loads(s)]


# ---- in-memory entry points (reference: api.rs *_inplace variants) ----

def groth16_setup_inplace(curve_name: str, circuit):
    """circuit: recursion.circuit.CircuitBuilder over the curve's Fr."""
    curve, cname = _curve(curve_name)
    assert circuit.P == curve.R, "circuit field != curve scalar field"
    pk, vk = core.setup(curve, circuit.constraints, circuit.n_vars,
                        circuit.n_publics)
    return pk, vk


def groth16_prove_inplace(curve_name: str, circuit, pk: ProvingKey):
    curve, cname = _curve(curve_name)
    proof, publics = core.prove(curve, pk, circuit.constraints, circuit.w)
    return proof, publics


def groth16_verify_inplace(curve_name: str, vk: VerifyingKey, proof: Proof,
                           publics) -> bool:
    curve, _ = _curve(curve_name)
    return core.verify(curve, vk, proof, publics)


# ---- Solidity verifier (reference: api.rs generate_verifier) ----

_PAIRING_LIB = """\
// SPDX-License-Identifier: MIT
pragma solidity ^0.8.0;

library Pairing {
    struct G1Point {
        uint X;
        uint Y;
    }
    // Encoding of field elements is: X[0] * z + X[1]
    struct G2Point {
        uint[2] X;
        uint[2] Y;
    }
    /// @return the generator of G1
    function P1() pure internal returns (G1Point memory) {
        return G1Point(1, 2);
    }
    /// @return the negation of p, i.e. p.addition(p.negate()) should be zero.
    function negate(G1Point memory p) pure internal returns (G1Point memory) {
        uint q = 21888242871839275222246405745257275088696311157297823662689037894645226208583;
        if (p.X == 0 && p.Y == 0)
            return G1Point(0, 0);
        return G1Point(p.X, q - (p.Y % q));
    }
    /// @return r the sum of two points of G1
    function addition(G1Point memory p1, G1Point memory p2) internal view returns (G1Point memory r) {
        uint[4] memory input;
        input[0] = p1.X;
        input[1] = p1.Y;
        input[2] = p2.X;
        input[3] = p2.Y;
        bool success;
        assembly {
            success := staticcall(sub(gas(), 2000), 6, input, 0xc0, r, 0x60)
        }
        require(success);
    }
    /// @return r the product of a point on G1 and a scalar
    function scalar_mul(G1Point memory p, uint s) internal view returns (G1Point memory r) {
        uint[3] memory input;
        input[0] = p.X;
        input[1] = p.Y;
        input[2] = s;
        bool success;
        assembly {
            success := staticcall(sub(gas(), 2000), 7, input, 0x80, r, 0x60)
        }
        require (success);
    }
    /// @return the result of computing the pairing check
    function pairing(G1Point[] memory p1, G2Point[] memory p2) internal view returns (bool) {
        require(p1.length == p2.length);
        uint elements = p1.length;
        uint inputSize = elements * 6;
        uint[] memory input = new uint[](inputSize);
        for (uint i = 0; i < elements; i++)
        {
            input[i * 6 + 0] = p1[i].X;
            input[i * 6 + 1] = p1[i].Y;
            input[i * 6 + 2] = p2[i].X[1];
            input[i * 6 + 3] = p2[i].X[0];
            input[i * 6 + 4] = p2[i].Y[1];
            input[i * 6 + 5] = p2[i].Y[0];
        }
        uint[1] memory out;
        bool success;
        assembly {
            success := staticcall(sub(gas(), 2000), 8, add(input, 0x20), mul(inputSize, 0x20), out, 0x20)
        }
        require(success);
        return out[0] != 0;
    }
    /// Convenience method for a pairing check for four pairs.
    function pairingProd4(
            G1Point memory a1, G2Point memory a2,
            G1Point memory b1, G2Point memory b2,
            G1Point memory c1, G2Point memory c2,
            G1Point memory d1, G2Point memory d2
    ) internal view returns (bool) {
        G1Point[] memory p1 = new G1Point[](4);
        G2Point[] memory p2 = new G2Point[](4);
        p1[0] = a1;
        p1[1] = b1;
        p1[2] = c1;
        p1[3] = d1;
        p2[0] = a2;
        p2[1] = b2;
        p2[2] = c2;
        p2[3] = d2;
        return pairing(p1, p2);
    }
}
"""

_CONTRACT_TEMPLATE = """
contract Verifier {
    using Pairing for *;
    struct VerifyingKey {
        Pairing.G1Point alpha;
        Pairing.G2Point beta;
        Pairing.G2Point gamma;
        Pairing.G2Point delta;
        Pairing.G1Point[] gamma_abc;
    }
    struct Proof {
        Pairing.G1Point a;
        Pairing.G2Point b;
        Pairing.G1Point c;
    }
    function verifyingKey() pure internal returns (VerifyingKey memory vk) {
        vk.alpha = Pairing.G1Point(<%vk_alpha%>);
        vk.beta = Pairing.G2Point(<%vk_beta%>);
        vk.gamma = Pairing.G2Point(<%vk_gamma%>);
        vk.delta = Pairing.G2Point(<%vk_delta%>);
        vk.gamma_abc = new Pairing.G1Point[](<%vk_gamma_abc_length%>);
        <%vk_gamma_abc_pts%>
    }
    function verify(uint[] memory input, Proof memory proof) internal view returns (uint) {
        uint256 snark_scalar_field = 21888242871839275222246405745257275088548364400416034343698204186575808495617;
        VerifyingKey memory vk = verifyingKey();
        require(input.length + 1 == vk.gamma_abc.length);
        // Compute the linear combination vk_x
        Pairing.G1Point memory vk_x = Pairing.G1Point(0, 0);
        for (uint i = 0; i < input.length; i++) {
            require(input[i] < snark_scalar_field);
            vk_x = Pairing.addition(vk_x, Pairing.scalar_mul(vk.gamma_abc[i + 1], input[i]));
        }
        vk_x = Pairing.addition(vk_x, vk.gamma_abc[0]);
        if(!Pairing.pairingProd4(
             proof.a, proof.b,
             Pairing.negate(vk_x), vk.gamma,
             Pairing.negate(proof.c), vk.delta,
             Pairing.negate(vk.alpha), vk.beta)) return 1;
        return 0;
    }
    function verifyTx(
            Proof memory proof<%input_argument%>
        ) public view returns (bool r) {
        uint[] memory inputValues = new uint[](<%vk_input_length%>);
        <%input_loop%>
        if (verify(inputValues, proof) == 0) {
            return true;
        } else {
            return false;
        }
    }
}
"""


def generate_verifier_from_vk(vk: VerifyingKey) -> str:
    def g1s(p):
        return f"uint({p[0]}), uint({p[1]})"

    def g2s(p):
        return (f"[uint({p[0][0]}), uint({p[0][1]})], "
                f"[uint({p[1][0]}), uint({p[1][1]})]")

    text = _CONTRACT_TEMPLATE
    text = text.replace("<%vk_alpha%>", g1s(vk.alpha1))
    text = text.replace("<%vk_beta%>", g2s(vk.beta2))
    text = text.replace("<%vk_gamma%>", g2s(vk.gamma2))
    text = text.replace("<%vk_delta%>", g2s(vk.delta2))
    n = len(vk.ic)
    text = text.replace("<%vk_gamma_abc_length%>", str(n))
    text = text.replace("<%vk_input_length%>", str(n - 1))
    pts = "\n        ".join(
        f"vk.gamma_abc[{i}] = Pairing.G1Point({g1s(p)});"
        for i, p in enumerate(vk.ic))
    text = text.replace("<%vk_gamma_abc_pts%>", pts)
    if n > 1:
        text = text.replace("<%input_loop%>", """
        for(uint i = 0; i < input.length; i++){
            inputValues[i] = input[i];
        }""")
        text = text.replace("<%input_argument%>",
                            f", uint[{n - 1}] memory input")
    else:
        text = text.replace("<%input_loop%>", "")
        text = text.replace("<%input_argument%>", "")
    return _PAIRING_LIB + text


def generate_verifier(vk_file: str, sol_file: str):
    with open(vk_file) as f:
        vk = vk_from_json(f.read())
    with open(sol_file, "w") as f:
        f.write(generate_verifier_from_vk(vk))
