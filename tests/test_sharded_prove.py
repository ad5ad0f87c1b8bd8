"""The full mesh-sharded prove (parallel/sharded_prove.py) must produce
proofs byte-identical to the host prover."""
import numpy as np
import pytest


def _chain_air(nbits: int, width: int):
    from eigen_zkvm_tpu.fields import gl64 as gl
    from eigen_zkvm_tpu.stark.pil_builder import PilBuilder
    from eigen_zkvm_tpu.stark.polsarray import PolsArray

    p = PilBuilder(nbits)
    islast = p.const_pol("Chain.ISLAST")
    cols = [p.cm_pol(f"Chain.c{j}") for j in range(width)]
    N = 1 << nbits
    one_m = p.sub(p.num(1), p.const(islast))
    for j, c in enumerate(cols):
        end = p.public_input(f"end{j}", p.cm(c), N - 1)
        p.identity(p.sub(p.mul(one_m, p.sub(p.cm(c, True),
                                            p.mul(p.num(j + 2), p.cm(c)))),
                         p.num(0)), "chain.pil", j)
        p.identity(p.sub(p.mul(p.const(islast), p.sub(p.cm(c), end)),
                         p.num(0)), "chain.pil", width + j)
    pil = p.build()
    const_pols = PolsArray(pil, PolsArray.CONSTANT)
    const_pols.buffer[N - 1, islast] = 1
    cm = PolsArray(pil, PolsArray.COMMIT)
    for j, c in enumerate(cols):
        ks = np.full(N, j + 2, dtype=np.uint64)
        ks[0] = 1
        cm.buffer[:, c] = gl.prefix_product(ks)
    return pil, const_pols, cm


@pytest.mark.slow
def test_sharded_prove_bit_exact():
    import jax
    from jax.sharding import Mesh

    from eigen_zkvm_tpu.parallel.sharded_prove import sharded_prove
    from eigen_zkvm_tpu.stark.serializer import stark_proof_to_json
    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.stark_verify import stark_verify
    from eigen_zkvm_tpu.stark.types import StarkStruct, Step

    NB, W = 7, 8
    pil, const_pols, cm = _chain_air(NB, W)
    ss = StarkStruct(nBits=NB, nBitsExt=NB + 1, nQueries=4,
                     verificationHashType="GL",
                     steps=[Step(NB + 1), Step(NB - 4)])
    setup = StarkSetup(const_pols, pil, ss)
    p_host = stark_gen(cm, const_pols, setup.const_tree, setup.starkinfo,
                       setup.program, ss)

    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest must expose 8 virtual CPU devices"
    mesh = Mesh(np.asarray(devs[:8]), ("model",))
    p_mesh = sharded_prove(cm, const_pols, setup, ss, mesh)

    assert stark_proof_to_json(p_host) == stark_proof_to_json(p_mesh)
    assert stark_verify(p_mesh, setup.const_root, setup.starkinfo, ss,
                        setup.program)
