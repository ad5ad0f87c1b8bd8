"""Full mesh-sharded eSTARK prove — every device stage of the prover
(LDE, Merkle levels, constraint VM, quotient split, evals, FRI folds and
fold commits) partitioned over a jax.sharding.Mesh.

This is the whole-prover scale-out the reference lacks (rayon row-chunking
in stark_gen.rs:786-963 / fft_p.rs:226-355 is single-host): the
device-resident engine's kernels each carry stage-appropriate sharding
constraints (parallel/meshctx.py) and XLA's SPMD partitioner inserts the
ICI collectives — pol-sharded NTT, one all_to_all into row-sharded
hashing/VM, collective-permute halos for next-row rotations, group-sharded
FRI folds.

Proofs are BIT-IDENTICAL to the single-device and host provers (asserted in
tests/test_sharded_prove.py on an 8-device CPU mesh and by
__graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import os
from contextlib import contextmanager

from . import meshctx


@contextmanager
def _force_resident():
    prev = os.environ.get("EIGEN_ZKVM_ENGINE")
    os.environ["EIGEN_ZKVM_ENGINE"] = "tpu"
    try:
        yield
    finally:
        if prev is None:
            os.environ.pop("EIGEN_ZKVM_ENGINE", None)
        else:
            os.environ["EIGEN_ZKVM_ENGINE"] = prev


def sharded_prove(cm_pols, const_pols, setup, stark_struct, mesh,
                  axis: str = "model", prover_addr: str = ""):
    """Prove with every device stage sharded over `mesh` along `axis`.

    The const tree must come from the same engine family; `setup` is a
    stark_setup.StarkSetup (its const tree is re-committed on the mesh when
    it was host-built so query gathers stay device-resident)."""
    from ..stark.stark_gen import stark_gen

    with meshctx.activate(mesh, axis), _force_resident():
        setup_tree = setup.const_tree
        if not hasattr(setup_tree, "_elem_pair") and setup.starkinfo.n_constants:
            from ..ops import commit_tpu

            setup_tree = commit_tpu.tpu_extend_and_merkelize(
                const_pols.buffer, stark_struct.nBits, stark_struct.nBitsExt)
        return stark_gen(cm_pols, const_pols, setup_tree, setup.starkinfo,
                         setup.program, stark_struct,
                         prover_addr=prover_addr)
