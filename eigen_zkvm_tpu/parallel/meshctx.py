"""Mesh annotation layer for the device-resident prover.

The scaling recipe (How-to-Scale-Your-Model): pick a mesh, annotate stage
shardings with `with_sharding_constraint`, and let XLA's SPMD partitioner
insert the collectives.  The prover's stages want different layouts —

  NTT/LDE       sharded over POLYNOMIALS (row-axis butterflies local)
  Merkle/VM     sharded over ROWS (leaf hashes and column ops elementwise
                in rows; the next-row rotation becomes a collective-permute
                halo exchange XLA inserts automatically)
  FRI fold      sharded over GROUPS (the small group-axis iNTT local)

so each device kernel marks its preferred layout and one all_to_all rides
ICI at each phase switch (the fft_p.rs transpose analog).

Activation is explicit: `activate(mesh, axis)` sets the process-wide mesh,
and every jitted kernel that shards takes the mesh as a STATIC argument
(via `active()`), so traces with and without a mesh never collide in the
jit cache.
"""
from __future__ import annotations

import contextlib

from jax.sharding import NamedSharding, PartitionSpec as P

_ACTIVE = None   # (mesh, axis_name) | None


def active():
    """The (mesh, axis) pair kernels pass into their static args."""
    return _ACTIVE


@contextlib.contextmanager
def activate(mesh, axis: str = "model"):
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = (mesh, axis)
    try:
        yield
    finally:
        _ACTIVE = prev


def _constrain(x, ma, dim: int):
    """Shard dimension `dim` of array/pair x over the mesh axis."""
    if ma is None:
        return x
    import jax

    mesh, axis = ma

    def one(a):
        if a.ndim <= dim or a.shape[dim] % mesh.shape[axis]:
            return a
        spec = [None] * a.ndim
        spec[dim] = axis
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P(*spec)))

    if isinstance(x, tuple):
        return tuple(one(a) for a in x)
    return one(x)


def rows(x, ma):
    """Row-sharded layout (axis 0): Merkle leaves, VM columns."""
    return _constrain(x, ma, 0)


def cols(x, ma):
    """Polynomial-sharded layout (axis 1): NTT/LDE stages."""
    return _constrain(x, ma, 1)


def replicated(x, ma):
    if ma is None:
        return x
    import jax

    mesh, _ = ma

    def one(a):
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P(*([None] * a.ndim))))

    if isinstance(x, tuple):
        return tuple(one(a) for a in x)
    return one(x)
