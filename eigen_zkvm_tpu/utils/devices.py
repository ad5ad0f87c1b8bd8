"""Device selection helpers.

The environment may expose a remote TPU plugin that ignores JAX_PLATFORMS,
so "run on CPU" must be requested per-computation via default_device /
explicit device placement rather than env vars.
"""
from __future__ import annotations

import contextlib

import jax


def cpu_devices():
    return jax.devices("cpu")


def tpu_devices():
    try:
        return [d for d in jax.devices() if d.platform != "cpu"]
    except RuntimeError:
        return []


def compute_device(prefer: str = "tpu"):
    if prefer == "tpu":
        tpus = tpu_devices()
        if tpus:
            return tpus[0]
    return cpu_devices()[0]


@contextlib.contextmanager
def on_cpu():
    with jax.default_device(cpu_devices()[0]):
        yield
