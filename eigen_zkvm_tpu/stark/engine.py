"""Prover engine selection: size-based auto-dispatch between the host
(numpy/AVX-512) and device (TPU) execution paths.

The reference has one engine (rayon CPU, starky/src/stark_gen.rs); here the
prover picks per proof:

 - `EIGEN_ZKVM_ENGINE=auto` (default): the device commit+VM+FRI path is used
   when an accelerator is attached and the extended domain is at least
   2^EIGEN_ZKVM_TPU_NBITS (default 18) — the measured crossover where the
   device beats one host core through the tunnel.  Below that, host kernels
   win (transfer + dispatch latency dominates).
 - `EIGEN_ZKVM_ENGINE=host` / `tpu`: force one path.
 - legacy per-subsystem flags still override when set explicitly:
   EIGEN_ZKVM_TPU_COMMIT / EIGEN_ZKVM_TPU_VM ("1" force-on, "0" force-off);
   tests use them to run the device executors on the CPU backend.

When BOTH commit and VM run on device the prover goes fully
device-resident: extended sections, Merkle node levels, the FRI fold chain
and query gathers all stay on the accelerator; only roots, evals and query
rows (KBs) cross the host link.
"""
from __future__ import annotations

import os


_probe_cache: bool | None = None


def _tunnel_alive(timeout_s: float = 75.0) -> bool:
    """Accelerator liveness probe in a SUBPROCESS with a hard timeout.

    With a remote (axon-tunnel) accelerator, a dead tunnel makes backend
    creation block forever inside jax.devices() — an exception handler
    never fires.  Probing in a child process bounds the risk: only if the
    child lists an accelerator device within the timeout does the parent
    ever touch the backend itself.  Cached per process (including failure:
    a dead tunnel stays dead for this prove's purposes)."""
    global _probe_cache
    if _probe_cache is None:
        import subprocess
        import sys

        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # child: whatever the plugin forces
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(int(any(d.platform in ('tpu','axon')"
                 " for d in jax.devices())))"],
                capture_output=True, text=True, timeout=timeout_s, env=env)
            _probe_cache = r.stdout.strip().endswith("1")
        except Exception:
            _probe_cache = False
    return _probe_cache


def _device_present() -> bool:
    try:
        import jax
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            return any(d.platform in ("tpu", "axon") for d in jax.devices())
        # backends not initialized yet: never risk a blocking first dial
        return _tunnel_alive() and any(
            d.platform in ("tpu", "axon") for d in jax.devices())
    except Exception:
        return False


def accel_active() -> bool:
    """True when jitted code will actually land on an accelerator (not a
    CPU-forced test context).  XLA:CPU pathologically slow-compiles some of
    the device-only kernels (gather-heavy iNTT graphs), so callers keep
    those host-side unless this holds."""
    try:
        import jax

        dd = jax.config.jax_default_device
        if dd is not None:
            return getattr(dd, "platform", "cpu") in ("tpu", "axon")
        return _device_present()
    except Exception:
        return False


def _flag(name: str) -> bool | None:
    v = os.environ.get(name)
    if v is None or v == "":
        return None
    return v not in ("0", "false", "off")


def auto_nbits() -> int:
    return int(os.environ.get("EIGEN_ZKVM_TPU_NBITS", "18"))


class Engine:
    """Resolved engine flags for one prove (nbits_ext = extended domain)."""

    def __init__(self, nbits_ext: int):
        mode = os.environ.get("EIGEN_ZKVM_ENGINE", "auto")
        if mode == "host":
            auto = False
        elif mode == "tpu":
            auto = True
        else:
            auto = nbits_ext >= auto_nbits() and _device_present()
        c, v = _flag("EIGEN_ZKVM_TPU_COMMIT"), _flag("EIGEN_ZKVM_TPU_VM")
        self.tpu_commit = auto if c is None else c
        self.tpu_vm = auto if v is None else v
        # fully device-resident prove: skip host materialization of the
        # extended sections; FRI folds and query gathers stay on device
        self.device_resident = self.tpu_commit and self.tpu_vm

    def __repr__(self):
        return (f"Engine(commit={'tpu' if self.tpu_commit else 'host'}, "
                f"vm={'tpu' if self.tpu_vm else 'host'}, "
                f"resident={self.device_resident})")
