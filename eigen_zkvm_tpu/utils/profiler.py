"""Per-stage wall-clock tracing — the native analog of the reference's
`#[time_profiler]` proc-macro on every pipeline stage (reference:
starky/src/stark_gen.rs:192+, prove.rs:29, fri.rs:83, gated by
`--features profiler`).

Enable with EIGEN_ZKVM_PROFILE=1.  Zero overhead when disabled: `tick`
short-circuits on one attribute check, no timestamps are taken.

    prof = Prof("stark_gen")
    ...stage 1 work...
    prof.tick("stage1 commit")
    ...stage 2 work...
    prof.tick("stage2 h1h2")
    prof.done()
"""
from __future__ import annotations

import os
import time

from . import structlog


def enabled() -> bool:
    return bool(os.environ.get("EIGEN_ZKVM_PROFILE"))


def _device_mem() -> str:
    """' hbm=used/peak GB' for the default device (EIGEN_ZKVM_MEMLOG=1);
    empty when the backend has no memory_stats."""
    try:
        import jax

        st = jax.local_devices()[0].memory_stats() or {}
        used = st.get("bytes_in_use", 0)
        peak = st.get("peak_bytes_in_use", 0)
        return f" hbm={used / 1e9:.2f}/{peak / 1e9:.2f}GB"
    except Exception:
        return ""


def sync_enabled() -> bool:
    """EIGEN_ZKVM_SYNC=1: drain async device work at every stage tick so
    per-stage walls attribute device time to the stage that enqueued it
    (jax dispatch is async — without this, a slow device stage shows up as
    a mysteriously slow LATER stage at the first blocking download)."""
    return bool(os.environ.get("EIGEN_ZKVM_SYNC"))


class Prof:
    """Stage ticks print with EIGEN_ZKVM_PROFILE=1 and/or emit structured
    JSON-lines records with EIGEN_ZKVM_LOG (utils/structlog.py)."""

    __slots__ = ("name", "on", "pr", "t0", "last", "sync")

    def __init__(self, name: str):
        self.name = name
        self.pr = enabled()
        self.on = self.pr or structlog.enabled()
        self.sync = None  # callers install a device-drain (sync_enabled())
        if self.on:
            self.t0 = self.last = time.perf_counter()

    def tick(self, stage: str):
        if not self.on:
            return
        if self.sync is not None:
            self.sync()
        now = time.perf_counter()
        mem = _device_mem() if os.environ.get("EIGEN_ZKVM_MEMLOG") else ""
        if self.pr:
            print(f"[profile] {self.name}: {stage}: "
                  f"{now - self.last:.3f}s{mem}", flush=True)
        structlog.log_event(f"{self.name}.stage", stage=stage,
                            wall=round(now - self.last, 4))
        self.last = now

    def done(self):
        if not self.on:
            return
        now = time.perf_counter()
        if self.pr:
            print(f"[profile] {self.name}: TOTAL {now - self.t0:.3f}s",
                  flush=True)
        structlog.log_event(f"{self.name}.total",
                            wall=round(now - self.t0, 4))
