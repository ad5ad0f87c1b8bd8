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


def enabled() -> bool:
    return bool(os.environ.get("EIGEN_ZKVM_PROFILE"))


class Prof:
    __slots__ = ("name", "on", "t0", "last")

    def __init__(self, name: str):
        self.name = name
        self.on = enabled()
        if self.on:
            self.t0 = self.last = time.perf_counter()

    def tick(self, stage: str):
        if not self.on:
            return
        now = time.perf_counter()
        print(f"[profile] {self.name}: {stage}: {now - self.last:.3f}s",
              flush=True)
        self.last = now

    def done(self):
        if not self.on:
            return
        now = time.perf_counter()
        print(f"[profile] {self.name}: TOTAL {now - self.t0:.3f}s",
              flush=True)
