"""Structured tracing/profiling utilities.

The reference has only coarse wall-clock prints (SURVEY.md §5); here every
pipeline stage records into a ``Timings`` registry, and setting
``FROG_TPU_PROFILE=<dir>`` captures a ``jax.profiler`` trace of the device
work (viewable in TensorBoard/Perfetto).
"""
from __future__ import annotations

import contextlib
import json
import os
import time

__all__ = ["Timings", "stage", "maybe_device_trace"]


class Timings:
    def __init__(self):
        self.records: list = []

    def add(self, name: str, seconds: float, **extra):
        self.records.append({"stage": name, "seconds": seconds, **extra})

    def summary(self) -> dict:
        out: dict = {}
        for r in self.records:
            out[r["stage"]] = out.get(r["stage"], 0.0) + r["seconds"]
        return out

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump({"records": self.records, "summary": self.summary()}, f)

    def report(self) -> str:
        return ", ".join(f"{k} {v:.2f}s" for k, v in self.summary().items())


GLOBAL_TIMINGS = Timings()


@contextlib.contextmanager
def stage(name: str, timings: Timings | None = None, **extra):
    t0 = time.time()
    try:
        yield
    finally:
        (timings or GLOBAL_TIMINGS).add(name, time.time() - t0, **extra)


@contextlib.contextmanager
def maybe_device_trace():
    """Wrap a region in a jax.profiler trace when FROG_TPU_PROFILE is set."""
    trace_dir = os.environ.get("FROG_TPU_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
