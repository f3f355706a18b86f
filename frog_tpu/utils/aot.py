"""Background compile warming.

XLA compilation on this platform goes through a (remote) compile service
and costs tens of seconds per executable; the inline path pays them
serially.  ``warm`` fires a jitted callable on a worker thread with
throwaway inputs so its executable lands in the jit cache (and the
persistent compilation cache) while the device crunches earlier pipeline
stages — stage scans take a dynamic ``n_live`` exactly so a warming call
with ``n_live=0`` compiles the real executable while executing nothing.

JAX tracing/compilation is thread-safe and releases the dispatch lock
around the XLA compile, so several stage compiles proceed in parallel.
Failures are swallowed: a mispredicted shape just means the inline path
compiles as usual.
"""
from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor

__all__ = ["warm", "drain"]

_pool: ThreadPoolExecutor | None = None
_pending: list = []


def _get_pool() -> ThreadPoolExecutor:
    global _pool
    if _pool is None:
        _pool = ThreadPoolExecutor(max_workers=4, thread_name_prefix="frog-aot")
    return _pool


def warm(fn, *args, **kwargs) -> Future | None:
    """Run ``fn(*args, **kwargs)`` on a worker thread, ignore the result
    (and any failure).  Returns the future for tests.  Set FROG_AOT=0 to
    disable all warming (e.g. when the shared remote-compile service is
    contended and queueing extra work hurts more than it overlaps)."""
    import os

    if os.environ.get("FROG_AOT", "1") == "0":
        return None

    def task():
        try:
            import jax

            jax.block_until_ready(fn(*args, **kwargs))
        except Exception:  # noqa: BLE001 — warming is best-effort
            pass

    f = _get_pool().submit(task)
    _pending.append(f)
    if len(_pending) > 64:
        del _pending[:32]
    return f


def drain() -> None:
    """Wait for all outstanding warming tasks (tests / clean shutdown)."""
    for f in list(_pending):
        try:
            f.result()
        except Exception:  # noqa: BLE001
            pass
    _pending.clear()
