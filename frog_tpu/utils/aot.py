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
_seen: set = set()


def _signature(fn, args, kwargs):
    """Hashable (function, arg-shapes) key: warming the same jitted
    callable twice at the same shapes is pure wasted device time (the
    executable is already in the process's jit cache), and repeat
    registrations (serve mode, benchmarks) hit this constantly."""
    def leaf_key(x):
        shape = getattr(x, "shape", None)
        if shape is not None:
            return (tuple(shape), str(getattr(x, "dtype", "")))
        try:
            hash(x)
            return x
        except TypeError:
            return repr(x)

    import jax

    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
    name = getattr(fn, "__qualname__", None) or repr(fn)
    mod = getattr(fn, "__module__", "")
    return (mod, name, treedef, tuple(leaf_key(x) for x in leaves))


def _get_pool() -> ThreadPoolExecutor:
    global _pool
    if _pool is None:
        _pool = ThreadPoolExecutor(max_workers=4, thread_name_prefix="frog-aot")
    return _pool


def warm(fn, *args, key=None, **kwargs) -> Future | None:
    """Run ``fn(*args, **kwargs)`` on a worker thread, ignore the result
    (and any failure).  Returns the future for tests.  Set FROG_AOT=0 to
    disable all warming (e.g. when the shared remote-compile service is
    contended and queueing extra work hurts more than it overlaps).

    Repeat calls with the same signature are skipped — the executable is
    already in the process's jit cache and the warm-up execution would
    just burn device time ahead of real work.  Closures whose captured
    shapes matter must pass an explicit ``key`` (a wrong skip only costs
    an inline compile, never correctness)."""
    import os

    if os.environ.get("FROG_AOT", "1") == "0":
        return None
    try:
        k = key if key is not None else _signature(fn, args, kwargs)
        if k in _seen:
            return None
        _seen.add(k)
    except Exception:  # noqa: BLE001 — unhashable exotic args: just warm
        pass

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
