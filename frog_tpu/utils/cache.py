"""Persistent compilation cache setup.

Round-3 finding, root-caused in round 4: on this container a
sitecustomize hook imports jax at interpreter startup (to register the
axon TPU plugin), so ``JAX_COMPILATION_CACHE_DIR`` set from Python code
(os.environ in bench.py/CLI) is read *too late* — jax's config snapshot
already happened and the persistent cache silently never engages (no
cache dir is even created).  The fix is to set the config explicitly
after import; with that, cache write + fresh-process hit + executable
deserialization all work on the axon backend (verified: a jitted matmul
compiled in one process loads in 0.3 s in the next).

Call :func:`enable_compilation_cache` early in every entry point (bench,
CLI, server).  Compiles faster than jax's 1 s default threshold are not
persisted — only the expensive executables (which cost 20-800 s through
the remote compile service) matter.
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

DEFAULT_DIR = "/tmp/jax_comp_cache"


def enable_compilation_cache(path: str | None = None) -> str:
    """Explicitly enable jax's persistent compilation cache (the env-var
    route is dead on containers whose sitecustomize imports jax first).
    Returns the cache directory."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        return path  # ancient jax without the knob: no-op
    return path
