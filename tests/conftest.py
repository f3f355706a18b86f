"""Test configuration: run everything on a virtual 8-device CPU mesh.

Two things must happen before JAX's backends initialize:

* Force the cpu platform with 8 virtual devices so multi-chip sharding
  tests run without TPU hardware.
* Drop the axon TPU PJRT plugin (registered by a sitecustomize hook) from
  the backend factory table: merely having it registered stalls JAX's first
  operation by ~2 minutes (remote TPU claim over a relay) even for
  CPU-only runs.

Note: jax may already be imported by the time this conftest runs (pytest
plugin entry points), so ``jax.config.update`` is used rather than env vars.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

from jax._src import xla_bridge as _xb  # noqa: E402

# Drop only the axon remote-TPU factory: its presence stalls first use by
# ~2 minutes.  The plain 'tpu' factory must STAY registered — pallas/
# checkify imports require 'tpu' to be a known MLIR platform — and it
# never initializes under jax_platforms=cpu.
_xb._backend_factories.pop("axon", None)
