"""Test harness: force an 8-device virtual CPU mesh.

Real-TPU benchmarking happens via bench.py; unit/integration tests run on
a virtual multi-device CPU platform so sharding paths are exercised
without TPU hardware.

NOTE: the environment pins JAX_PLATFORMS=axon (TPU tunnel) and a
sitecustomize may reassert it, so we must hard-override the env var AND
set the config after importing jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache, READ-ONLY under pytest: cache loads
# amortize compiles across runs, but entry serialization is disabled —
# it hard-aborts (C++ abort, uncatchable) on rare CPU executables and
# would kill the whole suite.  Populate the cache by running the
# workloads/dryrun outside pytest; override with
# VPIN_COMPILE_CACHE_READONLY=0 at your own risk.
from vpin_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(
    readonly=os.environ.get("VPIN_COMPILE_CACHE_READONLY", "1") == "1")
