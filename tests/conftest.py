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

# Persistent compilation cache: cold kernel compiles amortize across
# processes/runs (see vpin_tpu/utils/compile_cache.py).  The round-2
# serializer crash no longer reproduces after the kernel-zoo shrink;
# opt out with VPIN_COMPILE_CACHE=0 if a machine misbehaves.
from vpin_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
