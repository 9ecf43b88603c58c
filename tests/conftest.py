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

# NOTE: the persistent compilation cache (jax_compilation_cache_dir) is
# deliberately NOT enabled: this jaxlib's executable serializer segfaults
# (put_executable_and_time) on some of our kernels.  Shape-canonicalizing
# padded ops (curve/padded.py) keep the in-process compile count low
# instead.
