"""Test harness: force an 8-device virtual CPU mesh before jax imports.

Real-TPU benchmarking happens via bench.py; unit/integration tests run on
a virtual multi-device CPU platform so sharding paths are exercised
without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the limb-unrolled field kernels produce large
# HLO graphs that XLA-CPU is slow to compile; cache them across pytest runs.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
