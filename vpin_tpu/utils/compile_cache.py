"""Persistent XLA compilation cache management.

XLA compiles one executable per (computation, shape) pair; the limb-field
kernel zoo makes cold compiles the dominant cost of small runs.  The
persistent cache amortizes them across PROCESSES: the first run writes
serialized executables under .jax_cache/ (inside the repo, per the
sandbox contract), later runs load them in milliseconds.

Enable with enable_compilation_cache() (bench.py, __graft_entry__.py,
tests/conftest.py all call it); opt out with VPIN_COMPILE_CACHE=0.

Round-2 note: the cache was disabled because one executable crashed the
serializer.  That kernel zoo is gone — protocol-spine work moved to host
ints and the remaining device kernels (masked sumcheck rounds, scan-based
MSM bodies) serialize fine; if a machine still misbehaves, set
VPIN_COMPILE_CACHE=0.
"""

from __future__ import annotations

import hashlib
import os
import platform

_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def machine_tag() -> str:
    """Short digest of this machine's CPU feature set + jax version.

    XLA CPU AOT executables are compiled with the builder machine's CPU
    features baked in; loading them on a different machine type aborts
    the process uncatchably (SIGILL-class — XLA's own E0821 warning:
    "Compile machine features ... doesn't match ... could lead to
    execution errors such as SIGILL").  Keying the cache directory by a
    machine signature makes a stale cache from another machine simply
    invisible instead of fatal."""
    sig = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    sig.append(line.strip())
                    break
    except OSError:
        pass
    try:
        import jax
        sig.append(jax.__version__)
    except Exception:
        pass
    return hashlib.sha256("|".join(sig).encode()).hexdigest()[:12]


_DEFAULT_DIR = os.path.join(_CACHE_ROOT, machine_tag())


def enable_compilation_cache(cache_dir: str | None = None,
                             readonly: bool | None = None) -> bool:
    """Idempotent; returns True if the cache is active.

    readonly (or VPIN_COMPILE_CACHE_READONLY=1): load cached executables
    but never serialize new ones — the serializer hard-aborts (C++
    abort, no Python exception to catch) on rare CPU executables, which
    would kill an entire pytest run.  Interactive/bench/dryrun runs keep
    writes on and populate the cache for everyone else."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("VPIN_COMPILE_CACHE", "1") == "0":
        return False
    if readonly is None:
        readonly = os.environ.get("VPIN_COMPILE_CACHE_READONLY", "0") == "1"
    import jax
    d = cache_dir or os.environ.get("VPIN_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      1e30 if readonly else 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        # serializing XLA's internal (autotune/kernel) caches into cache
        # entries hard-aborts on some CPU executables (the round-2
        # "serializer segfault"); the executable cache alone is what we
        # want and it serializes fine
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass
    _enabled = True
    return True
