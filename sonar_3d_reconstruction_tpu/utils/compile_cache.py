"""Persistent XLA compilation cache setup.

Compiles of the big frame-update programs take minutes through this TPU
toolchain; the persistent cache turns warm-process startup into seconds
(measured 78.8 s -> 2.9 s for a representative scatter program).  Entry
points (bench, CLI, tests, driver hooks) call ``enable()`` explicitly —
importing the library does NOT set global config.

CPU-platform processes use a per-host subdirectory: XLA:CPU AOT
executables bake in the compile machine's CPU features, and loading an
entry produced by a DIFFERENT host warns about mismatched features and
can segfault outright (observed: a full-suite run crashed inside
``compilation_cache.get_executable_and_time`` deserializing an entry a
previous host had written).  TPU entries stay in the shared root — they
are compiled for the TPU target and host-independent.
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform


def _host_fingerprint() -> str:
    """Stable id of this host's CPU (see module docstring).

    Flags alone are NOT enough: XLA:CPU also bakes in model-derived
    tuning features (e.g. ``+prefer-no-scatter``) chosen from the CPU
    model, so two hosts with identical cpuinfo flag strings can still
    produce mutually unloadable AOT entries (observed: a feature-mismatch
    warning loading another host's entry from the flags-only dir).  Hash
    the identification fields too."""
    parts = []
    want = ("flags", "Features", "vendor_id", "cpu family", "model",
            "model name", "stepping", "CPU implementer", "CPU part")
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in want and key not in seen:
                    seen.add(key)
                    val = line.split(":", 1)[1].strip()
                    if key in ("flags", "Features"):
                        val = " ".join(sorted(val.split()))
                    parts.append(f"{key}={val}")
                if len(seen) == len(want):
                    break
    except OSError:
        pass
    raw = f"{_platform.machine()}|" + "|".join(sorted(parts))
    return hashlib.md5(raw.encode()).hexdigest()[:12]


def enable(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent)."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "SONAR3D_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
    # The EFFECTIVE backend decides (this initializes it, which every
    # entry point does moments later anyway): on the TPU host sitecustomize
    # pins "axon,cpu" and the tpu backend keeps hitting the shared root
    # cache (remote compiles cost minutes) — but if the tunnel fails to
    # initialize and jax falls back to cpu, or the platform is pinned to
    # cpu (tests), CPU AOT entries go to the per-host dir.
    try:
        on_cpu = jax.default_backend() == "cpu"
    except Exception:  # no backend at all: cache dir is moot, pick safe
        on_cpu = True
    if on_cpu:
        cache_dir = os.path.join(cache_dir, "cpu-" + _host_fingerprint())
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
