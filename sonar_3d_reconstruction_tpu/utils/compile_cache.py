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
    # Even flags+model collide in practice: this round a 1-core VM loaded
    # AOT entries some earlier multi-core host wrote (feature-mismatch
    # E-logs citing ``+prefer-no-scatter`` — an LLVM tuning pseudo-feature
    # derived from direct CPUID detection, invisible in /proc/cpuinfo).
    # Salt with per-machine identity: correctness beats cross-host reuse
    # for CPU entries (the warm-cache win that matters is same-machine
    # suite reruns; TPU entries stay shared and host-neutral).
    try:
        with open("/etc/machine-id") as f:
            parts.append("machine-id=" + f.read().strip())
    except OSError:
        pass
    # machine-id/hostname/ncpu can collide across this fleet's cloned VM
    # images, so the boot id joins the salt: the CPU dir becomes per-boot —
    # same-machine suite reruns (the warm-cache win that matters) keep
    # hitting; entries from dead hosts become unreachable.  TPU entries
    # stay in the shared host-neutral root.
    #
    # NOTE on the cpu_aot_loader E-logs citing +prefer-no-scatter /
    # +prefer-no-gather: measured (two processes, same host, same boot,
    # fresh dir) these fire even when loading entries THIS host wrote —
    # XLA records LLVM tuning pseudo-features in the entry but omits them
    # from its load-time host-detection list, a benign self-mismatch.  The
    # warning alone therefore does NOT prove foreign entries; the round-3
    # cross-host SEGFAULT (real ISA mismatch) is what this fingerprint
    # guards against.
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append("boot-id=" + f.read().strip())
    except OSError:
        pass
    parts.append(f"ncpu={os.cpu_count()}")
    parts.append("host=" + _platform.node())
    raw = f"{_platform.machine()}|" + "|".join(sorted(parts))
    return hashlib.md5(raw.encode()).hexdigest()[:12]


def _configured_platform() -> str:
    """First configured jax platform WITHOUT initializing any backend.

    Probing ``jax.default_backend()`` here cost round 3 both driver
    artifacts: it initializes the axon TPU backend, and when the tunneled
    chip is unreachable that init sleeps in an unbounded retry loop — at
    import time, before any entry point can force CPU or apply a deadline
    (VERDICT.md round 3).  The runtime config / env tell us the intent
    without touching a backend: tests and the multi-chip dryrun pin
    ``jax_platforms=cpu`` before calling ``enable()``; on the TPU host
    sitecustomize exports ``JAX_PLATFORMS=axon``.
    """
    try:
        import jax

        configured = jax.config.jax_platforms  # runtime update wins
    except Exception:
        configured = None
    if not configured:
        configured = os.environ.get("JAX_PLATFORMS", "")
    return configured.split(",")[0].strip().lower() if configured else ""


def _prune_stale_cpu_dirs(root: str, keep: str, max_age_s: float = 86400.0
                          ) -> None:
    """Best-effort removal of per-boot cpu-* cache dirs from dead hosts.

    The fingerprint is per-boot, so a dir other than ours whose latest
    write is older than ``max_age_s`` belongs to a machine that no longer
    exists (~100 MB each, one per round's host); anything recent is left
    alone out of caution.  Never touches the shared TPU entries."""
    import shutil
    import time

    try:
        names = os.listdir(root)
    except OSError:
        return
    now = time.time()
    for name in names:
        path = os.path.join(root, name)
        if not name.startswith("cpu-") or path == keep:
            continue
        try:
            if now - os.path.getmtime(path) > max_age_s:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def enable(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent).

    Never initializes a jax backend (see ``_configured_platform``) — safe
    to call before deciding/acquiring the device.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "SONAR3D_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
    # TPU processes hit the shared root (remote compiles cost minutes and
    # the executables are host-neutral); CPU processes — and, safely,
    # processes whose platform we cannot determine — use the per-host dir,
    # because XLA:CPU AOT executables bake in host CPU features and a
    # foreign entry can segfault on load (module docstring).
    platform = _configured_platform()
    if platform in ("", "cpu"):
        root = cache_dir
        cache_dir = os.path.join(root, "cpu-" + _host_fingerprint())
        _prune_stale_cpu_dirs(root, keep=cache_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


def guard_backend_mismatch() -> bool:
    """Disable the cache if a TPU-configured process actually got CPU.

    Call AFTER backend acquisition.  ``enable()`` picks the cache dir from
    the CONFIGURED platform (it must not initialize a backend); if the
    axon plugin init *raises* quickly (instead of the retry-hang) jax can
    fall back to the cpu backend, and host-specific XLA:CPU AOT entries
    would then be written into the shared TPU cache root — the cross-host
    SIGILL hazard the per-host cpu dirs exist to prevent.  Such a run is
    anomalous anyway (TPU-shaped invocation producing CPU numbers), so the
    persistent cache is simply switched off.  Returns True if it fired.
    """
    configured = _configured_platform()
    if configured in ("", "cpu"):
        return False
    import jax

    try:
        actual = jax.default_backend()
    except Exception:
        return False
    if actual == "cpu":
        jax.config.update("jax_enable_compilation_cache", False)
        return True
    return False
