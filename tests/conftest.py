"""Test configuration: virtual 8-device CPU mesh + float64 parity mode.

All tests run on CPU (JAX_PLATFORMS=cpu) with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware, and with x64 enabled so the device
path can be compared against the float64 NumPy golden oracle at the 1e-5
parity bar (it lands far below it).
"""

import os

# NOTE: a sitecustomize module may import jax at interpreter startup (pinning
# the platform via env), so env vars alone are too late here — the runtime
# config updates below are authoritative.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from sonar_3d_reconstruction_tpu.utils.compile_cache import enable  # noqa: E402

enable()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from sonar_3d_reconstruction_tpu.config import MapperConfig  # noqa: E402


_PYTEST_MARKER = "/tmp/pytest_running"


def _live_marker_pids(lines):
    """Numeric pids from marker lines whose process still exists."""
    pids = []
    for ln in lines:
        ln = ln.strip()
        if not ln.isdigit():
            continue
        try:
            os.kill(int(ln), 0)
        except ProcessLookupError:
            continue  # dead: drop the stale line
        except OSError:
            pass  # alive but not ours (EPERM): keep it
        pids.append(ln)
    return pids


def pytest_sessionstart(session):
    """Publish a liveness marker for scripts/tpu_poll_and_run.sh.

    On the 1-core TPU hosts a concurrently running suite would skew the
    TPU session's host-side wall times, so the launcher waits while this
    marker names a LIVE pid.  One pid per line: a plain overwrite would
    lose the first suite's pid when two run concurrently, letting the
    launcher start mid-suite; dead pids (crashed pytest) are pruned here
    and ignored by the launcher."""
    try:
        try:
            with open(_PYTEST_MARKER) as f:
                pids = _live_marker_pids(f.readlines())
        except OSError:
            pids = []
        me = str(os.getpid())
        if me not in pids:
            pids.append(me)
        with open(_PYTEST_MARKER, "w") as f:
            f.write("\n".join(pids) + "\n")
    except OSError:
        pass


def pytest_sessionfinish(session, exitstatus):
    # remove only our OWN line — concurrent sessions keep theirs; delete
    # the file once no live pid remains
    try:
        with open(_PYTEST_MARKER) as f:
            pids = _live_marker_pids(f.readlines())
        pids = [p for p in pids if p != str(os.getpid())]
        if pids:
            with open(_PYTEST_MARKER, "w") as f:
                f.write("\n".join(pids) + "\n")
        else:
            os.unlink(_PYTEST_MARKER)
    except OSError:
        pass


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_state():
    """Reset jit/compiler caches between test modules.

    One long pytest process accumulates hundreds of compiled XLA:CPU
    executables; past ~140 tests, serializing the next persistent-cache
    entry segfaulted inside XLA (observed repeatedly at the same suite
    position, never in standalone/module runs).  Clearing per module
    bounds that in-process state; persistent-cache hits keep the
    recompiles cheap."""
    yield
    jax.clear_caches()


@pytest.fixture
def small_cfg() -> MapperConfig:
    """Small-geometry config keeping the golden oracle fast in tests."""
    return MapperConfig(
        image_width=64,
        image_height=100,
        max_range=5.0,
        min_range=0.5,
        voxel_resolution=0.1,
        intensity_threshold=30,
    )


def synthetic_ping(
    range_bins: int, bearing_bins: int, seed: int = 0, density: float = 0.02
) -> np.ndarray:
    """Synthetic polar sonar image: sparse bright blobs over low noise, in the
    spirit of the reference self-test image (3d_mapper.py:667-669) but
    randomized for coverage."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 20, size=(range_bins, bearing_bins), dtype=np.int64)
    n_blobs = max(1, int(density * range_bins * bearing_bins / 50))
    for _ in range(n_blobs):
        r0 = int(rng.integers(0, max(1, range_bins - 10)))
        b0 = int(rng.integers(0, max(1, bearing_bins - 8)))
        img[r0 : r0 + int(rng.integers(2, 10)), b0 : b0 + int(rng.integers(2, 8))] = (
            int(rng.integers(80, 220))
        )
    return img.astype(np.uint8)


def circular_trajectory(n: int, radius: float = 1.0):
    """Positions + yaw-only quaternions along a circle (BASELINE config 3)."""
    ts = np.linspace(0, 2 * np.pi, n, endpoint=False)
    positions = np.stack(
        [radius * np.cos(ts), radius * np.sin(ts), np.zeros(n)], axis=-1
    )
    yaw = ts + np.pi / 2
    quats = np.stack(
        [np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], axis=-1
    )
    return positions, quats
