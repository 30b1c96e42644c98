"""Randomized-config golden-parity fuzz: device engines vs the float64 oracle.

Each trial draws a random MapperConfig (geometry, mount pose, thresholds,
log-odds parameters, z-filter, adaptive update), a random short trajectory,
and random sparse pings, then requires EXACT float64 agreement between
``golden.GoldenMapper`` and the device engines (hash per-frame, hash
batched-window, brick) — the same bar the seeded parity tests pin
(tests/test_integration.py), but over a much wider configuration space.

Usage: python scripts/fuzz_golden.py [N_TRIALS] [BASE_SEED]

Prints one line per trial; exits nonzero on the first mismatch with a
repro line (config dict + seed).  CPU-only; run it while the chip is busy.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# 8 virtual CPU devices so the sharded engines run too (no-op when jax is
# already initialized, e.g. imported from the pytest conftest which sets
# the same flag)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from sonar_3d_reconstruction_tpu.config import MapperConfig  # noqa: E402
from sonar_3d_reconstruction_tpu.golden import GoldenMapper  # noqa: E402
from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence  # noqa: E402
from sonar_3d_reconstruction_tpu.utils.compile_cache import enable  # noqa: E402

enable()


def random_config(rng: np.random.Generator) -> MapperConfig:
    h = int(rng.integers(40, 140))
    w = int(rng.integers(32, 100))
    min_range = float(rng.uniform(0.1, 1.0))
    return MapperConfig(
        image_height=h,
        image_width=w,
        horizontal_fov=float(rng.uniform(60.0, 150.0)),
        vertical_aperture=float(rng.uniform(6.0, 30.0)),
        max_range=float(rng.uniform(3.0, 8.0)),
        min_range=min_range,
        intensity_threshold=float(rng.uniform(10.0, 120.0)),
        voxel_resolution=float(rng.uniform(0.08, 0.35)),
        sonar_position=tuple(rng.uniform(-1.0, 1.0, 3).round(3)),
        sonar_orientation=tuple(rng.uniform(-1.6, 1.6, 3).round(3)),
        z_filter_enabled=bool(rng.random() < 0.3),
        z_filter_min=float(rng.uniform(-2.0, 0.0)),
        adaptive_update=bool(rng.random() < 0.7),
        adaptive_threshold=float(rng.uniform(0.3, 0.7)),
        adaptive_max_ratio=float(rng.uniform(0.1, 0.5)),
        log_odds_occupied=float(rng.uniform(0.5, 3.0)),
        log_odds_free=float(rng.uniform(-3.0, -0.5)),
        log_odds_min=float(rng.uniform(-12.0, -6.0)),
        log_odds_max=float(rng.uniform(6.0, 12.0)),
        free_sampling_step=int(rng.integers(4, 21)),
        occupied_window=int(rng.integers(10, 61)),
        max_rays=int(rng.integers(32, 257)),
    )


def random_pings(cfg: MapperConfig, n: int, rng: np.random.Generator):
    images = rng.integers(
        0, 25, size=(n, cfg.image_height, cfg.image_width)
    ).astype(np.uint8)
    for i in range(n):  # a few bright blobs per ping
        for _ in range(int(rng.integers(1, 4))):
            r0 = int(rng.integers(0, cfg.image_height - 6))
            b0 = int(rng.integers(0, cfg.image_width - 5))
            images[i, r0 : r0 + int(rng.integers(2, 6)),
                   b0 : b0 + int(rng.integers(2, 5))] = int(
                rng.integers(60, 230)
            )
    positions = rng.normal(0.0, 0.5, size=(n, 3))
    q = rng.normal(0.0, 1.0, size=(n, 4))
    quats = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return images, positions, quats


# reuse the suite's canonical state decoders (tests/ on sys.path)
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests")
)
from test_brick_grid import brick_state_to_dict  # noqa: E402
from test_pipeline import hash_state_to_dict  # noqa: E402


def run_trial(seed: int) -> str:
    rng = np.random.default_rng(seed)
    cfg = random_config(rng)
    n = int(rng.integers(2, 5))
    images, positions, quats = random_pings(cfg, n, rng)

    g = GoldenMapper(cfg)
    for i in range(n):
        g.process_ping(images[i], positions[i], quats[i])
    want = dict(g.map.log_odds)

    results = {}
    for label, kwargs in (
        ("hash_w1", dict(window=1)),
        ("hash_w3", dict(window=3)),
        ("brick_w2", dict(backend="brick", window=2)),
    ):
        st, stats = map_ping_sequence(
            images, positions, quats, cfg, initial_capacity=1 << 15,
            dtype=jnp.float64, **kwargs,
        )
        if np.asarray(stats["overflowed"]).any():
            return f"OVERFLOW[{label}]"
        results[label] = (
            brick_state_to_dict(st) if label.startswith("brick")
            else hash_state_to_dict(st)
        )

    # the frame-parallel sharded engine (records sharded over pings +
    # all_to_all exchange, parallel/shard_frames.py) on the virtual mesh:
    # the collectives path must hit the same oracle map bit-for-bit
    if os.environ.get("FUZZ_SHARDED", "1") == "1" and jax.device_count() >= 4:
        from test_shard_brick import sharded_brick_to_dict  # noqa: E402

        from sonar_3d_reconstruction_tpu.parallel.shard import make_mesh
        from sonar_3d_reconstruction_tpu.parallel.shard_frames import (
            map_ping_sequence_sharded_frames,
        )

        sh, sstats = map_ping_sequence_sharded_frames(
            images, positions, quats, cfg, mesh=make_mesh(),
            dtype=jnp.float64, window=2, local_capacity=1 << 12,
        )
        if np.asarray(sstats["overflowed"]).any():
            return "OVERFLOW[frames_w2]"
        results["frames_w2"] = sharded_brick_to_dict(sh)

    for label, got in results.items():
        if set(got) != set(want):
            extra = list(set(got) - set(want))[:3]
            missing = list(set(want) - set(got))[:3]
            return (f"MISMATCH[{label}] keys: +{len(set(got)-set(want))} "
                    f"-{len(set(want)-set(got))} extra={extra} "
                    f"missing={missing}")
        worst = 0.0
        for k, v in want.items():
            worst = max(worst, abs(got[k] - v))
        if worst > 1e-9:
            return f"MISMATCH[{label}] value err {worst:.3e}"
    return f"ok n={n} voxels={len(want)}"


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    bad = 0
    for t in range(n_trials):
        seed = base + t
        try:
            msg = run_trial(seed)
        except Exception as e:  # noqa: BLE001 — report and continue
            msg = f"EXCEPTION {type(e).__name__}: {e}"
        # every trial compiles fresh shapes; without this the in-process
        # executable pile-up dies with LLVM "Cannot allocate memory" after
        # ~50 trials (same pathology conftest.py bounds per test module)
        jax.clear_caches()
        flag = "" if msg.startswith("ok") or msg.startswith("OVERFLOW") \
            else " <<<<"
        print(f"seed {seed}: {msg}{flag}", flush=True)
        if flag:
            bad += 1
            rng = np.random.default_rng(seed)
            print("  repro config:", random_config(rng), flush=True)
    print(f"done: {n_trials} trials, {bad} failures", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
