"""Deployment budget tuning (utils/autotune + `tune` CLI + budgets= plan).

The snug-budget machinery was bench-internal through round 3; round 4
promotes it to a user feature.  These tests pin:

  * tune_sequence -> map_ping_sequence(budgets=plan) is BIT-IDENTICAL to
    the untuned run (budgets are shapes, never semantics);
  * a deliberately stale (too small) plan falls back safely — same map,
    correct stats — via the drop-extras replay in map_ping_sequence;
  * the CLI round trip: make-bag -> tune -> map-bag --offline --budgets;
  * the factored formulas still produce exactly the committed
    bench_plan.json budgets (bench and autotune must not drift apart).
"""

import json
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence
from sonar_3d_reconstruction_tpu.utils.autotune import (
    snug_budgets_brick,
    tune_sequence,
)


def _survey(cfg, n=10, seed=3):
    rng = np.random.default_rng(seed)
    R, B = cfg.image_height, cfg.image_width
    images = rng.integers(0, 25, size=(n, R, B)).astype(np.uint8)
    for i in range(n):
        r0 = R // 3 + (i % 4)
        images[i, r0 : r0 + 6, :] = 200
    positions = np.stack(
        [0.05 * np.arange(n), np.zeros(n), np.zeros(n)], axis=-1
    )
    quats = np.tile(np.array([0.0, 0.0, 0.0, 1.0]), (n, 1))
    return images, positions, quats


@pytest.fixture(scope="module")
def small_setup():
    cfg = MapperConfig(
        image_height=64, image_width=48, max_range=5.0, min_range=0.5,
        voxel_resolution=0.1, intensity_threshold=50,
    )
    return (cfg,) + _survey(cfg)


@pytest.mark.parametrize("backend", ["brick", "hash"])
def test_tuned_run_bit_identical(small_setup, backend):
    cfg, images, positions, quats = small_setup
    plan = tune_sequence(
        images, positions, quats, cfg, backend=backend, window=4,
        dtype=jnp.float64,
    )
    st_ref, stats_ref = map_ping_sequence(
        images, positions, quats, cfg, backend=backend, window=4,
        dtype=jnp.float64,
    )
    st_tuned, stats_tuned = map_ping_sequence(
        images, positions, quats, cfg, backend=backend, window=4,
        dtype=jnp.float64, budgets=plan,
    )
    assert int(np.asarray(st_tuned.used).sum()) == \
        int(np.asarray(st_ref.used).sum())
    np.testing.assert_array_equal(
        np.asarray(stats_tuned["num_occupied"]),
        np.asarray(stats_ref["num_occupied"]),
    )
    np.testing.assert_array_equal(
        np.asarray(stats_tuned["num_candidates"]),
        np.asarray(stats_ref["num_candidates"]),
    )
    # identical final probabilities at the occupied voxels
    if backend == "brick":
        from sonar_3d_reconstruction_tpu.grid.brick import (
            extract_occupied_brick as ex,
        )
    else:
        from sonar_3d_reconstruction_tpu.grid.hash import (
            extract_occupied_hash as ex,
        )
    pts_r, pr_r = ex(st_ref, cfg)
    pts_t, pr_t = ex(st_tuned, cfg)
    order_r = np.lexsort(pts_r.T)
    order_t = np.lexsort(pts_t.T)
    np.testing.assert_array_equal(pts_t[order_t], pts_r[order_r])
    np.testing.assert_array_equal(pr_t[order_t], pr_r[order_r])


@pytest.mark.parametrize("backend", ["brick", "hash"])
def test_stale_plan_falls_back_safely(small_setup, backend):
    cfg, images, positions, quats = small_setup
    plan = tune_sequence(
        images, positions, quats, cfg, backend=backend, window=4,
        dtype=jnp.float64,
    )
    # sabotage the plan: tiny apply-side budgets guarantee an overflow
    stale = dict(plan)
    stale["lane_budget"] = 8
    stale["insert_budget"] = [8, 8]
    stale["dedup_lane_budget"] = 0
    st_ref, stats_ref = map_ping_sequence(
        images, positions, quats, cfg, backend=backend, window=4,
        dtype=jnp.float64,
    )
    st_tuned, stats_tuned = map_ping_sequence(
        images, positions, quats, cfg, backend=backend, window=4,
        dtype=jnp.float64, budgets=stale,
    )
    assert int(np.asarray(st_tuned.used).sum()) == \
        int(np.asarray(st_ref.used).sum())
    np.testing.assert_array_equal(
        np.asarray(stats_tuned["num_occupied"]),
        np.asarray(stats_ref["num_occupied"]),
    )
    assert not np.asarray(stats_tuned["overflowed"]).any()


def test_streaming_with_plan_bit_identical(small_setup):
    """A plan seeds the streaming runtime's sizes (capacity, snug budgets,
    grow-only caps): same map as an unseeded stream, and ZERO mid-stream
    cap recompiles on the data the plan covered."""
    from sonar_3d_reconstruction_tpu.grid.brick import extract_occupied_brick
    from sonar_3d_reconstruction_tpu.io.bag import ImageMsg, OdometryMsg
    from sonar_3d_reconstruction_tpu.stream import StreamingMapper

    cfg, images, positions, quats = small_setup
    plan = tune_sequence(
        images, positions, quats, cfg, backend="brick", window=4,
        dtype=jnp.float64,
    )

    def run(budgets):
        sm = StreamingMapper(
            cfg, chunk_size=4, window=4, dtype=jnp.float64,
            backend="brick", budgets=budgets,
        )
        h, w = images.shape[1:]
        for i in range(images.shape[0]):
            t = 1000.0 + 0.5 * i
            sm.on_ping(ImageMsg(t, "sonar_link", h, w, "mono8", False, w,
                                images[i].tobytes()))
            sm.on_pose(OdometryMsg(t, "camera_init", "body", positions[i],
                                   quats[i]))
        stats = sm.finish()
        return sm, stats

    sm_ref, _ = run(None)
    sm_plan, stats_plan = run(plan)
    s = stats_plan.summary()
    assert s["fan_cap_recompiles"] == 0
    assert s["window_cap_recompiles"] == 0
    assert s["free_cap_recompiles"] == 0
    assert s["grows"] == 0
    pts_r, pr_r = extract_occupied_brick(sm_ref.state, cfg)
    pts_p, pr_p = extract_occupied_brick(sm_plan.state, cfg)
    order_r = np.lexsort(pts_r.T)
    order_p = np.lexsort(pts_p.T)
    np.testing.assert_array_equal(pts_p[order_p], pts_r[order_r])
    np.testing.assert_array_equal(pr_p[order_p], pr_r[order_r])


def test_cli_tune_map_bag_roundtrip(tmp_path):
    from sonar_3d_reconstruction_tpu.cli import main

    bag = str(tmp_path / "survey.db3")
    plan_path = str(tmp_path / "plan.json")
    argv_base = ["make-bag", bag, "--pings", "6", "--range-bins", "64",
                 "--bearing-bins", "48"]
    assert main(argv_base) == 0
    assert main([
        "tune", bag, "--backend", "brick", "--window", "2",
        "--param", "max_range=5.0", "--param", "voxel_resolution=0.1",
        "--out", plan_path,
    ]) == 0
    with open(plan_path) as f:
        plan = json.load(f)
    assert plan["backend"] == "brick" and plan["window"] == 2
    assert plan["unique_budget"] > 0 and plan["capacity"] > 0
    assert main([
        "map-bag", bag, "--offline", "--backend", "brick", "--window", "2",
        "--param", "max_range=5.0", "--param", "voxel_resolution=0.1",
        "--budgets", plan_path,
    ]) == 0
    # the documented flow passes NO backend/window flags — map-bag must
    # adopt the plan's (tune defaults to brick, map-bag alone to hash)
    assert main([
        "map-bag", bag, "--offline",
        "--param", "max_range=5.0", "--param", "voxel_resolution=0.1",
        "--budgets", plan_path,
    ]) == 0
    # an explicitly contradicting backend is a clear error, not a crash
    with pytest.raises(SystemExit, match="tuned for backend"):
        main([
            "map-bag", bag, "--offline", "--backend", "hash",
            "--param", "max_range=5.0", "--param", "voxel_resolution=0.1",
            "--budgets", plan_path,
        ])


def test_formulas_match_committed_bench_plan():
    """bench discover() now routes through autotune — the committed
    bench_plan.json must be exactly reproducible from the formulas (any
    drift would silently stale the capture plan).

    Deliberately the heaviest test in the suite (~70 s warm on one CPU
    core: a 256-ping full-size warmup) — it is the only check that
    catches FORMULA drift, not just key drift (test_bench_capture covers
    keys cheaply), and a stale capture plan cost round 3 its artifacts."""
    import bench
    from sonar_3d_reconstruction_tpu.ops.backproject import (
        required_fan_cap,
        required_free_cap,
        required_window_cap,
    )

    cfg = MapperConfig()
    images, positions, quats = bench.make_inputs(cfg, 256)
    with open(bench.PLAN_PATH) as f:
        plans = json.load(f)
    # select by the default-capture key (the file may legitimately hold
    # plans for several configs — _write_plan merges, never prunes)
    caps = (
        required_fan_cap(images, cfg, cfg.image_height),
        required_window_cap(images, cfg, cfg.image_height),
        required_free_cap(images, cfg, cfg.image_height),
    )
    plan = plans[
        bench._plan_key(cfg, 256, bench.DEFAULT_WINDOW, "brick", "scalar",
                        caps, 1 << 16, 0)
    ]
    # reconstruct the stats the discovery warmup measured via a fresh run
    # at the plan's own budgets (bit-identical emissions by design)
    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid

    effective = {}
    _, stats = map_ping_sequence(
        images, positions, quats, cfg, backend="brick", dtype=jnp.float32,
        window=bench.DEFAULT_WINDOW, effective=effective,
        state=init_brick_grid(1 << 16, jnp.float32),
    )
    rebuilt = snug_budgets_brick(
        stats, bench.DEFAULT_WINDOW, effective["unique_budget"],
        effective["brick_budget"],
    )
    for k in ("unique_budget", "brick_budget", "lane_budget",
              "insert_budget", "dedup_lane_budget", "safe_unique_budget",
              "safe_brick_budget"):
        assert rebuilt[k] == plan[k], (k, rebuilt[k], plan[k])
