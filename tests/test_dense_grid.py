"""Dense grid map updates vs the golden oracle: end-to-end ping sequences.

Covers BASELINE configs 1-3 at test scale: single ping identity pose, multi-
ping downward-mount sequence with plain log-odds, and adaptive update on a
circular trajectory.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.geometry import (
    pose_matrix_from_quaternion,
    pose_matrix_from_rpy,
)
from sonar_3d_reconstruction_tpu.golden import GoldenMapper
from sonar_3d_reconstruction_tpu.grid.dense import (
    DenseGridSpec,
    extract_classified,
    extract_occupied,
    init_dense_grid,
    update_dense_grid,
)
from sonar_3d_reconstruction_tpu.ops.backproject import (
    backproject_ping,
    build_fan_tables,
)

from conftest import circular_trajectory, synthetic_ping


def run_device(cfg, spec, images, positions, quats, dtype=jnp.float64):
    tables = build_fan_tables(cfg, images[0].shape[0], images[0].shape[1])
    T_mount = pose_matrix_from_rpy(
        np.asarray(cfg.sonar_position), np.asarray(cfg.sonar_orientation)
    )
    state = init_dense_grid(spec, dtype)
    stats_hist = []

    @jax.jit
    def step(state, image, T):
        cand = backproject_ping(image, T, tables, cfg, dtype=dtype)
        return update_dense_grid(state, cand, spec, cfg)

    for img, pos, q in zip(images, positions, quats):
        T = pose_matrix_from_quaternion(np.asarray(pos), np.asarray(q)) @ T_mount
        state, stats = step(state, jnp.asarray(img), jnp.asarray(T))
        stats_hist.append({k: int(v) for k, v in stats.items()})
    return state, stats_hist


def run_golden(cfg, images, positions, quats):
    g = GoldenMapper(cfg)
    stats_hist = []
    for img, pos, q in zip(images, positions, quats):
        stats_hist.append(g.process_ping(img, pos, q))
    return g, stats_hist


def compare_maps(g: GoldenMapper, state, spec, atol=1e-9):
    lo = np.asarray(state.log_odds).reshape(spec.shape)
    touched = np.asarray(state.touched).reshape(spec.shape)
    origin = np.asarray(spec.origin_key)

    golden_keys = set(g.map.log_odds.keys())
    dev_keys = set(
        tuple(k + origin)
        for k in np.argwhere(touched)
    )
    assert dev_keys == golden_keys, (
        f"touched-voxel sets differ: only-golden={len(golden_keys - dev_keys)}, "
        f"only-device={len(dev_keys - golden_keys)}"
    )
    for key, glo in g.map.log_odds.items():
        i, j, k = (np.asarray(key) - origin).tolist()
        assert abs(lo[i, j, k] - glo) < atol, (key, lo[i, j, k], glo)


def scenario_spec(cfg, reach=7.0):
    return DenseGridSpec.for_world_bounds(
        (-reach, -reach, -reach), (reach, reach, reach), cfg.voxel_resolution
    )


def test_single_ping_identity_pose(small_cfg):
    """BASELINE config 1 (test scale): one ping, identity pose, dense grid."""
    cfg = small_cfg
    images = [synthetic_ping(cfg.image_height, cfg.image_width, seed=21)]
    poses = [[0.0, 0.0, 0.0]]
    quats = [[0.0, 0.0, 0.0, 1.0]]
    spec = scenario_spec(cfg)
    state, dstats = run_device(cfg, spec, images, poses, quats)
    g, gstats = run_golden(cfg, images, poses, quats)
    compare_maps(g, state, spec)
    assert int(state.overflow) == 0
    assert dstats[0]["num_occupied"] == gstats[0]["num_occupied"]
    assert dstats[0]["num_free"] == gstats[0]["num_free"]


def test_multi_ping_sequence_plain_logodds(small_cfg):
    """BASELINE config 2 (test scale): downward mount, adaptive off."""
    cfg = small_cfg.replace(adaptive_update=False)
    n = 6
    rng = np.random.default_rng(31)
    images = [
        synthetic_ping(cfg.image_height, cfg.image_width, seed=100 + i)
        for i in range(n)
    ]
    poses = [[i * 0.1, 0.0, 0.0] for i in range(n)]
    quats = [[0.0, 0.0, 0.0, 1.0]] * n
    spec = scenario_spec(cfg)
    state, dstats = run_device(cfg, spec, images, poses, quats)
    g, gstats = run_golden(cfg, images, poses, quats)
    compare_maps(g, state, spec)
    for ds, gs in zip(dstats, gstats):
        assert ds["num_occupied"] == gs["num_occupied"]
        assert ds["num_free"] == gs["num_free"]


def test_adaptive_circular_trajectory(small_cfg):
    """BASELINE config 3 (test scale): adaptive update, circular trajectory.

    The adaptive path reads pre-frame state, so multi-frame order matters —
    this exercises the sequential-scan semantics."""
    cfg = small_cfg.replace(adaptive_update=True, adaptive_max_ratio=0.3)
    n = 5
    images = [
        synthetic_ping(cfg.image_height, cfg.image_width, seed=200 + i, density=0.05)
        for i in range(n)
    ]
    positions, quats = circular_trajectory(n, radius=0.5)
    spec = scenario_spec(cfg)
    state, _ = run_device(cfg, spec, images, positions, quats)
    g, _ = run_golden(cfg, images, positions, quats)
    compare_maps(g, state, spec)


def test_clamping_saturation(small_cfg):
    """Repeated identical pings drive voxels into the clamp bounds."""
    cfg = small_cfg.replace(
        log_odds_occupied=3.0, log_odds_free=-3.0, log_odds_min=-4.0, log_odds_max=4.0
    )
    img = synthetic_ping(cfg.image_height, cfg.image_width, seed=41)
    images = [img] * 5
    poses = [[0.0, 0.0, 0.0]] * 5
    quats = [[0.0, 0.0, 0.0, 1.0]] * 5
    spec = scenario_spec(cfg)
    state, _ = run_device(cfg, spec, images, poses, quats)
    g, _ = run_golden(cfg, images, poses, quats)
    compare_maps(g, state, spec)
    lo = np.asarray(state.log_odds)
    assert lo.min() >= cfg.log_odds_min - 1e-12
    assert lo.max() <= cfg.log_odds_max + 1e-12


def test_bounds_tracking(small_cfg):
    cfg = small_cfg
    images = [synthetic_ping(cfg.image_height, cfg.image_width, seed=51)]
    poses = [[0.5, -0.25, 0.0]]
    quats = [[0.0, 0.0, 0.0, 1.0]]
    spec = scenario_spec(cfg)
    state, _ = run_device(cfg, spec, images, poses, quats)
    g, _ = run_golden(cfg, images, poses, quats)
    np.testing.assert_allclose(np.asarray(state.min_bounds), g.map.min_bounds, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.max_bounds), g.map.max_bounds, atol=1e-9)


def test_extraction_matches_golden(small_cfg):
    cfg = small_cfg
    images = [
        synthetic_ping(cfg.image_height, cfg.image_width, seed=61 + i) for i in range(3)
    ]
    poses = [[i * 0.2, 0.0, 0.0] for i in range(3)]
    quats = [[0.0, 0.0, 0.0, 1.0]] * 3
    spec = scenario_spec(cfg)
    state, _ = run_device(cfg, spec, images, poses, quats)
    g, _ = run_golden(cfg, images, poses, quats)

    pts, probs = extract_occupied(state, spec, cfg)
    gold = g.map.occupied(cfg.min_probability)
    assert len(pts) == len(gold)
    got = {tuple(np.round(p, 6)): pr for p, pr in zip(pts, probs)}
    for gp, gpr in gold:
        k = tuple(np.round(gp, 6))
        assert k in got
        assert abs(got[k] - gpr) < 1e-9

    cls = extract_classified(state, spec, cfg)
    gcls = g.map.classified(cfg.min_probability)
    for name in ("free", "unknown", "occupied"):
        assert len(cls[name][0]) == len(gcls[name]), name


def test_float32_within_parity_bar(small_cfg):
    """float32 device path stays within the 1e-5 probability parity bar on a
    short sequence (BASELINE acceptance metric)."""
    cfg = small_cfg
    images = [
        synthetic_ping(cfg.image_height, cfg.image_width, seed=71 + i)
        for i in range(3)
    ]
    poses = [[i * 0.15, 0.0, 0.0] for i in range(3)]
    quats = [[0.0, 0.0, 0.0, 1.0]] * 3
    spec = scenario_spec(cfg)
    state, _ = run_device(cfg, spec, images, poses, quats, dtype=jnp.float32)
    g, _ = run_golden(cfg, images, poses, quats)

    lo = np.asarray(state.log_odds).reshape(spec.shape)
    origin = np.asarray(spec.origin_key)
    n_checked = 0
    for key, glo in g.map.log_odds.items():
        i, j, k = (np.asarray(key) - origin).tolist()
        p_dev = 1.0 / (1.0 + np.exp(-float(lo[i, j, k])))
        p_gold = 1.0 / (1.0 + np.exp(-glo))
        assert abs(p_dev - p_gold) < 1e-5, (key, p_dev, p_gold)
        n_checked += 1
    assert n_checked > 100
