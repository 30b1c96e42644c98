"""Longer-horizon integration fixtures (SURVEY.md section 4c: the BASELINE
scenario shapes beyond what the golden oracle can cover at speed)."""

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.golden import GoldenMapper
from sonar_3d_reconstruction_tpu.models import SonarMapper
from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence

from conftest import synthetic_ping
from test_pipeline import hash_state_to_dict


def downward_survey(cfg, n, seed=0):
    """BASELINE config 2 shape: down-looking sonar, straight-line pass."""
    rng = np.random.default_rng(seed)
    images = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=seed + i)
         for i in range(n)]
    )
    positions = np.stack(
        [0.1 * np.arange(n), np.zeros(n), np.full(n, 2.0)], axis=-1
    )
    quats = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))
    del rng
    return images, positions, quats


def test_hundred_ping_sequence_deterministic(small_cfg):
    """100-ping run: no overflow, deterministic replay, monotone map growth."""
    cfg = small_cfg.replace(sonar_orientation=(0.0, 1.5708, 0.0))
    images, positions, quats = downward_survey(cfg, 100, seed=900)

    st1, stats1 = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 15,
        dtype=jnp.float64,
    )
    assert not np.asarray(stats1["overflowed"]).any()
    # candidates per frame all applied
    assert (np.asarray(stats1["num_candidates"]) > 0).all()

    st2, _ = map_ping_sequence(
        images, positions, quats, cfg,
        initial_capacity=int(st1.key_hi.shape[0]), dtype=jnp.float64,
    )
    a, b = hash_state_to_dict(st1), hash_state_to_dict(st2)
    assert a == b  # bit-identical replay


def test_hundred_ping_prefix_matches_golden(small_cfg):
    """The first 6 pings of the 100-ping scenario against the oracle."""
    cfg = small_cfg.replace(sonar_orientation=(0.0, 1.5708, 0.0))
    images, positions, quats = downward_survey(cfg, 6, seed=900)
    st, _ = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 14,
        dtype=jnp.float64,
    )
    g = GoldenMapper(cfg)
    for i in range(6):
        g.process_ping(images[i], positions[i], quats[i])
    dev = hash_state_to_dict(st)
    assert set(dev) == set(g.map.log_odds)
    for k, glo in g.map.log_odds.items():
        assert abs(dev[k] - glo) < 1e-9


def test_z_filter_end_to_end(small_cfg):
    """z-filter drops candidates below the plane in the full mapper path
    (reference 3d_mapper.py:443-444, 478-479)."""
    cfg = small_cfg.replace(z_filter_enabled=True, z_filter_min=-0.8)
    m = SonarMapper(cfg, initial_capacity=1 << 13, dtype=jnp.float64)
    g = GoldenMapper(cfg)
    img = synthetic_ping(cfg.image_height, cfg.image_width, seed=42)
    s = m.process_sonar_image(img, [0, 0, 0], [0, 0, 0, 1])
    gs = g.process_ping(img, [0, 0, 0], [0, 0, 0, 1])
    assert s["num_voxels"] == gs["num_voxels"]
    pts = m.get_point_cloud()["points"]
    if len(pts):
        # voxel CENTERS of points at z >= z_min can sit half a cell below
        assert (pts[:, 2] >= cfg.z_filter_min - cfg.voxel_resolution).all()


def test_mono16_bag_end_to_end(tmp_path, small_cfg):
    """mono16 recordings stream through decode (/256) to the same map as
    the equivalent mono8 recording."""
    from sonar_3d_reconstruction_tpu.io.bag import BagWriter, ImageMsg, OdometryMsg, IMAGE_TYPE, ODOMETRY_TYPE
    from sonar_3d_reconstruction_tpu.stream import StreamingMapper

    cfg = small_cfg
    n = 4
    images8 = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=70 + i)
         for i in range(n)]
    )
    positions = np.cumsum(np.full((n, 3), 0.1), axis=0)
    quats = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))

    path16 = str(tmp_path / "m16.db3")
    with BagWriter(path16) as w:
        w.add_topic("/sensor/sonar/oculus/m750d/image", IMAGE_TYPE)
        w.add_topic("/fast_lio/odometry", ODOMETRY_TYPE)
        for i in range(n):
            t = 1000.0 + i
            img16 = (images8[i].astype(np.uint16) * 256 + 128).astype("<u2")
            w.write(
                "/sensor/sonar/oculus/m750d/image", t,
                ImageMsg(t, "sonar_link", cfg.image_height, cfg.image_width,
                         "mono16", False, cfg.image_width * 2,
                         img16.tobytes()),
            )
            w.write(
                "/fast_lio/odometry", t,
                OdometryMsg(t, "camera_init", "body", positions[i], quats[i]),
            )

    sm = StreamingMapper(cfg, chunk_size=4, initial_capacity=1 << 13,
                         dtype=jnp.float64)
    stats = sm.run_bag(path16)
    assert stats.pairs == n and stats.decode_errors == 0

    direct, _ = map_ping_sequence(
        images8, positions, quats, cfg, initial_capacity=1 << 13,
        dtype=jnp.float64,
    )
    a, b = hash_state_to_dict(sm.state), hash_state_to_dict(direct)
    assert a == b


def test_float32_parity_vs_golden_1e5(small_cfg):
    """BASELINE acceptance bar: the float32 device path must match the
    float64 NumPy oracle's occupancy probabilities to 1e-5 absolute over a
    multi-ping sequence."""
    from conftest import circular_trajectory

    cfg = small_cfg
    n = 8
    images = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=1000 + i)
         for i in range(n)]
    )
    positions, quats = circular_trajectory(n, radius=0.6)

    st, stats = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 14,
        dtype=jnp.float32,
    )
    assert not np.asarray(stats["overflowed"]).any()

    g = GoldenMapper(cfg)
    for i in range(n):
        g.process_ping(images[i], positions[i], quats[i])

    dev = hash_state_to_dict(st)
    gold = g.map.log_odds
    # voxel SETS can differ only for points landing exactly on voxel
    # boundaries under f32 rounding; none may differ here
    assert set(dev) == set(gold)
    worst = 0.0
    for k, glo in gold.items():
        p_dev = 1.0 / (1.0 + np.exp(-float(dev[k])))
        p_gold = 1.0 / (1.0 + np.exp(-glo))
        worst = max(worst, abs(p_dev - p_gold))
    assert worst < 1e-5, f"worst probability deviation {worst}"


def test_production_preset_tilt60_matches_golden():
    """End-to-end exact (float64) golden parity on the PRODUCTION preset
    semantics — 70 deg FOV, 60 deg down-tilt mount, 0.15 m voxels, min_range
    1.0, z-filter enabled at -6.3, adaptive 0.5/0.3, log-odds 0.5/-0.1
    clamped to [-10, 7] (config/kiro_tilt60.yaml = reference active
    config) — at test-size image geometry."""
    from sonar_3d_reconstruction_tpu.config import PRESETS

    cfg = PRESETS["kiro_tilt60"].replace(image_width=64, image_height=80)
    n = 4
    images = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=700 + i)
         for i in range(n)]
    )
    # shallow pass so the -6.3 z-filter actually clips part of the fan
    positions = np.stack(
        [0.2 * np.arange(n), np.zeros(n), np.full(n, -4.0)], axis=-1
    )
    quats = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))

    st, stats = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 14,
        dtype=jnp.float64,
    )
    g = GoldenMapper(cfg)
    for i in range(n):
        gs = g.process_ping(images[i], positions[i], quats[i])
        assert gs["num_occupied"] == int(np.asarray(stats["num_occupied"])[i])
        assert gs["num_free"] == int(np.asarray(stats["num_free"])[i])
    dev = hash_state_to_dict(st)
    assert set(dev) == set(g.map.log_odds)
    assert len(dev) > 50  # the scenario actually populated a map
    for k, glo in g.map.log_odds.items():
        assert abs(dev[k] - glo) < 1e-9
    # the preset's tighter clamp [-10, 7] is respected
    assert max(dev.values()) <= cfg.log_odds_max + 1e-12
