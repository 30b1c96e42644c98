"""SonarMapper flagship API: reference-parity surface, growth, width change."""

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.golden import GoldenMapper
from sonar_3d_reconstruction_tpu.models import SonarMapper

from conftest import circular_trajectory, synthetic_ping


def test_selftest_scenario_matches_golden(small_cfg):
    """The reference __main__ scenario shape (3d_mapper.py:653-683) at test
    scale, through the stateful API with the hash backend."""
    cfg = small_cfg
    m = SonarMapper(cfg, backend="hash", initial_capacity=1 << 13, dtype=jnp.float64)
    g = GoldenMapper(cfg)
    img = np.zeros((cfg.image_height, cfg.image_width), np.uint8)
    img[20:30, 20:40] = 100
    img[60:70, 10:20] = 150

    for i in range(3):
        pos = [i * 0.1, 0.0, 0.0]
        quat = [0.0, 0.0, 0.0, 1.0]
        stats = m.process_sonar_image(img, pos, quat)
        gstats = g.process_ping(img, pos, quat)
        assert stats["num_occupied"] == gstats["num_occupied"]
        assert stats["num_free"] == gstats["num_free"]
        assert stats["num_voxels"] == gstats["num_voxels"]
        assert stats["frame_count"] == i + 1

    result = m.get_point_cloud()
    gold = g.point_cloud()
    assert result["num_occupied"] == gold["num_occupied"]
    assert result["num_voxels"] == gold["num_voxels"]
    assert set(result.keys()) >= {
        "points", "probabilities", "num_voxels", "num_occupied",
        "frame_count", "processed_count",
    }

    full = m.get_point_cloud(include_free=True)
    gfull = g.point_cloud(include_free=True)
    assert full["num_free"] == len(gfull["free"])
    assert full["num_unknown"] == len(gfull["unknown"])
    np.testing.assert_allclose(full["bounds"]["min"], gfull["bounds"][0], atol=1e-9)


def test_dict_config_like_reference(small_cfg):
    """The reference accepts a plain config dict (3d_mapper.py:203-254)."""
    m = SonarMapper(
        {"voxel_resolution": 0.1, "min_probability": 0.6, "intensity_threshold": 30},
        initial_capacity=1 << 12,
    )
    assert m.cfg.voxel_resolution == 0.1
    assert m.cfg.horizontal_fov == 130.0  # default preserved


def test_automatic_growth(small_cfg):
    """Start with a tiny table; the mapper must grow and still match golden."""
    cfg = small_cfg
    m = SonarMapper(cfg, backend="hash", initial_capacity=1 << 7, dtype=jnp.float64)
    g = GoldenMapper(cfg)
    img = synthetic_ping(cfg.image_height, cfg.image_width, seed=77)
    stats = m.process_sonar_image(img, [0, 0, 0], [0, 0, 0, 1])
    gstats = g.process_ping(img, [0, 0, 0], [0, 0, 0, 1])
    assert stats["num_voxels"] == gstats["num_voxels"]
    assert m.state.keys.shape[0] > 1 << 6  # grew
    assert not bool(m.state.poisoned)


def test_image_width_change_rebuilds_tables(small_cfg):
    """Reference rebuilds bearing angles when the width changes
    (3d_mapper.py:511-517)."""
    cfg = small_cfg
    m = SonarMapper(cfg, initial_capacity=1 << 13, dtype=jnp.float64)
    g = GoldenMapper(cfg)
    img1 = synthetic_ping(cfg.image_height, cfg.image_width, seed=88)
    img2 = synthetic_ping(cfg.image_height, 48, seed=89)
    for img in (img1, img2):
        stats = m.process_sonar_image(img, [0, 0, 0], [0, 0, 0, 1])
        gstats = g.process_ping(img, [0, 0, 0], [0, 0, 0, 1])
        assert stats["num_voxels"] == gstats["num_voxels"]


def test_reset_map(small_cfg):
    m = SonarMapper(small_cfg, initial_capacity=1 << 13)
    img = synthetic_ping(small_cfg.image_height, small_cfg.image_width, seed=99)
    m.process_sonar_image(img, [0, 0, 0], [0, 0, 0, 1])
    assert m.num_voxels > 0
    m.reset_map()
    assert m.num_voxels == 0
    assert m.frame_count == 0


def test_dense_backend_equivalence(small_cfg):
    from sonar_3d_reconstruction_tpu.grid.dense import DenseGridSpec

    cfg = small_cfg
    spec = DenseGridSpec.for_world_bounds((-7, -7, -7), (7, 7, 7), cfg.voxel_resolution)
    md = SonarMapper(cfg, backend="dense", dense_spec=spec, dtype=jnp.float64)
    mh = SonarMapper(cfg, backend="hash", initial_capacity=1 << 13, dtype=jnp.float64)
    img = synthetic_ping(cfg.image_height, cfg.image_width, seed=111)
    sd = md.process_sonar_image(img, [0.2, 0.1, 0], [0, 0, 0, 1])
    sh = mh.process_sonar_image(img, [0.2, 0.1, 0], [0, 0, 0, 1])
    assert sd["num_occupied"] == sh["num_occupied"]
    assert sd["num_voxels"] == sh["num_voxels"]
    rd, rh = md.get_point_cloud(), mh.get_point_cloud()
    assert rd["num_occupied"] == rh["num_occupied"]
    d = {tuple(np.round(p, 6)) for p in rd["points"]}
    h = {tuple(np.round(p, 6)) for p in rh["points"]}
    assert d == h


def test_update_count_tracking(small_cfg):
    """Opt-in per-voxel EMISSION-count histograms (reference debug stats,
    3d_mapper.py:306-308, 525, 549-551): counts must equal the golden
    oracle's per-frame accumulation counts exactly."""
    cfg = small_cfg
    m = SonarMapper(cfg, initial_capacity=1 << 13, dtype=jnp.float64,
                    track_update_counts=True)
    g = GoldenMapper(cfg)
    img = synthetic_ping(cfg.image_height, cfg.image_width, seed=33)
    m.process_sonar_image(img, [0, 0, 0], [0, 0, 0, 1])
    g.process_ping(img, [0, 0, 0], [0, 0, 0, 1])
    # per-frame dict == reference frame_update_counts (emissions, not frames)
    assert m.frame_update_counts == g.last_frame_counts
    m.process_sonar_image(img, [0, 0, 0], [0, 0, 0, 1])  # same pose twice
    g.process_ping(img, [0, 0, 0], [0, 0, 0, 1])
    assert m.frame_update_counts == g.last_frame_counts
    # accumulated totals: every voxel saw both (identical) frames
    assert m.voxel_update_counts == {
        k: 2 * c for k, c in g.last_frame_counts.items()
    }
    hist = m.update_count_histogram()
    assert sum(hist.values()) == m.num_voxels
    # per-frame debug aggregates (reference :575-585)
    s = m.frame_update_stats()
    counts = list(g.last_frame_counts.values())
    assert s["max_updates_frame"] == max(counts)
    assert abs(s["avg_updates_frame"] - sum(counts) / len(counts)) < 1e-12
    assert s["max_updates_total"] == 2 * max(counts)
    assert s["voxels_over_10_frame"] == sum(1 for v in counts if v > 10)
    report = m.format_frame_update_stats()
    assert "Max updates in frame" in report
    m.reset_map()
    assert m.update_count_histogram() == {}
    assert m.frame_update_stats() == {}


def test_map_sequence_matches_per_ping(small_cfg):
    """The batch API must produce the identical map as per-ping calls."""
    cfg = small_cfg
    n = 5
    images = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=600 + i)
         for i in range(n)]
    )
    positions = np.cumsum(np.full((n, 3), 0.1), axis=0)
    quats = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))

    m1 = SonarMapper(cfg, initial_capacity=1 << 13, dtype=jnp.float64)
    stats = m1.map_sequence(images, positions, quats)
    assert m1.frame_count == n
    assert len(np.asarray(stats["num_occupied"])) == n

    m2 = SonarMapper(cfg, initial_capacity=1 << 13, dtype=jnp.float64)
    for i in range(n):
        m2.process_sonar_image(images[i], positions[i], quats[i])

    c1, c2 = m1.get_point_cloud(), m2.get_point_cloud()
    assert c1["num_voxels"] == c2["num_voxels"]
    assert c1["num_occupied"] == c2["num_occupied"]
    np.testing.assert_allclose(
        np.sort(c1["points"], axis=0), np.sort(c2["points"], axis=0)
    )


def test_point_queries_match_golden(small_cfg):
    """get_probability / get_log_odds / query_probabilities (reference
    SimpleOctree 3d_mapper.py:117-126) on both backends vs the oracle."""
    from conftest import circular_trajectory, synthetic_ping
    from sonar_3d_reconstruction_tpu.golden import GoldenMapper
    from sonar_3d_reconstruction_tpu.grid.hash import keys_to_world
    from sonar_3d_reconstruction_tpu.models import SonarMapper

    cfg = small_cfg
    n = 3
    images = [synthetic_ping(cfg.image_height, cfg.image_width, seed=400 + i)
              for i in range(n)]
    positions, quats = circular_trajectory(n)

    g = GoldenMapper(cfg)
    m = SonarMapper(cfg, dtype=jnp.float64)
    md = SonarMapper(cfg, backend="dense", dtype=jnp.float64)
    for img, p, q in zip(images, positions, quats):
        g.process_ping(img, p, q)
        m.process_sonar_image(img, p, q)
        md.process_sonar_image(img, p, q)

    keys = list(g.map.log_odds.keys())[:64]
    pts = keys_to_world(np.asarray(keys), cfg.voxel_resolution)
    want_lo = np.array([g.map.log_odds[k] for k in keys])
    want_p = 1.0 / (1.0 + np.exp(-want_lo))

    np.testing.assert_allclose(m.query_probabilities(pts), want_p,
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(md.query_probabilities(pts), want_p,
                               rtol=0, atol=1e-12)
    x, y, z = pts[0]
    assert abs(m.get_probability(x, y, z) - want_p[0]) < 1e-12
    assert abs(m.get_log_odds(x, y, z) - want_lo[0]) < 1e-12
    assert abs(md.get_log_odds(x, y, z) - want_lo[0]) < 1e-9

    # never-updated voxel -> log-odds 0.0 / probability 0.5 (reference
    # voxels.get(key, 0.0)); far out-of-bounds on the dense backend too
    far = np.array([[123.4, -345.6, 78.9]])
    assert float(m.query_probabilities(far)[0]) == 0.5
    assert float(md.query_probabilities(far)[0]) == 0.5
    assert m.get_log_odds(*far[0]) == 0.0

    # clear() is the reference SimpleOctree.clear alias
    m.clear()
    assert m.num_voxels == 0
    assert float(m.query_probabilities(pts[:1])[0]) == 0.5


def test_point_query_boundary_quantization_f32_map(small_cfg):
    """Query quantization must happen in float64 on the host (reference
    world_to_key is f64 NumPy): on a float32 map, a coordinate just under
    a voxel boundary must NOT resolve to the neighboring cell (review r2
    finding)."""
    from sonar_3d_reconstruction_tpu.grid.hash import (
        bucket_lookup,
        init_hash_grid,
        insert_unique,
        query_log_odds,
    )
    from sonar_3d_reconstruction_tpu.ops.packing import pack_keys

    cfg = small_cfg
    res = cfg.voxel_resolution
    # float32 map: the old in-dtype flooring collapses boundary queries
    st = init_hash_grid(1 << 10, jnp.float32)
    # occupy voxel key (2, 0, 0) with a known value
    hi, lo, _ = pack_keys(jnp.asarray([[2, 0, 0]], jnp.int32))
    bucket, found, _slot, fill = bucket_lookup(st.key_rows, hi, lo)
    rows, slots, over, _n = insert_unique(
        st.key_rows, hi, lo, ~found, bucket, fill
    )
    assert not bool(over)
    st = st._replace(
        key_rows=rows, log_odds=st.log_odds.at[slots[0]].set(1.5)
    )
    eps = res * 1e-12  # f64-representable, vanishes in f32
    below = [[2 * res - eps, eps, eps]]   # inside voxel 1 (f64), rounds to
    inside = [[2 * res + eps, eps, eps]]  # voxel 2 under f32 flooring
    assert float(query_log_odds(st, below, cfg)[0]) == 0.0
    assert float(query_log_odds(st, inside, cfg)[0]) == 1.5


def test_update_count_tracking_brick_backend(small_cfg):
    """track_update_counts was silently ignored by process_sonar_image on
    the non-hash backends; the emission-count recompute is map-state-
    independent and must serve brick identically."""
    cfg = small_cfg
    m = SonarMapper(cfg, backend="brick", initial_capacity=1 << 13,
                    dtype=jnp.float64, track_update_counts=True)
    g = GoldenMapper(cfg)
    img = synthetic_ping(cfg.image_height, cfg.image_width, seed=34)
    m.process_sonar_image(img, [0, 0, 0], [0, 0, 0, 1])
    g.process_ping(img, [0, 0, 0], [0, 0, 0, 1])
    assert m.frame_update_counts == g.last_frame_counts
    assert m.voxel_update_counts == g.last_frame_counts


def test_map_sequence_persists_grown_budgets(small_cfg):
    """A batch whose frames overflow the unique budget grows it INSIDE
    map_ping_sequence; the mapper must persist the grown value or every
    later batch replays the same overflow/recompile cycle."""
    cfg = small_cfg
    m = SonarMapper(cfg, backend="brick", dtype=jnp.float64)
    m._unique_budget = 64  # deliberately too small for a real ping
    images = np.stack([
        synthetic_ping(cfg.image_height, cfg.image_width, seed=35 + i)
        for i in range(2)
    ])
    positions, quats = circular_trajectory(2)
    stats = m.map_sequence(images, positions, quats)
    assert not np.asarray(stats["overflowed"]).any()
    assert m._unique_budget > 64
