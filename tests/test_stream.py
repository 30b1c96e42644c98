"""Streaming runtime: bag -> sync -> chunked mapping, vs direct pipeline."""

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.config import StreamConfig
from sonar_3d_reconstruction_tpu.grid.hash import EMPTY
from sonar_3d_reconstruction_tpu.io.bag import write_synthetic_bag
from sonar_3d_reconstruction_tpu.io.pointcloud import parse_pointcloud2
from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence
from sonar_3d_reconstruction_tpu.stream import StreamingMapper

from conftest import circular_trajectory, synthetic_ping


def to_dict(state):
    keys = np.asarray(state.keys)
    lo = np.asarray(state.log_odds)
    mask = keys[:, 0] != EMPTY
    return {tuple(k): v for k, v in zip(keys[mask], lo[mask])}


def make_bag(tmp_path, cfg, n, seed=0, **kw):
    images = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=seed + i)
         for i in range(n)]
    )
    positions, quats = circular_trajectory(n, radius=0.8)
    path = str(tmp_path / "test.db3")
    write_synthetic_bag(path, images, positions, quats, **kw)
    return path, images, positions, quats


def test_bag_replay_matches_direct_pipeline(tmp_path, small_cfg):
    cfg = small_cfg
    path, images, positions, quats = make_bag(tmp_path, cfg, 7, seed=100)
    sm = StreamingMapper(
        cfg, chunk_size=3, initial_capacity=1 << 13, dtype=jnp.float64
    )
    stats = sm.run_bag(path)
    assert stats.pairs == 7
    assert stats.frames_mapped == 7
    assert stats.chunks == 3  # 3 + 3 + 1 (padded)
    assert stats.decode_errors == 0

    direct, _ = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 13,
        dtype=jnp.float64,
    )
    a, b = to_dict(sm.state), to_dict(direct)
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


def test_stream_growth(tmp_path, small_cfg):
    cfg = small_cfg
    path, images, positions, quats = make_bag(tmp_path, cfg, 5, seed=200)
    sm = StreamingMapper(
        cfg, chunk_size=5, initial_capacity=1 << 7, dtype=jnp.float64
    )
    sm.run_bag(path)
    assert sm.stats.grows >= 1
    direct, _ = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 13,
        dtype=jnp.float64,
    )
    a, b = to_dict(sm.state), to_dict(direct)
    assert a.keys() == b.keys()


def test_stream_with_jittered_odometry(tmp_path, small_cfg):
    """Odometry offset within the ±0.1 s slop must still pair every ping."""
    cfg = small_cfg
    path, *_ = make_bag(tmp_path, cfg, 6, seed=300, odom_jitter=0.08)
    sm = StreamingMapper(cfg, chunk_size=4, initial_capacity=1 << 13)
    stats = sm.run_bag(path)
    assert stats.pairs == 6
    assert stats.avg_stamp_skew <= 0.08 + 1e-9 if hasattr(stats, "avg_stamp_skew") else True
    assert stats.summary()["avg_stamp_skew"] <= 0.08 + 1e-9


def test_stream_publish_callback(tmp_path, small_cfg):
    cfg = small_cfg
    path, *_ = make_bag(tmp_path, cfg, 6, seed=400, rate_hz=2.0)
    published = []
    sm = StreamingMapper(
        cfg,
        StreamConfig(publish_rate_hz=1.0),
        chunk_size=2,
        initial_capacity=1 << 13,
        publish=published.append,
    )
    sm.run_bag(path)
    assert published, "publish callback never fired"
    pts, probs = parse_pointcloud2(published[-1])
    assert pts.shape[1] == 3
    assert ((probs > 0) & (probs <= 1)).all()
    # occupied threshold honored: all published probabilities above min_probability
    assert (probs > cfg.min_probability).all()


def test_stream_window_engine_matches_per_ping(tmp_path, small_cfg):
    """Streaming with the windowed batched-apply engine (default) must be
    bit-identical to window=1 per-ping streaming, including under growth
    pressure (tiny initial capacity)."""
    cfg = small_cfg
    path, images, positions, quats = make_bag(tmp_path, cfg, 7, seed=140)
    runs = {}
    for window in (1, 3):
        sm = StreamingMapper(
            cfg, chunk_size=3, window=window, initial_capacity=1 << 7,
            dtype=jnp.float64,
        )
        st = sm.run_bag(path)
        assert st.frames_mapped == 7
        runs[window] = (to_dict(sm.state), st.grows)
    a, b = runs[1][0], runs[3][0]
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]
    assert runs[3][1] > 0  # growth actually exercised under window > 1


def test_stream_unique_budget_growth(tmp_path, small_cfg):
    """Unique-budget overflow mid-stream: the regrow branch must double
    from the budget actually in effect (not the global default) and
    converge to the exact map (review r2: this branch was untested)."""
    cfg = small_cfg
    path, images, positions, quats = make_bag(tmp_path, cfg, 5, seed=150)
    sm = StreamingMapper(
        cfg, chunk_size=5, window=2, initial_capacity=1 << 13,
        dtype=jnp.float64,
    )
    sm._unique_budget = 64  # far below the frames' unique counts
    st = sm.run_bag(path)
    assert st.frames_mapped == 5
    assert st.grows >= 1
    assert sm._unique_budget > 64  # doubled from the effective value
    assert sm._unique_budget <= 1 << 14  # snug growth, no 2^18 jump
    direct, _ = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 13,
        dtype=jnp.float64,
    )
    a, b = to_dict(sm.state), to_dict(direct)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]
