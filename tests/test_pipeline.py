"""Sequence pipeline (lax.scan over pings) vs the golden oracle."""

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.golden import GoldenMapper
from sonar_3d_reconstruction_tpu.grid.hash import EMPTY
from sonar_3d_reconstruction_tpu.pipeline import (
    batched_sonar_to_world,
    map_ping_sequence,
)

from conftest import circular_trajectory, synthetic_ping


def hash_state_to_dict(state):
    keys = np.asarray(state.keys)
    lo = np.asarray(state.log_odds)
    mask = keys[:, 0] != EMPTY
    return {tuple(k): v for k, v in zip(keys[mask], lo[mask])}


def golden_run(cfg, images, positions, quats):
    g = GoldenMapper(cfg)
    for img, p, q in zip(images, positions, quats):
        g.process_ping(img, p, q)
    return g


def make_sequence(cfg, n, seed=0):
    images = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=seed + i)
         for i in range(n)]
    )
    positions, quats = circular_trajectory(n, radius=0.8)
    return images, positions, quats


def test_scan_matches_golden_parity(small_cfg):
    """Full-sequence scan must hit the 1e-5 occupancy parity bar (BASELINE)."""
    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 8, seed=10)
    state, stats = map_ping_sequence(
        images, positions, quats, cfg,
        initial_capacity=1 << 13, dtype=jnp.float64,
    )
    g = golden_run(cfg, images, positions, quats)

    got = hash_state_to_dict(state)
    assert len(got) == len(g.map.log_odds)
    for key, lo_gold in g.map.log_odds.items():
        p_gold = 1.0 / (1.0 + np.exp(-lo_gold))
        p_got = 1.0 / (1.0 + np.exp(-got[key]))
        assert abs(p_got - p_gold) < 1e-5, (key, p_got, p_gold)


def test_scan_per_frame_stats(small_cfg):
    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 5, seed=20)
    state, stats = map_ping_sequence(
        images, positions, quats, cfg,
        initial_capacity=1 << 13, dtype=jnp.float64,
    )
    g = GoldenMapper(cfg)
    for i in range(5):
        gs = g.process_ping(images[i], positions[i], quats[i])
        assert int(stats["num_occupied"][i]) == gs["num_occupied"]
        assert int(stats["num_free"][i]) == gs["num_free"]
    assert not stats["overflowed"].any()


def test_scan_growth_and_replay(small_cfg):
    """Start under-capacity: the host wrapper must grow + replay and converge
    to the exact same map as an amply-sized run."""
    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 6, seed=30)
    small, _ = map_ping_sequence(
        images, positions, quats, cfg,
        initial_capacity=1 << 7, dtype=jnp.float64,
    )
    big, _ = map_ping_sequence(
        images, positions, quats, cfg,
        initial_capacity=1 << 14, dtype=jnp.float64,
    )
    assert small.keys.shape[0] > 1 << 6
    assert not bool(small.poisoned)
    a, b = hash_state_to_dict(small), hash_state_to_dict(big)
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


def test_scan_resume_from_state(small_cfg):
    """Mapping a sequence in two halves from carried state equals one shot."""
    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 6, seed=40)
    full, _ = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 13,
        dtype=jnp.float64,
    )
    st, _ = map_ping_sequence(
        images[:3], positions[:3], quats[:3], cfg,
        initial_capacity=1 << 13, dtype=jnp.float64,
    )
    st, _ = map_ping_sequence(
        images[3:], positions[3:], quats[3:], cfg, state=st,
        dtype=jnp.float64,
    )
    a, b = hash_state_to_dict(st), hash_state_to_dict(full)
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


def test_batched_pose_chain_matches_scalar(small_cfg):
    from sonar_3d_reconstruction_tpu.geometry import (
        pose_matrix_from_quaternion,
        pose_matrix_from_rpy,
    )

    cfg = small_cfg
    positions, quats = circular_trajectory(7)
    T = batched_sonar_to_world(positions, quats, cfg)
    T_s2b = pose_matrix_from_rpy(
        np.asarray(cfg.sonar_position), np.asarray(cfg.sonar_orientation)
    )
    for i in range(7):
        expect = pose_matrix_from_quaternion(positions[i], quats[i]) @ T_s2b
        np.testing.assert_allclose(T[i], expect, atol=1e-12)


def test_dense_backend_scan(small_cfg):
    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 4, seed=50)
    state, stats = map_ping_sequence(
        images, positions, quats, cfg, backend="dense", dtype=jnp.float64,
    )
    g = golden_run(cfg, images, positions, quats)
    assert int(np.asarray(state.touched).sum()) == len(g.map.log_odds)


def test_batched_window_engine_matches_per_frame(small_cfg):
    """window>1 (batched apply: one table touch per window with per-voxel
    sequential chains) must produce the identical map and stats as window=1."""
    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 7, seed=60)
    ref_state, ref_stats = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 14,
        dtype=jnp.float64, window=1,
    )
    for window in (3, 7):
        st, stats = map_ping_sequence(
            images, positions, quats, cfg, initial_capacity=1 << 14,
            dtype=jnp.float64, window=window,
        )
        a, b = hash_state_to_dict(st), hash_state_to_dict(ref_state)
        assert a.keys() == b.keys(), window
        for k in a:
            assert abs(a[k] - b[k]) < 1e-12, (window, k)
        for key in ("num_occupied", "num_free", "num_candidates"):
            np.testing.assert_array_equal(
                np.asarray(stats[key]), np.asarray(ref_stats[key]),
                err_msg=f"window={window} {key}",
            )


def test_effective_budgets_reported_and_reusable(small_cfg):
    """map_ping_sequence(effective=) reports the settings the sequence
    settled on; re-driving scan_pings_hash with them reproduces the map
    without any overflow (the bench contract)."""
    from sonar_3d_reconstruction_tpu.grid.hash import init_hash_grid
    from sonar_3d_reconstruction_tpu.ops.backproject import build_fan_tables
    from sonar_3d_reconstruction_tpu.pipeline import (
        batched_sonar_to_world,
        scan_pings_hash,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 6, seed=62)
    eff = {}
    ref, _ = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 10,
        dtype=jnp.float64, window=3, effective=eff,
    )
    assert set(eff) == {
        "unique_budget", "batch_budget", "capacity", "fan_cap",
        "window_cap", "free_cap",
    }
    assert eff["capacity"] == ref.key_hi.shape[0]
    assert eff["free_cap"] >= 0

    tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    T = jnp.asarray(batched_sonar_to_world(positions, quats, cfg),
                    jnp.float64)
    st = init_hash_grid(eff["capacity"], jnp.float64)
    st, stats = scan_pings_hash(
        st, jnp.asarray(images), T, tables=tables, cfg=cfg,
        dtype=jnp.float64, unique_budget=eff["unique_budget"],
        window=3, batch_budget=eff["batch_budget"],
    )
    assert not bool(np.asarray(stats["overflowed"]).any())
    a, b = hash_state_to_dict(st), hash_state_to_dict(ref)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]


def test_batched_window_growth_replay(small_cfg):
    """Batched engine under capacity pressure: all-or-nothing batch
    rejection + host growth must still converge to the exact map."""
    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 6, seed=61)
    small, _ = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 7,
        dtype=jnp.float64, window=3,
    )
    big, _ = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 14,
        dtype=jnp.float64, window=1,
    )
    a, b = hash_state_to_dict(small), hash_state_to_dict(big)
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


def test_insert_budget_snug_and_overflow(small_cfg):
    """Host-gated insert budget (grid/hash.plan_insert budget slicing):
    a snug per-window budget list reproduces the map bit-for-bit; an
    undersized budget rejects the batch all-or-nothing and reports
    insert_overflow + the measured batch_n_need for host sizing."""
    from sonar_3d_reconstruction_tpu.grid.hash import init_hash_grid
    from sonar_3d_reconstruction_tpu.ops.backproject import build_fan_tables
    from sonar_3d_reconstruction_tpu.pipeline import (
        batched_sonar_to_world,
        scan_pings_hash,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 6, seed=63)
    eff = {}
    ref, ref_stats = map_ping_sequence(
        images, positions, quats, cfg, dtype=jnp.float64, window=3,
        effective=eff,
    )
    tables = build_fan_tables(
        cfg, cfg.image_height, cfg.image_width, fan_cap=eff["fan_cap"]
    )
    T = jnp.asarray(batched_sonar_to_world(positions, quats, cfg),
                    jnp.float64)

    def run(insert_budget):
        st = init_hash_grid(eff["capacity"], jnp.float64)
        return scan_pings_hash(
            st, jnp.asarray(images), T, tables=tables, cfg=cfg,
            dtype=jnp.float64, unique_budget=eff["unique_budget"], window=3,
            batch_budget=eff["batch_budget"], insert_budget=insert_budget,
        )

    # measure the per-window requirement, then re-run snug (cold + warm)
    st0, stats0 = run(None)
    assert not bool(np.asarray(stats0["overflowed"]).any())
    need = np.asarray(stats0["batch_n_need"]).astype(np.int64)
    win_need = need.reshape(-1, 3).max(axis=1)
    assert win_need[0] > 0
    snug = [int(win_need[0]), int(max(win_need[1:].max(), 1))]
    st1, stats1 = run(snug)
    assert not bool(np.asarray(stats1["overflowed"]).any())
    a, b = hash_state_to_dict(st1), hash_state_to_dict(st0)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12, k
    for key in ("num_occupied", "num_free"):
        np.testing.assert_array_equal(
            np.asarray(stats1[key]), np.asarray(ref_stats[key]), key
        )

    # one short of the first window's need: all-or-nothing rejection with
    # cause attribution, nothing written
    st2, stats2 = run(int(win_need[0]) - 1)
    assert bool(np.asarray(stats2["overflowed"]).all())
    assert bool(np.asarray(stats2["insert_overflow"])[:3].any())
    assert int(np.asarray(st2.used)) == 0
    assert bool(np.asarray(st2.poisoned))
    np.testing.assert_array_equal(
        np.asarray(stats2["batch_n_need"])[:3], need[:3]
    )


def test_dedup_lane_budget_decoupled(small_cfg):
    """records-side decoupling (ops/records.frame_records dedup_lane_budget):
    a snug unique budget + explicit compaction lane budget reproduces the
    map bit-for-bit; an undersized lane budget reports through the
    unique-overflow channel (all-or-nothing)."""
    from sonar_3d_reconstruction_tpu.grid.hash import init_hash_grid
    from sonar_3d_reconstruction_tpu.ops.backproject import build_fan_tables
    from sonar_3d_reconstruction_tpu.pipeline import (
        batched_sonar_to_world,
        scan_pings_hash,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 6, seed=64)
    eff = {}
    ref, ref_stats = map_ping_sequence(
        images, positions, quats, cfg, dtype=jnp.float64, window=3,
        effective=eff,
    )
    tables = build_fan_tables(
        cfg, cfg.image_height, cfg.image_width, fan_cap=eff["fan_cap"]
    )
    T = jnp.asarray(batched_sonar_to_world(positions, quats, cfg),
                    jnp.float64)
    max_frame = int(
        (np.asarray(ref_stats["num_occupied"])
         + np.asarray(ref_stats["num_free"])).max()
    )
    max_valid = int(np.asarray(ref_stats["num_candidates"]).max())
    snug_u = max_frame + 32
    dlb = max(max_valid + 64, snug_u)

    def run(u, lane):
        st = init_hash_grid(eff["capacity"], jnp.float64)
        return scan_pings_hash(
            st, jnp.asarray(images), T, tables=tables, cfg=cfg,
            dtype=jnp.float64, unique_budget=u, window=3,
            batch_budget=eff["batch_budget"], dedup_lane_budget=lane,
        )

    st1, stats1 = run(snug_u, dlb)
    assert not bool(np.asarray(stats1["overflowed"]).any())
    a, b = hash_state_to_dict(st1), hash_state_to_dict(ref)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k
    for key in ("num_occupied", "num_free", "num_candidates"):
        np.testing.assert_array_equal(
            np.asarray(stats1[key]), np.asarray(ref_stats[key]), key
        )

    # lane budget below the frames' valid-candidate counts: rejected via
    # the unique-overflow channel (growth's doubling remedy raises both)
    st2, stats2 = run(snug_u, max(snug_u, max_valid // 2))
    assert bool(np.asarray(stats2["overflowed"]).any())
    assert bool(np.asarray(stats2["unique_overflow"]).any())


def test_state_backend_mismatch_raises(small_cfg):
    """Resuming a saved brick map without backend="brick" (or vice versa)
    must fail fast: the record key layout is chosen by the backend string
    while the apply dispatches on the state type — a silent mismatch would
    write voxels through the wrong key interpretation."""
    import pytest

    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
    from sonar_3d_reconstruction_tpu.grid.hash import init_hash_grid

    img = synthetic_ping(small_cfg.image_height, small_cfg.image_width)
    positions, quats = circular_trajectory(1)
    brick_state = init_brick_grid(256, jnp.float32)
    with pytest.raises(ValueError, match="does not match backend"):
        map_ping_sequence(
            img[None], positions, quats, small_cfg, state=brick_state
        )
    hash_state = init_hash_grid(1 << 10, jnp.float32)
    with pytest.raises(ValueError, match="does not match backend"):
        map_ping_sequence(
            img[None], positions, quats, small_cfg, state=hash_state,
            backend="brick",
        )


def test_empty_sequence_respects_backend(small_cfg):
    """P == 0 must return a state matching the requested backend (a dense
    request used to get a HashGridState) and still reject unknown
    backends."""
    import pytest

    from sonar_3d_reconstruction_tpu.grid.dense import DenseGridState

    empty = np.zeros((0, small_cfg.image_height, small_cfg.image_width),
                     np.uint8)
    pos = np.zeros((0, 3))
    qs = np.zeros((0, 4))
    st, stats = map_ping_sequence(empty, pos, qs, small_cfg,
                                  backend="dense")
    assert isinstance(st, DenseGridState)
    assert stats == {}
    with pytest.raises(ValueError, match="unknown backend"):
        map_ping_sequence(empty, pos, qs, small_cfg, backend="octreee")


def test_hash_window_zero_sanitized(small_cfg):
    """window=0 used to hit range(0, P, 0); it must behave as window=1
    (same sanitation as the brick branch)."""
    img = synthetic_ping(small_cfg.image_height, small_cfg.image_width,
                         seed=5)
    positions, quats = circular_trajectory(2)
    a, _ = map_ping_sequence(np.stack([img, img]), positions, quats,
                             small_cfg, window=0, dtype=jnp.float64)
    b, _ = map_ping_sequence(np.stack([img, img]), positions, quats,
                             small_cfg, window=1, dtype=jnp.float64)
    assert hash_state_to_dict(a) == hash_state_to_dict(b)
