"""Hashed sparse voxel grid: insert protocol, growth, golden parity."""

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.grid.hash import (
    EMPTY,
    HashGridState,
    extract_classified_hash,
    extract_occupied_hash,
    find_or_insert,
    init_hash_grid,
    rehash,
    spatial_hash,
    update_hash_grid,
)
from sonar_3d_reconstruction_tpu.golden import GoldenMapper
from sonar_3d_reconstruction_tpu.geometry import (
    pose_matrix_from_quaternion,
    pose_matrix_from_rpy,
)
from sonar_3d_reconstruction_tpu.ops.backproject import (
    backproject_ping,
    build_fan_tables,
)

from conftest import circular_trajectory, synthetic_ping


def test_find_or_insert_roundtrip():
    table = jnp.full((64, 3), EMPTY, jnp.int32)
    keys = jnp.array([[1, 2, 3], [4, 5, 6], [1, 2, 3], [-7, 0, 9]], jnp.int32)
    active = jnp.ones(4, bool)
    table, slots, overflow = find_or_insert(table, keys, active)
    slots = np.asarray(slots)
    assert not bool(overflow)
    assert slots[0] == slots[2]  # duplicates share one slot
    assert len({slots[0], slots[1], slots[3]}) == 3
    # lookup again: same slots, no new inserts
    table2, slots2, _ = find_or_insert(table, keys, active)
    np.testing.assert_array_equal(np.asarray(slots2), slots)
    np.testing.assert_array_equal(np.asarray(table2), np.asarray(table))


def test_find_or_insert_collision_chain():
    """Keys engineered to collide at the same home slot must all resolve."""
    cap = 32
    base = np.array([3, 1, 4], np.int32)
    # collect keys whose hash equals hash(base)
    target = int(spatial_hash(jnp.asarray(base)[None], cap)[0])
    collide = [base]
    z = 5
    while len(collide) < 6:
        k = np.array([3, 1, z], np.int32)
        if int(spatial_hash(jnp.asarray(k)[None], cap)[0]) == target:
            collide.append(k)
        z += 1
    keys = jnp.asarray(np.stack(collide))
    table = jnp.full((cap, 3), EMPTY, jnp.int32)
    table, slots, overflow = find_or_insert(table, keys, jnp.ones(len(collide), bool))
    assert not bool(overflow)
    assert len(set(np.asarray(slots).tolist())) == len(collide)


def test_inactive_candidates_do_not_insert():
    table = jnp.full((16, 3), EMPTY, jnp.int32)
    keys = jnp.array([[1, 1, 1], [2, 2, 2]], jnp.int32)
    table, slots, _ = find_or_insert(table, keys, jnp.array([True, False]))
    assert int(np.asarray(slots)[1]) == 16  # dump slot
    assert int((np.asarray(table)[:, 0] != EMPTY).sum()) == 1


def test_overflow_reported_when_table_full():
    cap = 8
    table = jnp.full((cap, 3), EMPTY, jnp.int32)
    keys = jnp.asarray(
        np.stack([[i, 2 * i + 1, 3 * i + 2] for i in range(12)]).astype(np.int32)
    )
    table, slots, overflow = find_or_insert(table, keys, jnp.ones(12, bool))
    assert bool(overflow)


def test_rehash_preserves_contents(small_cfg):
    cfg = small_cfg
    state = init_hash_grid(1 << 13, jnp.float64)
    img = synthetic_ping(cfg.image_height, cfg.image_width, seed=3)
    tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    T = pose_matrix_from_rpy(
        np.asarray(cfg.sonar_position), np.asarray(cfg.sonar_orientation)
    )
    cand = backproject_ping(jnp.asarray(img), jnp.asarray(T), tables, cfg, jnp.float64)
    state, stats = update_hash_grid(state, cand, cfg)
    assert not bool(stats["overflowed"])
    before = {
        tuple(k): float(v)
        for k, v in zip(np.asarray(state.keys), np.asarray(state.log_odds))
        if k[0] != EMPTY
    }
    grown = rehash(state, new_capacity=1 << 14)
    after = {
        tuple(k): float(v)
        for k, v in zip(np.asarray(grown.keys), np.asarray(grown.log_odds))
        if k[0] != EMPTY
    }
    assert before == after
    assert int(grown.used) == int(state.used)
    assert not bool(grown.poisoned)


def run_hash_device(cfg, images, positions, quats, capacity=1 << 16):
    tables = build_fan_tables(cfg, images[0].shape[0], images[0].shape[1])
    T_mount = pose_matrix_from_rpy(
        np.asarray(cfg.sonar_position), np.asarray(cfg.sonar_orientation)
    )
    state = init_hash_grid(capacity, jnp.float64)
    all_stats = []
    for img, pos, q in zip(images, positions, quats):
        T = pose_matrix_from_quaternion(np.asarray(pos), np.asarray(q)) @ T_mount
        cand = backproject_ping(
            jnp.asarray(img), jnp.asarray(T), tables, cfg, jnp.float64
        )
        state, stats = update_hash_grid(state, cand, cfg)
        assert not bool(stats["overflowed"])
        all_stats.append({k: int(v) for k, v in stats.items() if k != "overflowed"})
    return state, all_stats


def test_hash_matches_golden_multi_ping(small_cfg):
    cfg = small_cfg
    n = 4
    images = [
        synthetic_ping(cfg.image_height, cfg.image_width, seed=300 + i)
        for i in range(n)
    ]
    positions, quats = circular_trajectory(n, radius=0.4)
    state, dstats = run_hash_device(cfg, images, positions, quats)

    g = GoldenMapper(cfg)
    for img, pos, q in zip(images, positions, quats):
        gs = g.process_ping(img, pos, q)

    keys = np.asarray(state.keys)
    lo = np.asarray(state.log_odds)
    dev = {
        tuple(k): float(v) for k, v in zip(keys, lo) if k[0] != EMPTY
    }
    assert set(dev.keys()) == set(g.map.log_odds.keys())
    for k, glo in g.map.log_odds.items():
        assert abs(dev[k] - glo) < 1e-9, (k, dev[k], glo)
    np.testing.assert_allclose(np.asarray(state.min_bounds), g.map.min_bounds, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.max_bounds), g.map.max_bounds, atol=1e-9)

    # extraction parity
    pts, probs = extract_occupied_hash(state, cfg)
    gold = g.map.occupied(cfg.min_probability)
    assert len(pts) == len(gold)
    cls = extract_classified_hash(state, cfg)
    gcls = g.map.classified(cfg.min_probability)
    for name in ("free", "unknown", "occupied"):
        assert len(cls[name][0]) == len(gcls[name])


def test_poisoned_state_skips_frames(small_cfg):
    """After an overflow, subsequent updates leave the state untouched so a
    host driver can grow + replay deterministically."""
    cfg = small_cfg
    img = synthetic_ping(cfg.image_height, cfg.image_width, seed=5)
    tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    T = jnp.asarray(
        pose_matrix_from_rpy(
            np.asarray(cfg.sonar_position), np.asarray(cfg.sonar_orientation)
        )
    )
    cand = backproject_ping(jnp.asarray(img), T, tables, cfg, jnp.float64)
    tiny = init_hash_grid(1 << 4, jnp.float64)  # guaranteed overflow
    st1, stats1 = update_hash_grid(tiny, cand, cfg)
    assert bool(stats1["overflowed"])
    assert bool(st1.poisoned)
    np.testing.assert_array_equal(np.asarray(st1.log_odds), np.asarray(tiny.log_odds))
    st2, stats2 = update_hash_grid(st1, cand, cfg)
    assert bool(stats2["overflowed"])
    np.testing.assert_array_equal(np.asarray(st2.log_odds), np.asarray(tiny.log_odds))
