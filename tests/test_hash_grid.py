"""Hashed sparse voxel grid: packing, dedup, bucket insert, growth, golden
parity."""

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.grid.hash import (
    BUCKET_SLOTS,
    EMPTY,
    bucket_lookup,
    extract_classified_hash,
    extract_occupied_hash,
    init_hash_grid,
    insert_unique,
    rehash,
    update_hash_grid,
)
from sonar_3d_reconstruction_tpu.ops.dedup import dedup_frame
from sonar_3d_reconstruction_tpu.ops.packing import (
    EMPTY_HI,
    pack_keys,
    unpack_keys,
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


# ---------------------------------------------------------------------------
# key packing
# ---------------------------------------------------------------------------

def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(-(1 << 19), (1 << 19) - 1, (5000, 3)), jnp.int32)
    hi, lo, in_range = pack_keys(keys)
    assert bool(in_range.all())
    np.testing.assert_array_equal(np.asarray(unpack_keys(hi, lo)), np.asarray(keys))
    # distinct keys -> distinct codes
    codes = set(zip(np.asarray(hi).tolist(), np.asarray(lo).tolist()))
    uniq = {tuple(k) for k in np.asarray(keys)}
    assert len(codes) == len(uniq)


def test_pack_reports_out_of_range():
    keys = jnp.asarray([[0, 0, 1 << 19], [-(1 << 19) - 1, 0, 0], [1, 2, 3]], jnp.int32)
    _, _, in_range = pack_keys(keys)
    np.testing.assert_array_equal(np.asarray(in_range), [False, False, True])


def test_pack_never_produces_empty_marker():
    # the corner that could alias EMPTY_HI must be out of range
    corner = jnp.asarray([[(1 << 19) - 1, (1 << 19) - 1, (1 << 19) - 1]], jnp.int32)
    hi, _, in_range = pack_keys(corner)
    assert not bool(in_range[0])


# ---------------------------------------------------------------------------
# sort-based dedup
# ---------------------------------------------------------------------------

def test_dedup_frame_aggregates():
    keys = jnp.asarray(
        [[1, 2, 3], [4, 5, 6], [1, 2, 3], [1, 2, 3], [7, 8, 9], [4, 5, 6]],
        jnp.int32,
    )
    occ = jnp.asarray([True, False, False, True, False, True])
    valid = jnp.asarray([True, True, True, True, False, True])
    hi, lo, _ = pack_keys(keys)
    rec = dedup_frame(hi, lo, occ, valid, unique_budget=8)
    assert int(rec.n_unique) == 2  # (1,2,3) and (4,5,6); (7,8,9) invalid
    got = {}
    uk = np.asarray(unpack_keys(rec.hi, rec.lo))
    for i in range(8):
        if bool(rec.valid[i]):
            got[tuple(uk[i])] = (int(rec.count[i]), int(rec.n_occ[i]))
    assert got[(1, 2, 3)] == (3, 2)
    assert got[(4, 5, 6)] == (2, 1)


def test_dedup_budget_overflow_reported():
    keys = jnp.asarray([[i, 0, 0] for i in range(10)], jnp.int32)
    hi, lo, _ = pack_keys(keys)
    rec = dedup_frame(hi, lo, jnp.zeros(10, bool), jnp.ones(10, bool), 8)
    assert int(rec.n_unique) == 10
    assert bool(rec.overflowed)


# ---------------------------------------------------------------------------
# bucket table
# ---------------------------------------------------------------------------

def test_insert_then_lookup_roundtrip():
    state = init_hash_grid(1 << 8)
    keys = jnp.asarray([[1, 2, 3], [4, 5, 6], [-7, 0, 9]], jnp.int32)
    hi, lo, _ = pack_keys(keys)
    bucket, found, _, fill = bucket_lookup(state.key_rows, hi, lo)
    assert not bool(found.any())
    key_rows, slots, ovf, n_ins = insert_unique(
        state.key_rows, hi, lo, jnp.ones(3, bool), bucket, fill
    )
    assert not bool(ovf) and int(n_ins) == 3
    assert len(set(np.asarray(slots).tolist())) == 3
    # second lookup finds all three at the same slots
    _, found2, found_slot2, _ = bucket_lookup(key_rows, hi, lo)
    assert bool(found2.all())
    np.testing.assert_array_equal(np.asarray(found_slot2), np.asarray(slots))


def test_insert_bucket_contention_ranks():
    """Keys forced into one bucket (capacity = BUCKET_SLOTS = 1 bucket) fill
    distinct slots in one pass; a (BUCKET_SLOTS+1)-th key overflows."""
    B = BUCKET_SLOTS
    state = init_hash_grid(B)  # exactly one bucket
    keys = jnp.asarray([[i, i, i] for i in range(B)], jnp.int32)
    hi, lo, _ = pack_keys(keys)
    bucket, found, _, fill = bucket_lookup(state.key_rows, hi, lo)
    key_rows, slots, ovf, n_ins = insert_unique(
        state.key_rows, hi, lo, jnp.ones(B, bool), bucket, fill
    )
    assert not bool(ovf) and int(n_ins) == B
    assert sorted(np.asarray(slots).tolist()) == list(range(B))
    # one more key cannot fit
    k9_hi, k9_lo, _ = pack_keys(jnp.asarray([[9999, 9999, 9999]], jnp.int32))
    b9, f9, _, fill9 = bucket_lookup(key_rows, k9_hi, k9_lo)
    _, _, ovf9, _ = insert_unique(
        key_rows, k9_hi, k9_lo, jnp.ones(1, bool), b9, fill9
    )
    assert bool(ovf9)


def test_inactive_keys_do_not_insert():
    state = init_hash_grid(1 << 8)
    keys = jnp.asarray([[1, 1, 1], [2, 2, 2]], jnp.int32)
    hi, lo, _ = pack_keys(keys)
    bucket, _, _, fill = bucket_lookup(state.key_rows, hi, lo)
    key_rows, slots, _, n_ins = insert_unique(
        state.key_rows, hi, lo,
        jnp.asarray([True, False]), bucket, fill,
    )
    assert int(n_ins) == 1
    assert int(np.asarray(slots)[1]) == 1 << 8  # dump value (= capacity)
    assert int((np.asarray(key_rows)[:, :BUCKET_SLOTS] != np.uint32(0xFFFFFFFF)).sum()) == 1


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
        all_stats.append(
            {
                k: int(v)
                for k, v in stats.items()
                if k not in ("overflowed", "unique_overflow", "range_fail")
            }
        )
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
    tiny = init_hash_grid(BUCKET_SLOTS, jnp.float64)  # guaranteed overflow
    st1, stats1 = update_hash_grid(tiny, cand, cfg)
    assert bool(stats1["overflowed"])
    assert bool(st1.poisoned)
    np.testing.assert_array_equal(np.asarray(st1.log_odds), np.asarray(tiny.log_odds))
    st2, stats2 = update_hash_grid(st1, cand, cfg)
    assert bool(stats2["overflowed"])
    np.testing.assert_array_equal(np.asarray(st2.log_odds), np.asarray(tiny.log_odds))


def test_classified_mutually_exclusive_low_min_probability(small_cfg):
    """min_probability < 0.3 puts the occupied threshold below the free
    threshold; classification must stay if/elif-exclusive (reference
    3d_mapper.py:169-176), never double-counting a voxel."""
    cfg = small_cfg.replace(min_probability=0.25)
    g = GoldenMapper(cfg)
    state = init_hash_grid(1 << 13, jnp.float64)
    tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    T = pose_matrix_from_rpy(
        np.asarray(cfg.sonar_position), np.asarray(cfg.sonar_orientation)
    )
    img = synthetic_ping(cfg.image_height, cfg.image_width, seed=21)
    for _ in range(2):  # free log-odds accumulate into the ambiguous band
        cand = backproject_ping(
            jnp.asarray(img), jnp.asarray(T), tables, cfg, jnp.float64
        )
        state, _ = update_hash_grid(state, cand, cfg)
        g.process_ping(img, [0, 0, 0], [0, 0, 0, 1])
    cls = extract_classified_hash(state, cfg)
    gcls = g.map.classified(cfg.min_probability)
    total = sum(len(cls[n][0]) for n in ("free", "occupied", "unknown"))
    assert total == len(g.map.log_odds)  # every voxel exactly once
    for name in ("free", "occupied", "unknown"):
        assert len(cls[name][0]) == len(gcls[name]), name


def test_range_fail_reported_distinctly(small_cfg):
    """Unpackable keys (world offset beyond ±2^19 cells) must flag
    range_fail so hosts don't grow the table forever."""
    cfg = small_cfg
    tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    T = pose_matrix_from_rpy(
        np.asarray(cfg.sonar_position), np.asarray(cfg.sonar_orientation)
    ).copy()
    T[0, 3] = 1e6  # ~1000 km offset: far outside the packable range
    img = synthetic_ping(cfg.image_height, cfg.image_width, seed=22)
    cand = backproject_ping(jnp.asarray(img), jnp.asarray(T), tables, cfg, jnp.float64)
    state = init_hash_grid(1 << 13, jnp.float64)
    new_state, stats = update_hash_grid(state, cand, cfg)
    assert bool(stats["range_fail"])
    assert bool(stats["overflowed"])
    assert not bool(stats["unique_overflow"])
    assert bool(new_state.poisoned)
