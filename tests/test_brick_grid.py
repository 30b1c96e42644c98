"""Brick backend (sparse hash of dense voxel bricks, grid/brick.py):
exactness vs the golden oracle and the voxel-hash backend, growth/replay,
touched-bit semantics, extraction and queries."""

import numpy as np
import jax.numpy as jnp
import pytest

from sonar_3d_reconstruction_tpu.golden import GoldenMapper
from sonar_3d_reconstruction_tpu.ops.packing import EMPTY_HI, unpack_brick_keys
from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence

from conftest import circular_trajectory, synthetic_ping
from test_pipeline import golden_run, hash_state_to_dict, make_sequence


def brick_state_to_dict(state):
    """{(kx,ky,kz): log_odds} over TOUCHED voxels of a BrickGridState."""
    hi = np.asarray(state.key_hi)
    lo = np.asarray(state.key_lo)
    occ = hi != np.uint32(EMPTY_HI)
    if not occ.any():  # numpy reshape(0, -1) rejects empty arrays
        return {}
    rows = np.asarray(state.log_odds)[occ]
    touched = np.asarray(state.touched)[occ]
    vol = state.brick_volume
    bb = state.brick_bits
    base = np.asarray(
        unpack_brick_keys(jnp.asarray(hi[occ]), jnp.asarray(lo[occ]), bb)
    )
    per = min(32, vol)
    bits = ((touched[:, :, None] >> np.arange(per, dtype=np.uint32)) & 1)
    bits = bits.astype(bool).reshape(len(rows), -1)[:, :vol]
    out = {}
    b = 1 << bb
    off = np.arange(vol)
    offs = np.stack([off >> (2 * bb), (off >> bb) & (b - 1), off & (b - 1)],
                    axis=-1)
    for i in range(len(rows)):
        for v in np.nonzero(bits[i])[0]:
            key = tuple(base[i] + offs[v])
            out[key] = rows[i, v]
    return out


def test_brick_matches_golden(small_cfg):
    """Multi-ping float64 run through backend='brick' must reproduce the
    golden oracle exactly (same bar as the voxel hash backend)."""
    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 7, seed=310)
    state, stats = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=3,
    )
    g = golden_run(cfg, images, positions, quats)
    got = brick_state_to_dict(state)
    assert len(got) == len(g.map.log_odds)
    for key, lo_gold in g.map.log_odds.items():
        assert abs(got[key] - lo_gold) < 1e-12, key
    # per-frame stats vs golden
    g2 = GoldenMapper(cfg)
    for i, (img, p, q) in enumerate(zip(images, positions, quats)):
        s = g2.process_ping(img, p, q)
        assert int(stats["num_occupied"][i]) == s["num_occupied"]
        assert int(stats["num_free"][i]) == s["num_free"]
    assert int(state.used) == len(g.map.log_odds)


def test_brick_matches_hash_backend(small_cfg):
    """Brick and voxel-hash backends are bit-identical in float64: same
    voxel set, same log-odds, same bounds."""
    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 6, seed=320)
    hs, hstats = map_ping_sequence(
        images, positions, quats, cfg, dtype=jnp.float64, window=3,
    )
    bs, bstats = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=3,
    )
    a, b = brick_state_to_dict(bs), hash_state_to_dict(hs)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k
    np.testing.assert_allclose(
        np.asarray(bs.min_bounds), np.asarray(hs.min_bounds)
    )
    np.testing.assert_allclose(
        np.asarray(bs.max_bounds), np.asarray(hs.max_bounds)
    )
    for key in ("num_occupied", "num_free", "num_candidates"):
        np.testing.assert_array_equal(
            np.asarray(bstats[key]), np.asarray(hstats[key]), err_msg=key
        )


def test_brick_window_sizes_equivalent(small_cfg):
    """window=1 per-ping apply and window=5 batched apply agree exactly
    (rank-free dense chain evaluation preserves frame order)."""
    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 5, seed=330)
    s1, _ = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=1,
    )
    s5, _ = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=5,
    )
    a, b = brick_state_to_dict(s1), brick_state_to_dict(s5)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]


def test_brick_growth_replay(small_cfg):
    """Capacity pressure: all-or-nothing rejection + rehash growth must
    converge to the exact same map as an amply-sized run."""
    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 5, seed=340)
    tiny, _ = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        state=init_brick_grid(1 << 7, jnp.float64), dtype=jnp.float64,
        window=3,
    )
    big, _ = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=3,
    )
    a, b = brick_state_to_dict(tiny), brick_state_to_dict(big)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]


def test_brick_budget_overflow_and_snug(small_cfg):
    """An undersized brick budget rejects windows all-or-nothing and
    reports batch_overflow + measured batch_n_bricks; a snug budget from
    those measurements reproduces the map exactly."""
    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
    from sonar_3d_reconstruction_tpu.ops.backproject import build_fan_tables
    from sonar_3d_reconstruction_tpu.pipeline import (
        batched_sonar_to_world,
        scan_pings_brick,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 6, seed=350)
    ref, ref_stats = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=3,
    )
    tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    T = jnp.asarray(batched_sonar_to_world(positions, quats, cfg),
                    jnp.float64)
    cap = ref.capacity

    def run(brick_budget, lane_budget=None, insert_budget=None):
        st = init_brick_grid(cap, jnp.float64)
        return scan_pings_brick(
            st, jnp.asarray(images), T, tables=tables, cfg=cfg,
            dtype=jnp.float64, window=3, brick_budget=brick_budget,
            lane_budget=lane_budget, insert_budget=insert_budget,
        )

    # undersized: every window rejected, cause attributed
    st_bad, stats_bad = run(brick_budget=8)
    assert bool(np.asarray(stats_bad["overflowed"]).all())
    assert bool(np.asarray(stats_bad["batch_overflow"]).any())
    assert int(st_bad.used) == 0

    # snug: measured requirement + a little headroom, bit-identical result
    need_b = int(np.asarray(ref_stats["batch_n_bricks"]).max())
    need_l = int(np.asarray(ref_stats["batch_n_lanes"]).max())
    need_i = int(np.asarray(ref_stats["batch_n_need"]).max())
    st_snug, stats_snug = run(
        brick_budget=need_b + 8, lane_budget=need_l + 8,
        insert_budget=need_i + 8,
    )
    assert not bool(np.asarray(stats_snug["overflowed"]).any())
    a, b = brick_state_to_dict(st_snug), brick_state_to_dict(ref)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]

    # undersized insert budget: rejected with insert_overflow attributed
    _, stats_ins = run(brick_budget=need_b + 8, insert_budget=4)
    assert bool(np.asarray(stats_ins["insert_overflow"]).any())
    assert bool(np.asarray(stats_ins["overflowed"]).all())


def test_brick_extraction_and_queries(small_cfg):
    """extract_occupied/classified and point queries on the brick backend
    match the golden oracle (and the hash backend's extraction)."""
    from sonar_3d_reconstruction_tpu.grid.brick import (
        extract_classified_brick,
        extract_occupied_brick,
        query_log_odds_brick,
        query_probability_brick,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 5, seed=360)
    bs, _ = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=3,
    )
    g = golden_run(cfg, images, positions, quats)

    pts, probs = extract_occupied_brick(bs, cfg)
    gold = g.map.occupied(cfg.min_probability)
    got = {tuple(np.round(p, 9)): pr for p, pr in zip(pts, probs)}
    assert len(got) == len(gold)
    for gp, gpr in gold:
        key = tuple(np.round(gp, 9))
        assert key in got
        assert abs(got[key] - gpr) < 1e-12

    cls = extract_classified_brick(bs, cfg)
    gcls = g.map.classified(cfg.min_probability)
    for name in ("free", "occupied", "unknown"):
        pts_n, probs_n = cls[name]
        assert len(pts_n) == len(gcls[name]), name
        got_n = {tuple(np.round(p, 9)): pr for p, pr in zip(pts_n, probs_n)}
        for gp, gpr in gcls[name]:
            assert abs(got_n[tuple(np.round(gp, 9))] - gpr) < 1e-12

    # point queries: golden parity on touched voxels + 0.5 on misses
    items = list(g.map.log_odds.items())[:40]
    qpts = np.array([
        (np.array(k, np.float64) + 0.5) * cfg.voxel_resolution
        for k, _ in items
    ])
    lo = query_log_odds_brick(bs, qpts, cfg)
    for (k, lo_gold), got_lo in zip(items, lo):
        assert abs(got_lo - lo_gold) < 1e-12
    p_miss = query_probability_brick(
        bs, np.array([[500.0, 500.0, 500.0]]), cfg
    )
    assert p_miss[0] == pytest.approx(0.5)


def test_brick_sizes_match_golden(small_cfg):
    """2^3 and 8^3 bricks (the non-default layouts) reproduce the golden
    map exactly too — exercises the parameterized packing end to end."""
    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
    from sonar_3d_reconstruction_tpu.ops.backproject import build_fan_tables
    from sonar_3d_reconstruction_tpu.pipeline import (
        batched_sonar_to_world,
        scan_pings_brick,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 4, seed=305)
    g = golden_run(cfg, images, positions, quats)
    tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    T = jnp.asarray(batched_sonar_to_world(positions, quats, cfg),
                    jnp.float64)
    for bb in (1, 3):
        st = init_brick_grid(1 << 13, jnp.float64, brick_bits=bb)
        st, stats = scan_pings_brick(
            st, jnp.asarray(images), T, tables=tables, cfg=cfg,
            dtype=jnp.float64, window=2,
        )
        assert not bool(np.asarray(stats["overflowed"]).any()), bb
        got = brick_state_to_dict(st)
        assert len(got) == len(g.map.log_odds), bb
        for key, lo_gold in g.map.log_odds.items():
            assert abs(got[key] - lo_gold) < 1e-12, (bb, key)
        assert int(st.used) == len(g.map.log_odds)


def test_brick_mapper_api(small_cfg):
    """SonarMapper(backend='brick'): per-ping processing, growth, batch
    API, extraction and queries behave identically to the hash backend."""
    from sonar_3d_reconstruction_tpu.models import SonarMapper

    cfg = small_cfg
    mb = SonarMapper(cfg, backend="brick", initial_capacity=1 << 11,
                     dtype=jnp.float64)
    mh = SonarMapper(cfg, backend="hash", initial_capacity=1 << 13,
                     dtype=jnp.float64)
    images, positions, quats = make_sequence(cfg, 3, seed=380)
    for i in range(3):
        sb = mb.process_sonar_image(images[i], positions[i], quats[i])
        sh = mh.process_sonar_image(images[i], positions[i], quats[i])
        for k in ("num_occupied", "num_free", "num_voxels"):
            assert sb[k] == sh[k], (i, k)
    rb, rh = mb.get_point_cloud(), mh.get_point_cloud()
    assert rb["num_occupied"] == rh["num_occupied"]
    assert rb["num_voxels"] == rh["num_voxels"]
    b = {tuple(np.round(p, 9)) for p in rb["points"]}
    h = {tuple(np.round(p, 9)) for p in rh["points"]}
    assert b == h
    q = np.asarray(rh["points"][:16])
    np.testing.assert_array_equal(
        mb.query_probabilities(q), mh.query_probabilities(q)
    )
    # batch API continues on the same state
    more = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=390 + i)
         for i in range(2)]
    )
    p2, q2 = circular_trajectory(2, radius=0.5)
    mb.map_sequence(more, p2, q2, window=2)
    mh.map_sequence(more, p2, q2, window=2)
    assert mb.num_voxels == mh.num_voxels
    mb.reset_map()
    assert mb.num_voxels == 0


def test_brick_checkpoint_roundtrip(tmp_path, small_cfg):
    """save_map on a brick state restores into BOTH backends with identical
    voxels/values/bounds (the snapshot format is layout-independent)."""
    from sonar_3d_reconstruction_tpu.io.checkpoint import (
        load_map, load_map_brick, save_map,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 4, seed=395)
    bs, _ = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=2,
    )
    path = str(tmp_path / "brick_map.npz")
    save_map(path, bs, cfg)

    rb, cfg_b = load_map_brick(path, dtype=jnp.float64)
    a, b = brick_state_to_dict(rb), brick_state_to_dict(bs)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]
    np.testing.assert_array_equal(
        np.asarray(rb.min_bounds), np.asarray(bs.min_bounds)
    )
    assert int(rb.used) == int(bs.used)
    assert cfg_b.voxel_resolution == cfg.voxel_resolution

    rh, _ = load_map(path, dtype=jnp.float64)
    c = hash_state_to_dict(rh)
    assert c.keys() == b.keys()
    for k in c:
        assert c[k] == b[k]


def test_brick_untouched_voxel_in_touched_brick(small_cfg):
    """A never-updated voxel inside a brick that has other updates must
    answer p=0.5 and stay out of classified extraction (the reference dict
    only contains updated keys, 3d_mapper.py:34)."""
    from sonar_3d_reconstruction_tpu.grid.brick import (
        extract_classified_brick,
        query_probability_brick,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 3, seed=370)
    bs, _ = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=3,
    )
    g = golden_run(cfg, images, positions, quats)
    n_cls = sum(
        len(v[0]) for v in extract_classified_brick(bs, cfg).values()
    )
    assert n_cls == len(g.map.log_odds) == int(bs.used)
    # find an untouched voxel adjacent to a touched one (same brick likely)
    k0 = next(iter(g.map.log_odds))
    for d in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
        cand = (k0[0] + d[0], k0[1] + d[1], k0[2] + d[2])
        if cand not in g.map.log_odds:
            pt = (np.array(cand, np.float64) + 0.5) * cfg.voxel_resolution
            assert query_probability_brick(bs, [pt], cfg)[0] == pytest.approx(0.5)
            break


# ---------------------------------------------------------------------------
# Compact box-key engine (single-u32 sort keys; ops/packing box-key section)
# ---------------------------------------------------------------------------


def test_compute_window_boxes_gate():
    """The host gate emits brick-aligned per-window origins when the extent
    fits a u32 key and declines (None) when it cannot."""
    from sonar_3d_reconstruction_tpu.ops.packing import compute_window_boxes

    pos = np.stack([0.1 * np.arange(8), np.zeros(8), np.zeros(8)], -1)
    out = compute_window_boxes(pos, 5.0, 0.1, window=4, brick_bits=2,
                               frame_bits=2)
    assert out is not None
    mins, bits = out
    assert mins.shape == (2, 3) and mins.dtype == np.int32
    assert (mins % 4 == 0).all()  # brick-aligned
    assert sum(bits) + 6 + 2 <= 31
    # each window box must cover position +- max_range
    for wi, w in enumerate(range(0, 8, 4)):
        seg = pos[w:w + 4]
        lo = np.floor((seg.min(0) - 5.0) / 0.1)
        hi = np.floor((seg.max(0) + 5.0) / 0.1)
        span = (np.array([1 << b for b in bits]) << 2)
        assert (mins[wi] <= lo).all() and (mins[wi] + span > hi).all()

    # a kilometer-long window extent cannot fit -> wide-path fallback
    far = np.stack([1000.0 * np.arange(8), np.zeros(8), np.zeros(8)], -1)
    assert compute_window_boxes(far, 5.0, 0.01, window=8, brick_bits=2,
                                frame_bits=3) is None
    # out of the global packable range -> fallback
    off = pos + np.array([0.1 * (1 << 20), 0.0, 0.0])
    assert compute_window_boxes(off, 5.0, 0.1, window=4, brick_bits=2,
                                frame_bits=2) is None


def test_brick_compact_engine_bit_equals_wide(small_cfg):
    """The compact box-key engine is bit-identical to the two-word engine
    (same voxels, same float64 log-odds, same stats) — map_ping_sequence
    auto-engages it; forcing boxes=None reproduces the wide path."""
    from sonar_3d_reconstruction_tpu.pipeline import (
        _map_ping_sequence_brick,
        batched_sonar_to_world,
        build_fan_tables,
    )
    from sonar_3d_reconstruction_tpu.ops.backproject import (
        required_fan_cap,
        required_window_cap,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 7, seed=333)
    eff = {}
    bs, bstats = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=3, effective=eff,
    )
    assert eff["box_bits"] is not None  # compact engine actually engaged

    R, B = cfg.image_height, cfg.image_width
    tables = build_fan_tables(
        cfg, R, B, fan_cap=required_fan_cap(images, cfg, R),
        window_cap=required_window_cap(images, cfg, R),
    )
    T = batched_sonar_to_world(positions, quats, cfg)
    ws, wstats = _map_ping_sequence_brick(
        jnp.asarray(images), jnp.asarray(T, jnp.float64), cfg,
        tables=tables, state=None, dtype=jnp.float64, window=3,
        unique_budget=None, effective=None, max_grow_retries=12,
        sonar_positions=None,  # disables the compact gate
    )
    a, b = brick_state_to_dict(bs), brick_state_to_dict(ws)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k
    for k in bstats:
        np.testing.assert_array_equal(
            np.asarray(bstats[k]), np.asarray(wstats[k]), err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(bs.min_bounds), np.asarray(ws.min_bounds)
    )
    np.testing.assert_array_equal(
        np.asarray(bs.max_bounds), np.asarray(ws.max_bounds)
    )


def test_brick_compact_growth_replay(small_cfg):
    """Growth/replay (unique + brick budgets, capacity) works through the
    compact engine: tiny initial budgets must converge to the same map."""
    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 6, seed=340)
    eff = {}
    big, _ = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=3, effective=eff,
    )
    assert eff["box_bits"] is not None
    small, sstats = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float64, window=3, unique_budget=256,
        state=init_brick_grid(1 << 7, jnp.float64),
    )
    assert not np.asarray(sstats["overflowed"]).any()
    a, b = brick_state_to_dict(big), brick_state_to_dict(small)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k


def test_unique_overflow_reports_growable_cause_not_pack_overflow(small_cfg):
    """A frame whose dedup overflowed the unique budget carries GARBAGE
    adjacent-difference counts in its truncated record tail (every lane is
    marked valid via n_unique = n+1).  The apply must report the growable
    ``unique_overflow`` cause and must NOT assert the fatal
    ``pack_overflow`` from the garbage — the host's cause priority checks
    pack first, so a spurious flag turns a recoverable overflow into a
    raise (bit the bench's snug streaming budgets)."""
    import jax.numpy as jnp

    from sonar_3d_reconstruction_tpu.grid.brick import (
        apply_brick_records_batched,
        apply_brick_records_compact,
        init_brick_grid,
    )
    from sonar_3d_reconstruction_tpu.ops.dedup import (
        CompactRecords,
        UniqueRecords,
    )
    from sonar_3d_reconstruction_tpu.ops.packing import (
        EMPTY32,
        EMPTY_HI,
        pack_box_keys,
        pack_brick_keys,
    )
    from sonar_3d_reconstruction_tpu.ops.records import FrameAux

    cfg = small_cfg
    U, B = 4, 2
    n = 100000  # pretend lattice size; n+1 marks "overflowed"
    keys = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                       jnp.int32)
    garbage = jnp.asarray([70000, 1, -3, 80000], jnp.int32)  # > 0xFFFF

    def aux():
        return FrameAux(
            cmin=jnp.zeros((B, 3), jnp.float32),
            cmax=jnp.zeros((B, 3), jnp.float32),
            range_fail=jnp.zeros((B,), bool),
            n_valid=jnp.zeros((B,), jnp.int32),
        )

    clean = jnp.asarray([1, 1, 2, 1], jnp.int32)

    def stack(x):
        return jnp.stack([x, x])

    def counts():
        # frame 0: garbage (it overflowed); frame 1: benign
        return jnp.stack([garbage, clean])

    # wide engine
    hi, lo, _ = pack_brick_keys(keys, 2)
    recs = UniqueRecords(
        hi=stack(hi), lo=stack(lo), count=counts(),
        n_occ=stack(jnp.zeros(U, jnp.int32)),
        valid=stack(jnp.ones(U, bool)),
        n_unique=jnp.asarray([n + 1, 2], jnp.int32),  # frame 0 overflowed
    )
    st = init_brick_grid(1 << 8, jnp.float32)
    _, stats = apply_brick_records_batched(st, recs, aux(), cfg)
    assert bool(stats["unique_overflow"][0])
    assert bool(stats["overflowed"][0])
    assert not bool(stats["pack_overflow"][0]), \
        "garbage counts of an overflowed frame must not assert pack_overflow"

    # compact engine: the payload is width-limited by construction, so the
    # garbage-count hazard cannot arise; dedup reports pack_fail directly
    box_min = jnp.asarray([-8, -8, -8], jnp.int32)
    bkey, in_box = pack_box_keys(keys, box_min, (3, 3, 3), 2)
    assert bool(jnp.all(in_box))
    crecs = CompactRecords(
        key=stack(bkey),
        payload=stack((clean.astype(jnp.uint32) << 16)),
        valid=stack(jnp.ones(U, bool)),
        n_unique=jnp.asarray([n + 1, 2], jnp.int32),
        pack_fail=jnp.asarray([False, False]),
    )
    _, cstats = apply_brick_records_compact(
        st, crecs, aux(), cfg, box_min, (3, 3, 3)
    )
    assert bool(cstats["unique_overflow"][0])
    assert not bool(cstats["pack_overflow"][0])

    # a dedup-asserted pack_fail must be fatal through the compact engine
    fail_recs = crecs._replace(
        n_unique=jnp.asarray([2, 2], jnp.int32),
        pack_fail=jnp.asarray([True, False]),
    )
    _, pstats = apply_brick_records_compact(
        st, fail_recs, aux(), cfg, box_min, (3, 3, 3)
    )
    assert bool(pstats["pack_overflow"][0])
    assert bool(pstats["overflowed"][0])

    # a NON-overflowed frame with a real 2^16+ count must still be fatal
    ok_recs = recs._replace(n_unique=jnp.asarray([2, 2], jnp.int32))
    _, fstats = apply_brick_records_batched(st, ok_recs, aux(), cfg)
    assert bool(fstats["pack_overflow"][0])


def test_brick_row_dense_mode_bit_equals_scalar(small_cfg):
    """dense_mode='row' (per-voxel (B,)-row scatter at vox_budget index
    entries) and dense_mode='bfv' ((brick, frame, offset) sort order,
    frame-mid dense buffer) are bit-identical to dense_mode='scalar'
    (per-record u32 scatter at Lb entries) — states, bounds, and every
    stat incl. the bfv popcount-derived batch_n_unique; a snug vox_budget
    reproduces row mode and a one-too-small budget reports through the
    growable batch_overflow channel."""
    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
    from sonar_3d_reconstruction_tpu.ops.backproject import (
        build_fan_tables,
        required_fan_cap,
        required_window_cap,
    )
    from sonar_3d_reconstruction_tpu.ops.packing import compute_window_boxes
    from sonar_3d_reconstruction_tpu.pipeline import (
        batched_sonar_to_world,
        scan_pings_brick,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 7, seed=77)
    R, Bw = cfg.image_height, cfg.image_width
    tables = build_fan_tables(
        cfg, R, Bw, fan_cap=required_fan_cap(images, cfg, R),
        window_cap=required_window_cap(images, cfg, R),
    )
    T = batched_sonar_to_world(positions, quats, cfg)
    window = 3
    boxes = compute_window_boxes(
        T[:, :3, 3], cfg.max_range, cfg.voxel_resolution, window, 2,
        frame_bits=max(1, (window - 1).bit_length()),
    )
    assert boxes is not None

    def run(**kw):
        st, stats = scan_pings_brick(
            init_brick_grid(1 << 12, jnp.float64), jnp.asarray(images),
            jnp.asarray(T, jnp.float64), tables=tables, cfg=cfg,
            dtype=jnp.float64, window=window, boxes=boxes, **kw,
        )
        return st, stats

    outs = {}
    for mode in ("scalar", "bfv", "row"):
        st, stats = run(dense_mode=mode)
        assert not bool(np.asarray(stats["overflowed"]).any()), mode
        outs[mode] = (brick_state_to_dict(st), stats, st)
    a = outs["scalar"][0]
    for mode in ("bfv", "row"):
        b = outs[mode][0]
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == b[k], (mode, k)
        for k in outs["scalar"][1]:
            np.testing.assert_array_equal(
                np.asarray(outs["scalar"][1][k]),
                np.asarray(outs[mode][1][k]),
                err_msg=f"{mode}:{k}",
            )
        np.testing.assert_array_equal(
            np.asarray(outs["scalar"][2].min_bounds),
            np.asarray(outs[mode][2].min_bounds),
        )

    # snug vox budget (exactly the measured requirement) stays exact
    uv = int(np.asarray(outs["row"][1]["batch_n_unique"]).max())
    st, stats = run(dense_mode="row", vox_budget=uv)
    assert not bool(np.asarray(stats["overflowed"]).any())
    c = brick_state_to_dict(st)
    assert c.keys() == a.keys()
    for k in a:
        assert a[k] == c[k], k

    # one less than the first window's requirement: growable batch_overflow
    uv0 = int(np.asarray(outs["row"][1]["batch_n_unique"])[0])
    _, ostats = run(dense_mode="row", vox_budget=uv0 - 1)
    assert bool(ostats["batch_overflow"][0])
    assert bool(ostats["overflowed"][0])
    assert not bool(ostats["unique_overflow"][0])


def test_brick_row_mode_lane_budget_below_window_overflows_gracefully(
    small_cfg,
):
    """lane_budget < window in dense_mode='row' used to slice negatively in
    the row-assembly shifts and crash at trace time; it must degrade to the
    normal growable overflow contract like the scalar path."""
    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
    from sonar_3d_reconstruction_tpu.ops.backproject import build_fan_tables
    from sonar_3d_reconstruction_tpu.ops.packing import compute_window_boxes
    from sonar_3d_reconstruction_tpu.pipeline import (
        batched_sonar_to_world,
        scan_pings_brick,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 3, seed=31)
    tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    T = batched_sonar_to_world(positions, quats, cfg)
    window = 3
    boxes = compute_window_boxes(
        T[:, :3, 3], cfg.max_range, cfg.voxel_resolution, window, 2,
        frame_bits=max(1, (window - 1).bit_length()),
    )
    assert boxes is not None
    for mode in ("row", "bfv"):
        st, stats = scan_pings_brick(
            init_brick_grid(1 << 12, jnp.float64), jnp.asarray(images),
            jnp.asarray(T, jnp.float64), tables=tables, cfg=cfg,
            dtype=jnp.float64, window=window, boxes=boxes,
            dense_mode=mode, lane_budget=2,
        )
        assert bool(np.asarray(stats["overflowed"]).any()), mode
        assert bool(np.asarray(st.poisoned)), mode


def test_brick_records_batch_bit_equals_sequential(small_cfg):
    """records_batch > 1 (vmapped per-frame records groups inside the
    fused window program — pipeline._window_step_brick_compact) is
    bit-identical to the sequential lax.map default, for full-window vmap
    (B == window), grouped map (1 < B < window), a non-dividing B (snapped
    to gcd), and both dense modes."""
    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
    from sonar_3d_reconstruction_tpu.ops.backproject import (
        build_fan_tables,
        required_fan_cap,
        required_window_cap,
    )
    from sonar_3d_reconstruction_tpu.ops.packing import compute_window_boxes
    from sonar_3d_reconstruction_tpu.pipeline import (
        batched_sonar_to_world,
        scan_pings_brick,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 9, seed=55)
    R, Bw = cfg.image_height, cfg.image_width
    tables = build_fan_tables(
        cfg, R, Bw, fan_cap=required_fan_cap(images, cfg, R),
        window_cap=required_window_cap(images, cfg, R),
    )
    T = batched_sonar_to_world(positions, quats, cfg)
    window = 4
    boxes = compute_window_boxes(
        T[:, :3, 3], cfg.max_range, cfg.voxel_resolution, window, 2,
        frame_bits=max(1, (window - 1).bit_length()),
    )
    assert boxes is not None

    def run(**kw):
        st, stats = scan_pings_brick(
            init_brick_grid(1 << 12, jnp.float64), jnp.asarray(images),
            jnp.asarray(T, jnp.float64), tables=tables, cfg=cfg,
            dtype=jnp.float64, window=window, boxes=boxes, **kw,
        )
        assert not bool(np.asarray(stats["overflowed"]).any()), kw
        return brick_state_to_dict(st), stats

    for mode in ("bfv", "scalar"):
        ref_state, ref_stats = run(dense_mode=mode, records_batch=1)
        # 4 = full-window vmap; 2 = grouped lax.map of vmapped pairs;
        # 3 does not divide window=4 -> gcd snaps it to 1 (the reference);
        # 0 = full python unroll (no lax.map at all)
        for rb in (4, 2, 3, 0):
            st, stats = run(dense_mode=mode, records_batch=rb)
            assert st.keys() == ref_state.keys()
            for k in ref_state:
                assert ref_state[k] == st[k], (mode, rb, k)
            for k in ref_stats:
                np.testing.assert_array_equal(
                    np.asarray(ref_stats[k]), np.asarray(stats[k]),
                    err_msg=f"{mode}:rb={rb}:{k}",
                )


def test_brick_window_group_bit_equals_chained(small_cfg):
    """window_group > 1 (G windows chained inside ONE program —
    pipeline._multi_window_step_brick_compact) is bit-identical to the
    per-window dispatch chain, including a non-dividing group (tail runs
    the single-window program) and per-window cold/warm insert budgets
    (static tuple inside the group program)."""
    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
    from sonar_3d_reconstruction_tpu.ops.backproject import (
        build_fan_tables,
        required_fan_cap,
        required_window_cap,
    )
    from sonar_3d_reconstruction_tpu.ops.packing import compute_window_boxes
    from sonar_3d_reconstruction_tpu.pipeline import (
        batched_sonar_to_world,
        scan_pings_brick,
    )

    cfg = small_cfg
    images, positions, quats = make_sequence(cfg, 9, seed=56)
    R, Bw = cfg.image_height, cfg.image_width
    tables = build_fan_tables(
        cfg, R, Bw, fan_cap=required_fan_cap(images, cfg, R),
        window_cap=required_window_cap(images, cfg, R),
    )
    T = batched_sonar_to_world(positions, quats, cfg)
    window = 4
    boxes = compute_window_boxes(
        T[:, :3, 3], cfg.max_range, cfg.voxel_resolution, window, 2,
        frame_bits=max(1, (window - 1).bit_length()),
    )
    assert boxes is not None

    def run(**kw):
        st, stats = scan_pings_brick(
            init_brick_grid(1 << 12, jnp.float64), jnp.asarray(images),
            jnp.asarray(T, jnp.float64), tables=tables, cfg=cfg,
            dtype=jnp.float64, window=window, boxes=boxes, **kw,
        )
        assert not bool(np.asarray(stats["overflowed"]).any()), kw
        return brick_state_to_dict(st), stats

    for ib in (None, [8192, 4096]):
        ref_state, ref_stats = run(insert_budget=ib, window_group=1)
        # 9 pings / window 4 = 3 windows: group 2 = one pair + single
        # tail; group 3 = all three in one program; group 8 clamps
        for wg in (2, 3, 8):
            st, stats = run(insert_budget=ib, window_group=wg)
            assert st.keys() == ref_state.keys()
            for k in ref_state:
                assert ref_state[k] == st[k], (ib, wg, k)
            for k in ref_stats:
                np.testing.assert_array_equal(
                    np.asarray(ref_stats[k]), np.asarray(stats[k]),
                    err_msg=f"ib={ib}:wg={wg}:{k}",
                )
