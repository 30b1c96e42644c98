"""Fused Pallas binning kernel (pallas/bin_kernel.py, dense_mode="pallas"):
interpret-mode bit-parity with the XLA bfv window apply, tile/chunk edge
cases, and the unchanged overflow contract.

The kernel reuses ops/logodds.finalize_voxel_updates and accumulates
exact-integer one-hot matmuls, so parity with the bfv path is EXACT (same
dtype arithmetic), not approximate — asserted with dict equality in both
f64 and f32.
"""

import numpy as np

import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
from sonar_3d_reconstruction_tpu.ops.backproject import build_fan_tables
from sonar_3d_reconstruction_tpu.ops.packing import compute_window_boxes
from sonar_3d_reconstruction_tpu.pipeline import (
    batched_sonar_to_world,
    scan_pings_brick,
)

from test_brick_grid import brick_state_to_dict
from test_shard_brick import make_seq

STAT_KEYS = (
    "num_occupied", "num_free", "num_candidates", "overflowed",
    "batch_overflow", "batch_n_unique", "batch_n_bricks", "batch_n_lanes",
)


def _run(cfg, images, positions, quats, dense_mode, dtype, window=4,
         brick_budget=2048):
    tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    T = batched_sonar_to_world(positions, quats, cfg)
    w = min(window, len(images))
    boxes = compute_window_boxes(
        T[:, :3, 3], cfg.max_range, cfg.voxel_resolution, w, 2,
        frame_bits=max(1, (w - 1).bit_length()),
    )
    assert boxes is not None  # the compact front is the pallas path's host
    st, stats = scan_pings_brick(
        init_brick_grid(1 << 13, dtype), jnp.asarray(images),
        jnp.asarray(T, dtype), tables=tables, cfg=cfg, dtype=dtype,
        window=window, brick_budget=brick_budget, boxes=boxes,
        dense_mode=dense_mode,
    )
    return st, stats


def _assert_same(cfg, images, positions, quats, dtype, pallas_mode="pallas",
                 window=4, brick_budget=2048, skip_keys=()):
    ref_st, ref_stats = _run(
        cfg, images, positions, quats, "bfv", dtype, window, brick_budget
    )
    got_st, got_stats = _run(
        cfg, images, positions, quats, pallas_mode, dtype, window,
        brick_budget,
    )
    assert not np.asarray(ref_stats["overflowed"]).any()
    a = brick_state_to_dict(got_st)
    b = brick_state_to_dict(ref_st)
    assert a.keys() == b.keys(), (len(a), len(b))
    diff = [k for k in a if a[k] != b[k]]
    assert not diff, (len(diff), diff[:3])
    for k in STAT_KEYS:
        if k in skip_keys:
            continue
        np.testing.assert_array_equal(
            np.asarray(got_stats[k]), np.asarray(ref_stats[k]), err_msg=k
        )


def test_pallas_matches_bfv_f64(small_cfg):
    """Bit-exact parity in float64, including a half-empty tail window
    (6 pings at window 4 — empty bricks and masked frames)."""
    images, positions, quats = make_seq(small_cfg, 6, seed=51)
    _assert_same(small_cfg, images, positions, quats, jnp.float64)


def test_pallas_matches_bfv_f32(small_cfg):
    """Bit-exact parity in float32 (the bench dtype)."""
    images, positions, quats = make_seq(small_cfg, 4, seed=52)
    _assert_same(small_cfg, images, positions, quats, jnp.float32)


def test_pallas_tile_and_chunk_edges(small_cfg):
    """TB that does not divide the brick budget (padding path) + a small
    chunk size forcing multi-chunk bricks and shared boundary chunks."""
    images, positions, quats = make_seq(small_cfg, 2, seed=53)
    _assert_same(
        small_cfg, images, positions, quats, jnp.float64,
        pallas_mode="pallas-tb3-c256", window=2, brick_budget=1000,
    )


def test_pallas_overflow_contract_matches(small_cfg):
    """A deliberately tiny brick budget must reject the window
    all-or-nothing with the same growable batch_overflow cause as bfv
    (failure contract unchanged, grid/brick.py module docstring)."""
    images, positions, quats = make_seq(small_cfg, 4, seed=54)
    ref_st, ref_stats = _run(
        small_cfg, images, positions, quats, "bfv", jnp.float64,
        brick_budget=8,
    )
    got_st, got_stats = _run(
        small_cfg, images, positions, quats, "pallas", jnp.float64,
        brick_budget=8,
    )
    assert np.asarray(ref_stats["overflowed"]).any()
    for k in ("overflowed", "batch_overflow"):
        np.testing.assert_array_equal(
            np.asarray(got_stats[k]), np.asarray(ref_stats[k]), err_msg=k
        )
    assert bool(got_st.poisoned) and bool(ref_st.poisoned)
    assert brick_state_to_dict(got_st) == brick_state_to_dict(ref_st)


def test_pallas_raw_candidates_match_bfv(small_cfg):
    """dense_mode="pallas...-raw": the per-frame sort-dedup is SKIPPED —
    every candidate becomes a payload-(1<<16|occ) record and the kernel's
    summing accumulator reproduces the dedup aggregates exactly, with the
    reference per-frame unique stats (num_occupied/num_free) coming from
    the kernel's popcounts.  batch_n_lanes counts candidate lanes instead
    of record lanes by design (excluded from the diff)."""
    images, positions, quats = make_seq(small_cfg, 6, seed=57)
    _assert_same(
        small_cfg, images, positions, quats, jnp.float64,
        pallas_mode="pallas-raw", skip_keys=("batch_n_lanes",),
    )
    _assert_same(
        small_cfg, images, positions, quats, jnp.float32,
        pallas_mode="pallas-raw-tb3-c256", skip_keys=("batch_n_lanes",),
    )


def test_pallas_kernel_direct_fuzz_vs_numpy():
    """pallas_bin_apply (interpret) vs a NumPy reconstruction on random
    record patterns: empty bricks, single-record bricks, saturated
    bricks, duplicate records (raw-mode summing), large counts, and the
    stats_out per-frame unique counts."""
    import jax.numpy as jnp

    from sonar_3d_reconstruction_tpu.config import MapperConfig
    from sonar_3d_reconstruction_tpu.ops.logodds import (
        finalize_voxel_updates,
    )
    from sonar_3d_reconstruction_tpu.pallas.bin_kernel import (
        pallas_bin_apply,
    )

    cfg = MapperConfig()
    B, vol, o, f_bits = 8, 64, 6, 3
    for seed, NB, n, dup in ((1, 16, 300, False), (2, 5, 2000, False),
                             (3, 32, 1, False), (4, 16, 0, False),
                             (5, 12, 800, True)):
        rng = np.random.default_rng(seed)
        if n:
            combos = rng.choice(NB * B * vol, size=n, replace=dup)
            combos.sort()
        else:
            combos = np.empty((0,), np.int64)
        brick = combos // (B * vol)
        frame = (combos // vol) % B
        off = combos % vol
        key = ((brick.astype(np.uint32) << (o + f_bits))
               | (frame.astype(np.uint32) << o) | off.astype(np.uint32))
        cnt = rng.integers(1, 0xFFFF if seed == 2 else 40,
                           size=n).astype(np.uint32)
        occ = np.minimum(rng.integers(0, 50, size=n).astype(np.uint32), cnt)
        pay = (cnt << 16) | occ
        starts = np.searchsorted(brick, np.arange(NB + 1)).astype(np.int32)
        rows = rng.normal(size=(NB, vol)).astype(np.float32)

        out = pallas_bin_apply(
            jnp.asarray(key), jnp.asarray(pay), jnp.asarray(starts),
            jnp.asarray(rows), B=B, vol=vol, f_bits=f_bits, o=o, cfg=cfg,
            TB=3, CHUNK=256, interpret=True, stats_out=True,
        )
        v, upd, occ_u, free_u = [np.asarray(x) for x in out]

        dcnt = np.zeros((NB, B, vol), np.float64)
        docc = np.zeros((NB, B, vol), np.float64)
        np.add.at(dcnt, (brick, frame, off), cnt.astype(np.float64))
        np.add.at(docc, (brick, frame, off), occ.astype(np.float64))
        ref = jnp.asarray(rows)
        occL = np.float32(cfg.log_odds_occupied)
        freL = np.float32(cfg.log_odds_free)
        for f in range(B):
            c = jnp.asarray(dcnt[:, f, :], jnp.float32)
            q = jnp.asarray(docc[:, f, :], jnp.float32)
            ref = finalize_voxel_updates(
                ref, q * occL + (c - q) * freL, c, q > 0, cfg
            )
        np.testing.assert_array_equal(v, np.asarray(ref), err_msg=str(seed))
        np.testing.assert_array_equal(
            upd, dcnt.sum(axis=1) > 0, err_msg=str(seed)
        )
        np.testing.assert_array_equal(
            occ_u, (docc > 0).sum(axis=(0, 2)), err_msg=str(seed)
        )
        np.testing.assert_array_equal(
            free_u, ((dcnt > 0) & (docc == 0)).sum(axis=(0, 2)),
            err_msg=str(seed),
        )
