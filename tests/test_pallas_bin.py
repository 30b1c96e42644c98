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
