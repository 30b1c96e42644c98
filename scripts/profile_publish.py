"""Measure the publish tick: occupied extraction + PointCloud2 serialization.

The reference's publish path (scripts/3d_mapper_node.py:393-446) scans the
whole voxel dict and struct.packs per point at 10 Hz — flagged hot at scale
in SURVEY.md 3.3.  The rebuild extracts on device (one class-key sort +
O(occupied) prefix transfer, grid/hash.py / grid/brick.py) and serializes
with one vectorized ndarray pack (io/pointcloud.py).  This script produces
the PERFORMANCE.md "publish tick" row the round-2/3 verdicts asked for:
wall time per tick at 2^22-slot hash capacity (and the equivalent brick
table), survey-populated occupied counts, plus serialization alone at
exactly 100k points.

Usage:
  python scripts/profile_publish.py [--pings 64] [--platform cpu] [--reps 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pings", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--capacity-log2", type=int, default=22)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    # platform override BEFORE the cache enable: enable() picks the cache
    # dir by the configured platform, and a cpu run writing host-specific
    # AOT entries into the shared TPU root can segfault other hosts
    # (CLAUDE.md) — bench.py has the same ordering
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from sonar_3d_reconstruction_tpu.utils.compile_cache import (
        enable as _enable,
    )

    _enable()

    from bench import make_inputs
    from sonar_3d_reconstruction_tpu.config import MapperConfig
    from sonar_3d_reconstruction_tpu.grid.brick import (
        extract_occupied_brick,
        init_brick_grid,
    )
    from sonar_3d_reconstruction_tpu.grid.hash import (
        extract_occupied_hash,
        init_hash_grid,
    )
    from sonar_3d_reconstruction_tpu.io.pointcloud import serialize_pointcloud2
    from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence

    cfg = MapperConfig()
    images, positions, quats = make_inputs(cfg, args.pings)

    # populate both backends from the same survey (occupied == prob>0.6 set)
    st_hash, _ = map_ping_sequence(
        images, positions, quats, cfg, backend="hash",
        initial_capacity=1 << args.capacity_log2, dtype=jnp.float32,
        window=8,
    )
    # brick capacity arg counts bricks; the default survey fits 2^16 rows
    st_brick, _ = map_ping_sequence(
        images, positions, quats, cfg, backend="brick",
        dtype=jnp.float32, window=8,
        state=init_brick_grid(1 << 16, jnp.float32),
    )
    jax.block_until_ready((st_hash.log_odds, st_brick.log_odds))

    # warm the extraction programs (the 10 Hz tick never sees compiles)
    pts_h, probs_h = extract_occupied_hash(st_hash, cfg)
    pts_b, probs_b = extract_occupied_brick(st_brick, cfg)
    assert len(pts_h) == len(pts_b), (len(pts_h), len(pts_b))

    t_hash, _ = _time(lambda: extract_occupied_hash(st_hash, cfg), args.reps)
    t_brick, _ = _time(lambda: extract_occupied_brick(st_brick, cfg),
                       args.reps)
    t_ser, msg = _time(
        lambda: serialize_pointcloud2(pts_h, probs_h, frame_id="camera_init",
                                      stamp=(0, 0)),
        args.reps,
    )
    # serialization alone at exactly 100k points (capacity-independent row)
    rng = np.random.default_rng(0)
    pts100 = rng.normal(size=(100_000, 3))
    pr100 = rng.uniform(0.6, 1.0, size=100_000)
    t_ser100, _ = _time(
        lambda: serialize_pointcloud2(pts100, pr100, frame_id="camera_init",
                                      stamp=(0, 0)),
        args.reps,
    )

    # round-5 incremental publish tick (VERDICT r4 item 4), steady state:
    # host view seeded once, then each tick pulls only the last chunk's
    # pose-derived dirty box, merges, and re-serializes the full view —
    # the stream.py _incremental_occupied flow at survey scale
    from sonar_3d_reconstruction_tpu.grid.brick import (
        BrickHostView,
        pull_all_touched_bricks,
        pull_bricks_in_boxes,
    )
    from sonar_3d_reconstruction_tpu.pipeline import batched_sonar_to_world

    view = BrickHostView()
    view.merge(*pull_all_touched_bricks(st_brick))
    T = batched_sonar_to_world(positions, quats, cfg)
    p = T[-32:, :3, 3]  # a 32-ping chunk's dirty region
    res = cfg.voxel_resolution
    reach = cfg.max_range + 2 * res
    box = np.stack([
        np.floor((p.min(axis=0) - reach) / res).astype(np.int32),
        np.floor((p.max(axis=0) + reach) / res).astype(np.int32),
    ])

    def inc_tick():
        hi, lo, rows, touched = pull_bricks_in_boxes(st_brick, box[None])
        view.merge(hi, lo, rows, touched)
        pts, pr = view.extract_occupied(cfg, st_brick.brick_bits)
        return serialize_pointcloud2(
            pts, pr, frame_id="camera_init", stamp=(0, 0)
        ), len(hi)

    _ = inc_tick()  # warm the selection program
    t_inc, (msg_i, n_dirty) = _time(inc_tick, args.reps)
    full_msg = serialize_pointcloud2(
        pts_b, probs_b, frame_id="camera_init", stamp=(0, 0)
    )

    print(json.dumps({
        "device": jax.devices()[0].platform,
        "hash_capacity": 1 << args.capacity_log2,
        "brick_capacity_rows": int(st_brick.capacity),
        "occupied_voxels": int(len(pts_h)),
        "extract_hash_ms": 1e3 * t_hash,
        "extract_brick_ms": 1e3 * t_brick,
        "serialize_survey_ms": 1e3 * t_ser,
        "serialize_100k_ms": 1e3 * t_ser100,
        "publish_tick_hash_ms": 1e3 * (t_hash + t_ser),
        "publish_tick_brick_ms": 1e3 * (t_brick + t_ser),
        "incremental_tick_ms": 1e3 * t_inc,
        "incremental_dirty_bricks": int(n_dirty),
        "incremental_matches_full": bool(msg_i["data"] == full_msg["data"]),
        "pointcloud2_bytes": len(msg["data"]) if isinstance(msg, dict)
        else int(getattr(msg, "nbytes", 0)),
        "n_pings": args.pings,
    }))  # one line: session artifact is json.loads-able


if __name__ == "__main__":
    main()
