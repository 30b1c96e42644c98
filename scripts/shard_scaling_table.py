"""Structural work-scaling table for the frame-parallel sharded engine.

The 1e9 updates/s BASELINE stretch target is a multi-chip projection
(PERFORMANCE.md "Sorts are the cost" closing paragraph): one v5e chip
measures ~1.3e8 and both halves of the step are at their measured
sort-bound floor, so the remaining ~8x must come from the mesh.  No
multi-chip TPU hardware exists in this environment (one tunneled chip),
and a CPU-mesh *timing* curve on a 1-core host would be meaningless
(all 8 virtual devices share one core).  What CAN be stated exactly is
the STRUCTURAL scaling: per-shard lane counts, sort bytes and exchange
bytes as a function of shard count S, computed from the same planning
code the engine itself uses (parallel/shard_frames.py,
ops/backproject.FanTables, the committed bench budget plan).

This script prints that table for the exact bench capture configuration
(256 pings, window 16, dense_mode=bfv plan budgets) plus a projected
step time built from the round-4 w16 trace split (records 8.9 ms/window,
apply ~10.9 ms/window, fixed host+dispatch ~1.8 ms/window through the
tunnel) — labeled PROJECTED; the lane/byte columns are exact.

Usage: python scripts/shard_scaling_table.py [--window 16] [--md]
"""

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Measured w16 bfv trace split (PERFORMANCE.md round-4b/4c sections),
# ms per WINDOW of 16 pings on one v5e through the axon tunnel.
RECORDS_MS_PER_WINDOW = 8.9     # records lax.map total (sorts + fusions)
APPLY_MS_PER_WINDOW = 10.9      # window sort + dense scatter + table ops
FIXED_MS_PER_WINDOW = 1.8       # host chain + dispatch (tunnel-inflated;
                                # measured end-to-end 1.35 ms/ping minus
                                # 1.24 ms/ping device time)
ICI_BYTES_PER_S = 186e9         # one v5e ICI link direction (of 4)
UPDATES_PER_PING = 175438.0     # bench survey (BENCH JSON detail)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--md", action="store_true", help="markdown table")
    ap.add_argument(
        "--fixed-ms", type=float, default=FIXED_MS_PER_WINDOW,
        help="fixed host+dispatch ms/window (round-5 window_group\n"
        "amortization divides the measured 1.8 by the group size)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host math only

    import bench
    from sonar_3d_reconstruction_tpu.config import MapperConfig
    from sonar_3d_reconstruction_tpu.ops.backproject import (
        build_fan_tables,
        required_fan_cap,
        required_free_cap,
        required_window_cap,
    )
    from sonar_3d_reconstruction_tpu.parallel.shard_frames import (
        default_xchg_budget,
    )

    cfg = MapperConfig()
    window = args.window
    n_pings = 256
    images, _, _ = bench.make_inputs(cfg, n_pings)
    fan_cap = required_fan_cap(images, cfg, cfg.image_height)
    window_cap = required_window_cap(images, cfg, cfg.image_height)
    free_cap = required_free_cap(images, cfg, cfg.image_height)
    tables = build_fan_tables(
        cfg, cfg.image_height, cfg.image_width, fan_cap=fan_cap,
        window_cap=window_cap, free_cap=free_cap,
    )
    cand = tables.candidates_per_ping(cfg.occupied_window)

    plan_key = bench._plan_key(
        cfg, n_pings, window, "brick", bench.DEFAULT_DENSE_MODE,
        (fan_cap, window_cap, free_cap), 1 << 16, 0,
    )
    plan = bench._load_plan(plan_key) or {}
    U = int(plan.get("unique_budget") or 94208)
    dedup_lanes = int(plan.get("dedup_lane_budget") or 229376)
    lane_budget = int(plan.get("lane_budget") or window * U)
    brick_budget = int(plan.get("brick_budget") or 9216)

    print(f"# bench capture config: window={window}, candidate lattice "
          f"{cand} lanes/ping, plan U={U}, dedup_lanes={dedup_lanes}, "
          f"window lanes={lane_budget}, bricks/window={brick_budget} "
          f"(plan {'hit' if plan else 'MISS - defaults shown'})")

    hdr = ("S", "frames/shard", "rec sort lanes/win", "compact lanes/win",
           "apply sort lanes", "bricks/shard", "xchg budget",
           "a2a MB/shard/win", "proj ms/ping", "proj Mupd/s",
           "proj Mupd/s (device-only)")
    rows = []
    for S in (1, 2, 4, 8, 16):
        F = math.ceil(window / S)
        rec_lanes = F * cand                      # candidate sorts/shard
        comp_lanes = F * dedup_lanes              # compaction sorts/shard
        apply_lanes = math.ceil(lane_budget / S)  # window sort + scatter
        bricks = math.ceil(brick_budget / S)
        xchg = default_xchg_budget(U, S) if S > 1 else 0
        # each shard sends (S-1) foreign blocks of xchg records x 8 B for
        # each of its F frames
        a2a_bytes = F * (S - 1) * xchg * 8 if S > 1 else 0
        a2a_ms = 1e3 * a2a_bytes / ICI_BYTES_PER_S
        t_records = RECORDS_MS_PER_WINDOW * F / window
        t_apply = APPLY_MS_PER_WINDOW / S
        t_win = t_records + t_apply + a2a_ms + args.fixed_ms
        t_dev = t_records + t_apply + a2a_ms
        ping_ms = t_win / window
        rows.append((S, F, rec_lanes, comp_lanes, apply_lanes, bricks,
                     xchg, round(a2a_bytes / 1e6, 2),
                     round(ping_ms, 3),
                     round(UPDATES_PER_PING / ping_ms / 1e3, 1),
                     round(UPDATES_PER_PING / (t_dev / window) / 1e3, 1)))

    if args.md:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for r in rows:
            print("| " + " | ".join(str(x) for x in r) + " |")
    else:
        print(json.dumps([dict(zip(hdr, r)) for r in rows], indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
