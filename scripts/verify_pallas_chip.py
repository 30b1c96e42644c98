"""On-chip MAP-STATE parity for the adopted Pallas binning kernel at
full-size shapes: run the same 64-ping full-size survey through
dense_mode=bfv and dense_mode=pallas-tb16 (plan budgets, w16) on the real
chip and diff the final maps voxel-for-voxel.

The interpret-mode suite (tests/test_pallas_bin.py) pins exact semantics
and the on-chip smoke (profile_pallas_bin.py smoke) pins the Mosaic
lowering at small shapes; this closes the remaining gap — Mosaic at the
BENCH shapes (KC~1300 chunks, NT~576 tiles, boundary chunks, empty
tiles).  Prints one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_pallas_bin import _bench_setup, _setup


def main():
    jax = _setup()
    import jax.numpy as jnp

    from sonar_3d_reconstruction_tpu.grid.brick import (
        init_brick_grid,
        touched_voxels_brick,
    )
    from sonar_3d_reconstruction_tpu.pipeline import scan_pings_brick

    os.environ.setdefault("PINGS", "64")
    window = int(os.environ.get("WINDOW", "16"))
    cfg, n_pings, images, T_host, tables, plan, boxes = _bench_setup(
        jax, window
    )
    images_dev = jnp.asarray(images)
    T_dev = jnp.asarray(T_host, jnp.float32)

    outs = {}
    for mode in ("bfv", os.environ.get("MODE", "pallas-tb16")):
        st = init_brick_grid(plan["capacity"], jnp.float32)
        st, stats = scan_pings_brick(
            st, images_dev, T_dev, tables=tables, cfg=cfg,
            dtype=jnp.float32, unique_budget=plan["unique_budget"],
            window=window, brick_budget=plan["brick_budget"],
            # raw modes: the lane budget must cover candidates, not records
            lane_budget=(None if "raw" in mode.split("-")
                         else plan["lane_budget"]),
            insert_budget=plan["insert_budget"],
            vox_budget=plan["vox_budget"], dense_mode=mode,
            dedup_lane_budget=plan["dedup_lane_budget"], boxes=boxes,
        )
        assert not bool(np.asarray(stats["overflowed"]).any()), mode
        keys, lo = touched_voxels_brick(st)
        outs[mode] = {tuple(k): float(v) for k, v in zip(keys, lo)}
        s = {k: np.asarray(v) for k, v in stats.items()}
        outs[mode + "_stats"] = (
            int(s["num_occupied"].sum()), int(s["num_free"].sum()),
            int(s["num_candidates"].sum()),
        )

    a = outs["bfv"]
    mode = os.environ.get("MODE", "pallas-tb16")
    b = outs[mode]
    same_keys = a.keys() == b.keys()
    diff = [k for k in a if same_keys and a[k] != b[k]]
    payload = {
        "step": "verify_pallas_chip", "mode": mode, "n_pings": n_pings,
        "voxels": len(a), "same_voxel_set": bool(same_keys),
        "value_mismatches": len(diff) if same_keys else None,
        "stats_bfv": outs["bfv_stats"], "stats_mode": outs[mode + "_stats"],
        "bit_identical": bool(same_keys and not diff),
    }
    print(json.dumps(payload), flush=True)
    assert payload["bit_identical"], payload


if __name__ == "__main__":
    main()
