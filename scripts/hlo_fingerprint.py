"""Fingerprint the bench capture program's lowered HLO (no device compile).

The persistent compile cache keys on the serialized HLO module + compile
options; if the SAME config lowers to DIFFERENT HLO text in two fresh
processes, every fresh process misses the cache and pays a multi-minute
remote TPU compile (the round-4b session saw exactly that signature:
bfv_bench compiled fine, the bfv rerun missed and hit its deadline, and
even scalar "warm" reruns wrote brand-new cache entries).

Usage:
    JAX_PLATFORMS=cpu python scripts/hlo_fingerprint.py [window] [dense_mode]

Prints ONE json line {"hlo_sha256": ..., "window": ..., "dense_mode": ...}.
Run it twice (two processes, optionally different PYTHONHASHSEED) and
compare hashes: stable HLO -> identical; set/dict-order nondeterminism in
the program builders -> different.
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dense_mode = sys.argv[2] if len(sys.argv) > 2 else "scalar"

    import jax

    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import bench
    from sonar_3d_reconstruction_tpu.grid.brick import (
        DEFAULT_BRICK_BITS,
        init_brick_grid,
    )
    from sonar_3d_reconstruction_tpu.ops.backproject import (
        build_fan_tables,
        required_fan_cap,
        required_free_cap,
        required_window_cap,
    )
    from sonar_3d_reconstruction_tpu.ops.packing import compute_window_boxes
    from sonar_3d_reconstruction_tpu.pipeline import (
        _window_step_brick_compact,
        batched_sonar_to_world,
    )

    from sonar_3d_reconstruction_tpu.config import MapperConfig

    cfg = MapperConfig()  # bench.py's capture config
    n_pings = 256
    images, positions, quats = bench.make_inputs(cfg, n_pings)
    fan_cap = required_fan_cap(images, cfg, cfg.image_height)
    window_cap = required_window_cap(images, cfg, cfg.image_height)
    free_cap = required_free_cap(images, cfg, cfg.image_height)
    tables = build_fan_tables(
        cfg, cfg.image_height, cfg.image_width, fan_cap=fan_cap,
        window_cap=window_cap, free_cap=free_cap,
    )
    plan_key = bench._plan_key(
        cfg, n_pings, window, "brick", dense_mode,
        (fan_cap, window_cap, free_cap), 1 << 16, 0,
    )
    budgets = bench._load_plan(plan_key)
    if budgets is None:
        print(json.dumps({"error": "no committed plan for this config",
                          "plan_key": plan_key}))
        return 2

    T_host = batched_sonar_to_world(positions, quats, cfg)
    boxes = compute_window_boxes(
        T_host[:, :3, 3], cfg.max_range, cfg.voxel_resolution, window,
        DEFAULT_BRICK_BITS,
        frame_bits=max(1, (window - 1).bit_length()),
    )
    box_mins, box_bits = np.asarray(boxes[0], np.int32), tuple(boxes[1])

    st = init_brick_grid(budgets["capacity"], jnp.float32)
    ib = budgets["insert_budget"]
    if isinstance(ib, (list, tuple)):
        ib = tuple(ib)[0]
    lowered = _window_step_brick_compact.lower(
        st, jnp.asarray(images), jnp.asarray(T_host, jnp.float32),
        jnp.int32(0), jnp.int32(0), jnp.int32(n_pings),
        jnp.asarray(box_mins[0]),
        tables=tables, cfg=cfg, dtype=jnp.float32,
        unique_budget=budgets["unique_budget"], window=window,
        dedup_lane_budget=budgets["dedup_lane_budget"],
        brick_bits=st.brick_bits, box_bits=box_bits,
        brick_budget=budgets["brick_budget"],
        lane_budget=budgets["lane_budget"], insert_budget=ib,
        vox_budget=budgets["vox_budget"], dense_mode=dense_mode,
    )
    text = lowered.as_text()
    print(json.dumps({
        "hlo_sha256": hashlib.sha256(text.encode()).hexdigest(),
        "text_len": len(text),
        "window": window,
        "dense_mode": dense_mode,
        "hashseed": os.environ.get("PYTHONHASHSEED", "random"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
