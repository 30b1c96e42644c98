"""Fingerprint the capture-path window-step program's lowered HLO.

Prints a SHA-256 of the StableHLO text of `_window_step_brick_compact`
lowered at the exact bench-plan shapes (w16 default and w8 streaming),
platform-independent (forced CPU, no TPU acquisition).  Purpose: prove a
traced-source edit left the DEFAULT capture program byte-identical — the
persistent-compile-cache key is derived from this HLO, so an unchanged
fingerprint means the warmed TPU cache entries stay valid (CLAUDE.md:
"no traced-source commits after the round's final TPU warm run" — this is
the check that makes opt-in structural work safe to land mid-round).

Usage: python scripts/hlo_fingerprint.py [dense_mode]
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.pipeline import (
    _window_step_brick_compact,
    batched_sonar_to_world,
)
from sonar_3d_reconstruction_tpu.ops.backproject import (
    build_fan_tables,
    required_fan_cap,
    required_free_cap,
    required_window_cap,
)
from sonar_3d_reconstruction_tpu.grid.brick import (
    DEFAULT_BRICK_BITS,
    init_brick_grid,
)
from sonar_3d_reconstruction_tpu.ops.packing import compute_window_boxes
from bench import make_inputs

# the committed bench-plan budgets (bench_plan.json) per window size
_PLAN_BUDGETS = {
    8: dict(unique_budget=94208, brick_budget=7168, lane_budget=729088,
            insert_budget=6144, dedup_lane_budget=229376),
    16: dict(unique_budget=94208, brick_budget=9216, lane_budget=1343488,
             insert_budget=9216, dedup_lane_budget=229376),
}


def fingerprint(window: int, dense_mode: str = "scalar") -> str:
    cfg = MapperConfig()
    images, positions, quats = make_inputs(cfg, 64)
    fan_cap = required_fan_cap(images, cfg, cfg.image_height)
    window_cap = required_window_cap(images, cfg, cfg.image_height)
    free_cap = required_free_cap(images, cfg, cfg.image_height)
    tables = build_fan_tables(
        cfg, cfg.image_height, cfg.image_width,
        fan_cap=fan_cap, window_cap=window_cap, free_cap=free_cap,
    )
    T_host = np.asarray(batched_sonar_to_world(positions, quats, cfg))
    boxes = compute_window_boxes(
        T_host[:, :3, 3], cfg.max_range, cfg.voxel_resolution, window,
        DEFAULT_BRICK_BITS, frame_bits=max(1, (window - 1).bit_length()),
    )
    assert boxes is not None
    state = init_brick_grid(1 << 15, jnp.float32)
    images_dev = jnp.asarray(images)
    T_dev = jnp.asarray(T_host, jnp.float32)
    kw = _PLAN_BUDGETS[window]
    lowered = _window_step_brick_compact.lower(
        state, images_dev, T_dev, jnp.int32(0), jnp.int32(0),
        jnp.int32(images.shape[0]), jnp.asarray(boxes[0][0]),
        tables=tables, cfg=cfg, dtype=jnp.float32, window=window,
        brick_bits=DEFAULT_BRICK_BITS, box_bits=tuple(boxes[1]),
        vox_budget=None, dense_mode=dense_mode, **kw,
    )
    text = lowered.as_text()
    return hashlib.sha256(text.encode()).hexdigest()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "scalar"
    for w in (16, 8):
        print(f"window={w} dense_mode={mode}: {fingerprint(w, mode)}",
              flush=True)
