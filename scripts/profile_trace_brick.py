"""Op-level device trace of the BRICK-backend bench step (records + apply)
on the axon TPU — the round-3 counterpart of profile_trace.py, aimed at the
records program (now ~70% of the step, PERFORMANCE.md round-3 section).

Usage: python scripts/profile_trace_brick.py [outdir]
"""

import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.utils.compile_cache import enable as _enable
_enable()

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
from sonar_3d_reconstruction_tpu.ops.backproject import (
    build_fan_tables,
    required_fan_cap,
    required_free_cap,
    required_window_cap,
)
from sonar_3d_reconstruction_tpu.pipeline import (
    batched_sonar_to_world,
    scan_pings_brick,
)
from sonar_3d_reconstruction_tpu.utils.profiling import device_trace
from bench import make_inputs
from profile_trace import parse_xplane_top_ops  # raw-proto xplane reader

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sonar3d_trace_brick"

cfg = MapperConfig()
WINDOW = int(os.environ.get("TRACE_WINDOW", "16"))
N = max(16, 2 * WINDOW)
images, positions, quats = make_inputs(cfg, 64)
fan_cap = required_fan_cap(images, cfg, cfg.image_height)
window_cap = required_window_cap(images, cfg, cfg.image_height)
free_cap = required_free_cap(images, cfg, cfg.image_height)
tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width,
                          fan_cap=fan_cap, window_cap=window_cap,
                          free_cap=free_cap)
T_host = batched_sonar_to_world(positions, quats, cfg)
T = jnp.asarray(T_host, jnp.float32)
imgs = jnp.asarray(images)

from sonar_3d_reconstruction_tpu.grid.brick import DEFAULT_BRICK_BITS
from sonar_3d_reconstruction_tpu.ops.packing import compute_window_boxes

boxes = compute_window_boxes(
    T_host[:, :3, 3], cfg.max_range, cfg.voxel_resolution, WINDOW,
    DEFAULT_BRICK_BITS, frame_bits=max(1, (WINDOW - 1).bit_length()),
)
print("boxes:", None if boxes is None else boxes[1], flush=True)
print("device:", jax.devices()[0].platform, flush=True)

# the bench's measured snug budgets per window size (bench_plan.json —
# keep in sync so the traced step is the exact capture-path program);
# TRACE_DENSE_MODE=row traces the row-structured dense build
_PLAN_BUDGETS = {
    8: dict(unique_budget=94208, brick_budget=7168, lane_budget=729088,
            insert_budget=[6144, 4096], dedup_lane_budget=229376),
    16: dict(unique_budget=94208, brick_budget=9216, lane_budget=1343488,
             insert_budget=[9216, 6144], dedup_lane_budget=229376),
}
# windows without a committed plan trace at safe (untuned) budgets
_SAFE = dict(unique_budget=131072, brick_budget=174762, lane_budget=None,
             insert_budget=None, dedup_lane_budget=0)
kw = dict(
    tables=tables, cfg=cfg, dtype=jnp.float32, window=WINDOW, boxes=boxes,
    dense_mode=os.environ.get("TRACE_DENSE_MODE", "scalar"),
    **_PLAN_BUDGETS.get(WINDOW, _SAFE),
)
if kw["dense_mode"] == "row":
    kw["vox_budget"] = int(os.environ.get("TRACE_VOX_BUDGET", "212992"))

st = init_brick_grid(1 << 16, jnp.float32)
st, stats = scan_pings_brick(st, imgs[:N], T[:N], **kw)
assert not bool(np.asarray(stats["overflowed"]).any())
_ = int(st.used)
print("warm; tracing...", flush=True)

t0 = time.perf_counter()
with device_trace(OUT):
    st2 = init_brick_grid(1 << 16, jnp.float32)
    st2, stats2 = scan_pings_brick(
        st2, imgs[:N].at[0, 0, 0].set(np.uint8(7)), T[:N], **kw
    )
    _ = int(st2.used)
assert not bool(np.asarray(stats2["overflowed"]).any())
print(f"traced run: {(time.perf_counter()-t0)*1e3:.0f} ms "
      f"({(time.perf_counter()-t0)/N*1e3:.1f} ms/ping)", flush=True)

xplanes = [
    a for a in glob.glob(os.path.join(OUT, "**", "*"), recursive=True)
    if a.endswith(".xplane.pb")
]
for xp in xplanes:
    try:
        print(f"\nTop device ops by total duration ({os.path.basename(xp)}):")
        for name, ps in parse_xplane_top_ops(xp, top=30):
            print(f"  {ps/1e9:10.3f} ms  {name[:100]}")
    except Exception as e:
        print("xplane parse failed:", e)

from profile_trace import parse_xplane_lines
for xp in xplanes:
    print(f"\nLine occupancy ({os.path.basename(xp)}):")
    for name, n, busy, span in parse_xplane_lines(xp):
        pct = 100.0 * busy / span if span else 0.0
        print(f"  {name[:40]:40s} n={n:6d} busy={busy/1e9:8.2f} ms "
              f"span={span/1e9:8.2f} ms occ={pct:5.1f}%")
