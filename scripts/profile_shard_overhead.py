"""Measure the frame-parallel sharding machinery's overhead on ONE chip.

The scaling claim (PERFORMANCE.md "Newest structural work" #3) is that
parallel/shard_frames.py shards both halves of the step and its only new
costs are the grouped dedup's owner fold, the per-(frame, owner) block
peel, the all_to_all, and the psum'd failure reduction.  With a single
real device a Mesh of size 1 runs ALL of that machinery against itself
(the all_to_all is a self-copy), so

    overhead(S=1) = sharded compact step - plain compact step

is directly measurable on the tunneled chip and bounds the engine's
fixed cost per window; `plain wide - plain compact` additionally prices
the wide fallback.  Protocol per bench-run-protocol: device-resident
timed inputs (one byte perturbed ON DEVICE per rep — a host copy would
re-ship ~16 MB through the ~30 MB/s tunnel every rep), budgets captured
from a warmup wrapper call and reused so no variant grows inside the
timed region, identical 2^16 brick capacity everywhere, warm compile
cache.

Usage: python scripts/profile_shard_overhead.py  [PINGS=64 REPS=3]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.utils.compile_cache import enable as _enable

_enable()

from jax.sharding import Mesh

from bench import make_inputs
from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
from sonar_3d_reconstruction_tpu.ops.backproject import resolve_capped_tables
from sonar_3d_reconstruction_tpu.ops.packing import compute_window_boxes
from sonar_3d_reconstruction_tpu.parallel.shard_brick import (
    init_sharded_brick_grid,
)
from sonar_3d_reconstruction_tpu.parallel.shard_frames import (
    make_window_scan_sharded_frames,
    map_ping_sequence_sharded_frames,
)
from sonar_3d_reconstruction_tpu.grid.brick import DEFAULT_BRICK_BITS
from sonar_3d_reconstruction_tpu.pipeline import (
    batched_sonar_to_world,
    scan_pings_brick,
)

PINGS = int(os.environ.get("PINGS", "64"))
REPS = int(os.environ.get("REPS", "3"))
WINDOW = 8
CAP = 1 << 16

cfg = MapperConfig()
images, positions, quats = make_inputs(cfg, PINGS)
print("device:", jax.devices()[0].platform, "pings:", PINGS, flush=True)

tables = resolve_capped_tables(images, cfg, cfg.image_height, cfg.image_width)
T = batched_sonar_to_world(positions, quats, cfg)
boxes = compute_window_boxes(
    T[:, :3, 3], cfg.max_range, cfg.voxel_resolution, WINDOW,
    DEFAULT_BRICK_BITS, frame_bits=max(1, (WINDOW - 1).bit_length()),
)
assert boxes is not None
mesh = Mesh(np.asarray(jax.devices()[:1]), ("space",))

# warmup through the sharded wrapper: captures post-growth budgets so the
# timed closures below never grow (bench.py protocol)
eff = {}
_st, _stats = map_ping_sequence_sharded_frames(
    images, positions, quats, cfg, mesh=mesh, dtype=jnp.float32,
    window=WINDOW, local_capacity=CAP, tables=tables, effective=eff,
)
assert not bool(np.asarray(_stats["overflowed"]).any())
UB = eff["unique_budget"]
XB = eff["xchg_budget"]

# device-resident timed inputs; one u8 perturbed ON DEVICE per rep
images_dev = jnp.asarray(images)
T_dev = jnp.asarray(T, jnp.float32)
jax.block_until_ready((images_dev, T_dev))

fscan = make_window_scan_sharded_frames(
    mesh, tables, cfg, jnp.float32, "space", UB, WINDOW, XB,
    None, None, None, DEFAULT_BRICK_BITS, eff["box_min_bits"],
)


def run_plain(rep, boxes=boxes):
    imgs = images_dev.at[0, 0, 0].set(np.uint8(rep % 251))
    st = init_brick_grid(CAP, jnp.float32)
    st, stats = scan_pings_brick(
        st, imgs, T_dev, tables=tables, cfg=cfg, dtype=jnp.float32,
        window=WINDOW, unique_budget=UB, boxes=boxes,
    )
    assert not bool(np.asarray(stats["overflowed"]).any())
    return int(st.used)


def run_plain_wide(rep):
    """Wide two-word fallback — prices the compact box keys."""
    return run_plain(rep, boxes=None)


def run_sharded(rep):
    imgs = images_dev.at[0, 0, 0].set(np.uint8(rep % 251))
    st = init_sharded_brick_grid(mesh, CAP, jnp.float32)
    st, stats = fscan(st, imgs, T_dev, jnp.int32(0), box_mins=boxes[0])
    assert not bool(np.asarray(stats["overflowed"]).any())
    return int(np.asarray(st.used).sum())


for name, fn in (
    ("plain compact", run_plain),
    ("plain wide", run_plain_wide),
    ("sharded compact S=1", run_sharded),
):
    fn(0)  # warm compile
    best = float("inf")
    for rep in range(1, REPS + 1):
        t0 = time.perf_counter()
        fn(rep)
        best = min(best, time.perf_counter() - t0)
    print(
        f"{name:20s} {best*1e3:8.1f} ms  {best*1e3/PINGS:6.2f} ms/ping",
        flush=True,
    )

# VERDICT r4 item 6: attribute the ~5.5 ms/ping S=1 machinery cost with a
# device trace of the sharded step vs the plain step (TRACE=1).
if os.environ.get("TRACE", "0") == "1":
    import glob

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_trace import parse_xplane_top_ops

    for name, fn in (("sharded", run_sharded), ("plain", run_plain)):
        out = f"/tmp/shard_s1_trace_{name}"
        with jax.profiler.trace(out):
            fn(97)
        paths = sorted(
            glob.glob(os.path.join(out, "**", "*.xplane.pb"),
                      recursive=True),
            key=os.path.getmtime,
        )
        print(f"== top ops: {name} (per-ping over {PINGS}) ==", flush=True)
        for op, ps in parse_xplane_top_ops(paths[-1], top=30):
            print(f"{ps/1e9/PINGS:9.4f} ms/ping  {op}", flush=True)
