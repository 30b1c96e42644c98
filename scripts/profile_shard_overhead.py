"""Measure the frame-parallel sharding machinery's overhead on ONE chip.

The scaling claim (PERFORMANCE.md "Newest structural work" #3) is that
parallel/shard_frames.py shards both halves of the step and its only new
costs are the grouped dedup's extra sort array, the per-(frame, owner)
block peel, the all_to_all, and the psum'd failure reduction.  With a
single real device a Mesh of size 1 runs ALL of that machinery against
itself (the all_to_all is a self-copy), so

    overhead(S=1) = sharded step time - plain single-chip step time

is directly measurable on the tunneled chip and bounds the engine's
fixed cost per window.  Run with the compile cache warm; protocol per
bench-run-protocol (chained dispatches, one scalar sync, perturbed
input byte per rep).

Usage: python scripts/profile_shard_overhead.py  [PINGS=64]
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
from sonar_3d_reconstruction_tpu.parallel.shard_frames import (
    map_ping_sequence_sharded_frames,
)
from sonar_3d_reconstruction_tpu.pipeline import (
    batched_sonar_to_world,
    map_ping_sequence,
)

PINGS = int(os.environ.get("PINGS", "64"))
REPS = int(os.environ.get("REPS", "3"))
WINDOW = 8

cfg = MapperConfig()
images, positions, quats = make_inputs(cfg, PINGS)
print("device:", jax.devices()[0].platform, "pings:", PINGS, flush=True)

mesh = Mesh(np.asarray(jax.devices()[:1]), ("space",))


def run_plain(rep):
    imgs = images.copy()
    imgs[0, 0, 0] = np.uint8(rep % 251)
    st, stats = map_ping_sequence(
        imgs, positions, quats, cfg, backend="brick", dtype=jnp.float32,
        window=WINDOW,
    )
    assert not bool(np.asarray(stats["overflowed"]).any())
    return int(np.asarray(st.used))


def run_plain_wide(rep):
    """Single-chip brick WIDE engine (boxes=None).  The sharded wrapper
    now defaults to COMPACT box keys too, so `sharded - plain_compact`
    isolates the sharding machinery directly; `plain_wide - plain_compact`
    prices the wide fallback the sharded engine uses only for unpackable
    extents."""
    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
    from sonar_3d_reconstruction_tpu.ops.backproject import (
        resolve_capped_tables,
    )
    from sonar_3d_reconstruction_tpu.pipeline import scan_pings_brick

    tables = resolve_capped_tables(
        images, cfg, cfg.image_height, cfg.image_width
    )
    imgs = images.copy()
    imgs[0, 0, 0] = np.uint8(rep % 251)
    T = batched_sonar_to_world(positions, quats, cfg)
    st = init_brick_grid(1 << 16, jnp.float32)
    st, stats = scan_pings_brick(
        st, jnp.asarray(imgs), jnp.asarray(T, jnp.float32), tables=tables,
        cfg=cfg, dtype=jnp.float32, window=WINDOW, boxes=None,
    )
    assert not bool(np.asarray(stats["overflowed"]).any())
    return int(np.asarray(st.used))


def run_sharded(rep):
    imgs = images.copy()
    imgs[0, 0, 0] = np.uint8(rep % 251)
    st, stats = map_ping_sequence_sharded_frames(
        imgs, positions, quats, cfg, mesh=mesh, dtype=jnp.float32,
        window=WINDOW, local_capacity=1 << 16,
    )
    assert not bool(np.asarray(stats["overflowed"]).any())
    return int(np.asarray(st.used).sum())


for name, fn in (
    ("plain compact", run_plain),
    ("plain wide", run_plain_wide),
    ("sharded S=1", run_sharded),
):
    fn(0)  # warm compile + growth discovery
    best = float("inf")
    for rep in range(1, REPS + 1):
        t0 = time.perf_counter()
        fn(rep)
        best = min(best, time.perf_counter() - t0)
    print(
        f"{name:14s} {best*1e3:8.1f} ms  {best*1e3/PINGS:6.2f} ms/ping",
        flush=True,
    )
