"""Measure donated vs non-donated batched apply (and capacity scaling).

The device trace (PERFORMANCE.md) shows the apply's in-place table
scatters force XLA to copy the non-donated state buffers (~200 MB at
capacity 2^24) each window, overlapped with compute via async copies.
Round 1 found donation catastrophic for lax.scan carries; this measures
it for the host-driven chain, where it is the idiomatic fix.

Usage: python scripts/profile_donate.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.utils.compile_cache import enable as _enable
_enable()

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.grid.hash import (
    apply_records_batched, init_hash_grid,
)
from sonar_3d_reconstruction_tpu.ops.backproject import (
    build_fan_tables, required_fan_cap,
)
from sonar_3d_reconstruction_tpu.pipeline import (
    _records_window, batched_sonar_to_world,
)
from bench import make_inputs

cfg = MapperConfig()
N_PINGS = 64
WINDOW = 8
UNIQUE, BATCH, LANE = 122880, 221184, 688128
IB = [221184, 122880]

images, positions, quats = make_inputs(cfg, N_PINGS)
fan_cap = required_fan_cap(images, cfg, cfg.image_height)
tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width,
                          fan_cap=fan_cap)
images_dev = jnp.asarray(images)
T_dev = jnp.asarray(batched_sonar_to_world(positions, quats, cfg),
                    jnp.float32)
jax.block_until_ready((images_dev, T_dev))
print("device:", jax.devices()[0].platform, flush=True)

start, stop = jnp.int32(0), jnp.int32(N_PINGS)
recs, auxs = _records_window(
    images_dev, T_dev, jnp.int32(0), start, stop, tables=tables, cfg=cfg,
    dtype=jnp.float32, unique_budget=UNIQUE, window=WINDOW)
jax.block_until_ready(recs)


def timeit(label, fn, per=1, reps=5):
    fn(0)
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        fn(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:56s} {best/per*1e3:8.2f} ms", flush=True)
    return best / per


def apply_plain(ib):
    return jax.jit(
        partial(apply_records_batched, cfg=cfg, batch_budget=BATCH,
                lane_budget=LANE, insert_budget=ib),
    )


def apply_donated(ib):
    return jax.jit(
        partial(apply_records_batched, cfg=cfg, batch_budget=BATCH,
                lane_budget=LANE, insert_budget=ib),
        donate_argnums=(0,),
    )


for cap_log in (24, 22):
    cap = 1 << cap_log

    for name, mk in (("plain", apply_plain), ("donated", apply_donated)):
        # window 0 of a fresh map inserts ~all its uniques: it MUST run at
        # the cold insert budget or the whole chain is rejected no-op
        # windows and the timing is fiction (review r2 finding) — verified
        # below via st.used > 0 and overflow checks.
        cold_fn, warm_fn = mk(IB[0]), mk(IB[1])

        def chain(rep, cold=cold_fn, warm=warm_fn, cap=cap):
            st = init_hash_grid(cap, jnp.float32)
            st = st._replace(used=st.used + rep)
            for w in range(N_PINGS // WINDOW):
                st, stats = (cold if w == 0 else warm)(st, recs, auxs)
            used = int(st.used)
            assert used > rep, "applies were rejected — timing invalid"
            assert not bool(np.asarray(stats["overflowed"]).any())
            return used

        timeit(f"cap=2^{cap_log} {name} apply x{N_PINGS//WINDOW} (per ping)",
               chain, per=N_PINGS)
