"""Phase-level wall-clock profile at the EXACT bench configuration.

Reproduces bench.py's inputs and its warmup-measured snug budgets
(unique=122880, batch=221184, lane=688128, insert=[221184, 122880],
fan_cap=10, capacity 2^22 on the default synthetic survey) and times each
dispatch kind with chained async calls + one scalar sync (CLAUDE.md bench
protocol), so the per-phase numbers add up to the bench's measured
ms/ping.

Sub-phases of the records program are timed as standalone jitted programs
on one ping at the same shapes (their sum slightly exceeds the fused
records program — XLA fuses the boundaries away).

Usage: python scripts/profile_bench_phases.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.utils.compile_cache import enable as _enable
_enable()

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.grid.hash import init_hash_grid
from sonar_3d_reconstruction_tpu.ops.backproject import (
    backproject_ping, build_fan_tables, required_fan_cap,
)
from sonar_3d_reconstruction_tpu.pipeline import (
    _apply_batched, _records_window, batched_sonar_to_world, scan_pings_hash,
)
from bench import make_inputs

cfg = MapperConfig()
N_PINGS = 64
WINDOW = 8
UNIQUE, BATCH, LANE = 122880, 221184, 688128  # bench-measured snug budgets
IB = [221184, 122880]  # cold / warm insert budgets (bench default)
CAPACITY = 1 << 22     # bench default capacity

images, positions, quats = make_inputs(cfg, N_PINGS)
fan_cap = required_fan_cap(images, cfg, cfg.image_height)
tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width,
                          fan_cap=fan_cap)
lanes = tables.candidates_per_ping(cfg.occupied_window)
images_dev = jnp.asarray(images)
T_dev = jnp.asarray(batched_sonar_to_world(positions, quats, cfg),
                    jnp.float32)
jax.block_until_ready((images_dev, T_dev))
print(f"lanes/ping={lanes} fan_cap={fan_cap} U={UNIQUE} B={BATCH} L={LANE} "
      f"device={jax.devices()[0].platform}", flush=True)

start, stop = jnp.int32(0), jnp.int32(N_PINGS)


def timeit(label, fn, per=1, reps=5):
    fn(0)
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        fn(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:52s} {best/per*1e3:8.2f} ms", flush=True)
    return best / per


# --- records program (the window's first dispatch), amortized per ping ---
def rec_window(rep):
    outs = []
    for w in range(0, N_PINGS, WINDOW):
        recs, auxs = _records_window(
            images_dev.at[0, 0, 0].set(np.uint8(rep % 251)), T_dev,
            jnp.int32(w), start, stop, tables=tables, cfg=cfg,
            dtype=jnp.float32, unique_budget=UNIQUE, window=WINDOW)
        outs.append(recs)
    return int(outs[-1].n_unique[-1])

timeit(f"records_window x{N_PINGS//WINDOW} (per ping)", rec_window,
       per=N_PINGS)

# one window of records for the apply timings
recs, auxs = _records_window(
    images_dev, T_dev, jnp.int32(0), start, stop, tables=tables, cfg=cfg,
    dtype=jnp.float32, unique_budget=UNIQUE, window=WINDOW)
jax.block_until_ready(recs)
st0 = init_hash_grid(CAPACITY, jnp.float32)


def apply_chain(rep):
    st = st0._replace(used=st0.used + rep)
    for w in range(N_PINGS // WINDOW):
        st, stats = _apply_batched(
            st, recs, auxs, cfg=cfg, batch_budget=BATCH, lane_budget=LANE,
            insert_budget=IB[0] if w == 0 else IB[1])
    used = int(st.used)
    assert used > rep and not bool(np.asarray(stats["overflowed"]).any())
    return used

timeit(f"apply_batched x{N_PINGS//WINDOW} (per ping)", apply_chain,
       per=N_PINGS)


def full(rep):
    st = init_hash_grid(CAPACITY, jnp.float32)
    st, stats = scan_pings_hash(
        st, images_dev.at[0, 0, 0].set(np.uint8(rep % 251)), T_dev,
        tables=tables, cfg=cfg, dtype=jnp.float32, unique_budget=UNIQUE,
        window=WINDOW, batch_budget=BATCH, lane_budget=LANE,
        insert_budget=IB)
    return int(st.used)

timeit(f"full engine {N_PINGS} pings (per ping)", full, per=N_PINGS)

# NOTE: standalone sub-phase programs (backproject-only, dedup-only) were
# removed: measured standalone they each cost MORE than the whole fused
# records program (XLA materializes boundaries the fused program never
# pays), so their numbers misled rather than informed.  Sub-records
# attribution needs the op-level trace (scripts/profile_trace.py).
