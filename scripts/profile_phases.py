"""Phase-level wall-clock profile of the frame-update engine on the real TPU.

Times each dispatch kind separately (chained async, one scalar sync at the
end, inputs varied per rep — see CLAUDE.md benchmark traps) to locate where
the 22 ms/ping actually goes: device work vs per-dispatch host/tunnel
overhead.

Usage: python scripts/profile_phases.py [phase ...]
Phases: dispatch records apply window gather all
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
from sonar_3d_reconstruction_tpu.grid.hash import (
    init_hash_grid, default_unique_budget,
)
from sonar_3d_reconstruction_tpu.ops.backproject import build_fan_tables
from sonar_3d_reconstruction_tpu.pipeline import (
    batched_sonar_to_world, _records_single, _apply_batched, scan_pings_hash,
)
from bench import make_inputs

cfg = MapperConfig()
N_PINGS = 16
WINDOW = 8
images, positions, quats = make_inputs(cfg, N_PINGS)
tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
T = batched_sonar_to_world(positions, quats, cfg)
images_dev = jnp.asarray(images)
T_dev = jnp.asarray(T, jnp.float32)
budget = default_unique_budget(tables.candidates_per_ping(cfg.occupied_window))
print(f"candidates/ping={tables.candidates_per_ping(cfg.occupied_window)} "
      f"budget={budget} device={jax.devices()[0].platform}", flush=True)

start = jnp.int32(0)
stop = jnp.int32(N_PINGS)


def timeit(label, fn, reps=5):
    fn(0)  # warm/compile
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        fn(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best*1e3:9.2f} ms", flush=True)
    return best


phases = set(sys.argv[1:]) or {"all"}


if phases & {"dispatch", "all"}:
    # Chained trivial steps: y = x + c. Measures pure dispatch overhead.
    @jax.jit
    def tiny(x, c):
        return x + c

    x0 = jnp.zeros((8,), jnp.float32)

    def chain(rep, k):
        x = x0 + rep
        for i in range(k):
            x = tiny(x, jnp.float32(i + rep))
        return int(x[0])

    for k in (1, 8, 32):
        timeit(f"dispatch chain k={k} (tiny program)", lambda r, k=k: chain(r, k))


if phases & {"records", "all"}:
    def rec_one(rep):
        rec, aux = _records_single(
            images_dev, T_dev, jnp.int32(rep % N_PINGS), start, stop,
            tables=tables, cfg=cfg, dtype=jnp.float32, unique_budget=budget)
        return int(rec.n_unique)

    timeit("records_single x1 (sync)", rec_one)

    def rec_eight(rep):
        outs = []
        for i in range(8):
            rec, aux = _records_single(
                images_dev, T_dev, jnp.int32((rep + i) % N_PINGS), start, stop,
                tables=tables, cfg=cfg, dtype=jnp.float32, unique_budget=budget)
            outs.append(rec)
        return int(outs[-1].n_unique)  # one sync at the end

    timeit("records_single x8 (async chain, 1 sync)", rec_eight)


if phases & {"apply", "window", "all"}:
    # build one window of records once
    recs_list, auxs_list = [], []
    for i in range(WINDOW):
        rec, aux = _records_single(
            images_dev, T_dev, jnp.int32(i), start, stop,
            tables=tables, cfg=cfg, dtype=jnp.float32, unique_budget=budget)
        recs_list.append(rec)
        auxs_list.append(aux)
    recs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *recs_list)
    auxs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *auxs_list)
    jax.block_until_ready(recs)
    st0 = init_hash_grid(1 << 24, jnp.float32)
    bb = min(WINDOW * budget, 4 * budget)

if phases & {"apply", "all"}:
    def apply_one(rep):
        # vary state trivially so the runtime can't dedup the call
        st = st0._replace(used=st0.used + rep)
        st, stats = _apply_batched(st, recs, auxs, cfg=cfg, batch_budget=bb)
        return int(st.used)

    timeit(f"apply_batched window={WINDOW} bb={bb}", apply_one)

if phases & {"window", "all"}:
    def window_chain(rep):
        st = st0._replace(used=st0.used + rep)
        st, stats = scan_pings_hash(
            st, images_dev, T_dev, tables=tables, cfg=cfg,
            dtype=jnp.float32, unique_budget=budget, window=WINDOW)
        return int(st.used)

    t = timeit(f"full window engine, {N_PINGS} pings w={WINDOW}", window_chain)
    print(f"  -> {t/N_PINGS*1e3:.2f} ms/ping", flush=True)


if phases & {"gather", "all"}:
    # bucket row gather cost: current two (U,8) gathers vs interleaved (U,16)
    U = budget
    cap = 1 << 24
    nb = cap // 8
    key_hi = jnp.zeros((cap,), jnp.uint32)
    key_lo = jnp.zeros((cap,), jnp.uint32)
    inter = jnp.zeros((nb, 16), jnp.uint32)
    rng = np.random.default_rng(0)
    buckets = jnp.asarray(rng.integers(0, nb, size=(8, U)), jnp.int32)

    @jax.jit
    def two_gathers(b, khi, klo):
        rh = khi.reshape(nb, 8)[b]
        rl = klo.reshape(nb, 8)[b]
        return jnp.sum(rh ^ rl, dtype=jnp.uint32)

    @jax.jit
    def one_gather16(b, it):
        rows = it[b]
        return jnp.sum(rows[:, :8] ^ rows[:, 8:], dtype=jnp.uint32)

    timeit("lookup: two (U,8) row gathers",
           lambda r: int(two_gathers(buckets[r % 8], key_hi, key_lo)))
    timeit("lookup: one (U,16) interleaved gather",
           lambda r: int(one_gather16(buckets[r % 8], inter)))
