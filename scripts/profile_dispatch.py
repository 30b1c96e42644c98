"""Attribute and attack the fixed per-window host-chain + dispatch cost
(VERDICT r4 item 3: 1.8 ms/window through the tunnel — ~8% of the
single-chip w16 step and the binding constraint on the projected
multi-chip scaling, PERFORMANCE.md scaling table).

Steps (each one JSON line):

  null   — pure dispatch-floor probe: chain N calls of a TRIVIAL jitted
           fn taking the full window-step arg tree (state pytree + the
           stacked images + scalars), one sync at the end.  Measures the
           per-dispatch host+tunnel cost at the real arg complexity with
           ~zero device work.
  group  — the window engine at window_group in `GROUPS` (env, default
           "1,2,4"): G windows chained inside ONE program.  G=1 is the
           warm bfv baseline; G>1 pays its own first compile.  The
           comparison isolates the fixed per-window cost (device work is
           identical by construction — parity-tested on CPU).

Run from a git-archive snapshot via scripts/tpu_poll_and_run.sh.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_pallas_bin import _bench_setup, _make_run, _setup


def null_probe(jax, cfg, images, T_host, plan, window, n_pings):
    import jax.numpy as jnp

    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid

    images_dev = jnp.asarray(images)
    T_dev = jnp.asarray(T_host, jnp.float32)
    st = init_brick_grid(plan["capacity"], jnp.float32)
    jax.block_until_ready((images_dev, T_dev, st))

    @jax.jit
    def null_step(state, images, transforms, w, start, stop, box_min):
        # touches every arg (no DCE of the transfer) but ~zero device work
        return state._replace(
            used=state.used + w + start + stop
            + images[0, 0, 0].astype(jnp.int32)
            + transforms[0, 0, 0].astype(jnp.int32) + box_min[0]
        )

    n_windows = n_pings // window
    start = jnp.int32(0)
    stop = jnp.int32(n_pings)
    box = jnp.zeros((3,), jnp.int32)

    def chain(rep):
        s = st._replace(used=jnp.int32(rep))
        for w in range(n_windows):
            s = null_step(s, images_dev, T_dev, jnp.int32(w), start, stop,
                          box)
        return int(s.used)  # one sync

    chain(0)  # compile
    best = float("inf")
    for r in range(1, 4):
        t0 = time.perf_counter()
        chain(r)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "step": "dispatch_null",
        "ms_per_dispatch": 1e3 * best / n_windows,
        "n_dispatches": n_windows,
    }), flush=True)


def main():
    jax = _setup()
    window = int(os.environ.get("WINDOW", "16"))
    cfg, n_pings, images, T_host, tables, plan, boxes = _bench_setup(
        jax, window
    )

    if os.environ.get("NULL", "1") == "1":
        null_probe(jax, cfg, images, T_host, plan, window, n_pings)

    reps = int(os.environ.get("REPS", "3"))
    mode = os.environ.get("MODES", "bfv")
    for g in [int(x) for x in os.environ.get("GROUPS", "1,2,4").split(",")]:
        run = _make_run(
            jax, cfg, images, T_host, tables, plan, boxes, window,
            window_group=g,
            records_batch=int(os.environ.get("RECORDS_BATCH", "1")),
        )
        t0 = time.perf_counter()
        stats = run(mode, 0)
        compile_s = time.perf_counter() - t0
        total = int(np.asarray(stats["num_candidates"]).sum())
        best = float("inf")
        for rep in range(1, reps + 1):
            t0 = time.perf_counter()
            run(mode, rep)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "step": "dispatch_group", "mode": mode, "window_group": g,
            "updates_per_sec": total / best,
            "ms_per_ping": 1e3 * best / n_pings,
            "first_run_s": round(compile_s, 1),
            "n_pings": n_pings, "window": window,
        }), flush=True)


if __name__ == "__main__":
    main()
