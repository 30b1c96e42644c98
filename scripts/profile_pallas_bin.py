"""A/B the fused Pallas binning kernel (dense_mode="pallas") against the
XLA bfv window apply at the EXACT bench configuration (VERDICT r4 item 1).

Subcommands (positional arg, default "ab"):

  smoke  — compile + run the kernel standalone on SMALL shapes on the real
           chip and assert exact agreement with a NumPy reconstruction of
           the same records (fast first signal: Mosaic lowering + numerics
           on hardware before paying the full bench-shape compile).
  ab     — timed A/B of `MODES` (env, default "bfv,pallas") through
           scan_pings_brick at the committed bench plan budgets (one JSON
           line per mode).  The bfv run hits the warmed plan family; the
           pallas run pays its own first compile.
  trace  — jax.profiler trace of one window-engine pass in `TRACE_MODE`
           (default "pallas"); prints top ops by self time (raw xplane
           parser from scripts/profile_trace.py).

Usage (always from a git-archive snapshot through scripts/tpu_poll_and_run.sh
— never against a live-edited tree):
  python scripts/profile_pallas_bin.py smoke
  MODES=bfv,pallas,pallas-tb16 python scripts/profile_pallas_bin.py ab
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _setup():
    from sonar_3d_reconstruction_tpu.utils.compile_cache import enable

    enable()
    import jax

    jax.devices()
    return jax


def smoke():
    jax = _setup()
    import jax.numpy as jnp

    from sonar_3d_reconstruction_tpu.config import MapperConfig
    from sonar_3d_reconstruction_tpu.pallas.bin_kernel import pallas_bin_apply

    cfg = MapperConfig()
    rng = np.random.default_rng(7)
    B, vol, o, f_bits, NB = 16, 64, 6, 4, 64
    # draw unique (brick, frame, offset) records, sorted
    n = 4000
    combos = rng.choice(NB * B * vol, size=n, replace=False)
    combos.sort()
    brick = combos // (B * vol)
    frame = (combos // vol) % B
    off = combos % vol
    key = (brick.astype(np.uint32) << (o + f_bits)) | (frame.astype(np.uint32) << o) | off.astype(np.uint32)
    cnt = rng.integers(1, 40, size=n).astype(np.uint32)
    occ = (rng.random(n) < 0.5).astype(np.uint32) * rng.integers(0, 2, size=n).astype(np.uint32) * cnt
    occ = np.minimum(occ, cnt)
    pay = (cnt << 16) | occ
    starts = np.searchsorted(brick, np.arange(NB + 1)).astype(np.int32)
    rows = rng.normal(size=(NB, vol)).astype(np.float32)

    t0 = time.perf_counter()
    v, upd = pallas_bin_apply(
        jnp.asarray(key), jnp.asarray(pay), jnp.asarray(starts),
        jnp.asarray(rows), B=B, vol=vol, f_bits=f_bits, o=o, cfg=cfg,
        interpret=os.environ.get("SMOKE_INTERPRET", "0") == "1",
    )
    v, upd = np.asarray(v), np.asarray(upd)
    t1 = time.perf_counter()

    # NumPy oracle: dense accumulate + the same sequential chain math
    from sonar_3d_reconstruction_tpu.ops.logodds import finalize_voxel_updates

    dcnt = np.zeros((NB, B, vol), np.float32)
    docc = np.zeros((NB, B, vol), np.float32)
    dcnt[brick, frame, off] = cnt
    docc[brick, frame, off] = occ
    ref = jnp.asarray(rows)
    occL, freL = np.float32(cfg.log_odds_occupied), np.float32(cfg.log_odds_free)
    for f in range(B):
        c, q = jnp.asarray(dcnt[:, f, :]), jnp.asarray(docc[:, f, :])
        ref = finalize_voxel_updates(
            ref, q * occL + (c - q) * freL, c, q > 0, cfg
        )
    ref = np.asarray(ref)
    ok_v = np.array_equal(v, ref)
    ok_u = np.array_equal(upd, dcnt.sum(axis=1) > 0)
    print(json.dumps({
        "step": "pallas_bin_smoke", "exact_values": bool(ok_v),
        "exact_touched": bool(ok_u), "compile_plus_run_s": round(t1 - t0, 1),
        "max_abs_diff": float(np.abs(v - ref).max()),
    }), flush=True)
    assert ok_v and ok_u


def _bench_setup(jax, window, dense_mode_for_plan="bfv"):
    import jax.numpy as jnp  # noqa: F401

    import bench as B

    from sonar_3d_reconstruction_tpu.config import MapperConfig
    from sonar_3d_reconstruction_tpu.ops.backproject import (
        build_fan_tables,
        required_fan_cap,
        required_free_cap,
        required_window_cap,
    )
    from sonar_3d_reconstruction_tpu.ops.packing import compute_window_boxes
    from sonar_3d_reconstruction_tpu.pipeline import batched_sonar_to_world

    cfg = MapperConfig()
    n_pings = int(os.environ.get("PINGS", "256"))
    images, positions, quats = B.make_inputs(cfg, n_pings)
    fan_cap = required_fan_cap(images, cfg, cfg.image_height)
    window_cap = required_window_cap(images, cfg, cfg.image_height)
    free_cap = required_free_cap(images, cfg, cfg.image_height)
    tables = build_fan_tables(
        cfg, cfg.image_height, cfg.image_width, fan_cap=fan_cap,
        window_cap=window_cap, free_cap=free_cap,
    )
    plan_key = B._plan_key(
        cfg, n_pings, window, "brick", dense_mode_for_plan,
        (fan_cap, window_cap, free_cap), 1 << 16, 0,
    )
    with open(B.PLAN_PATH) as f:
        plans = json.load(f)
    if plan_key not in plans:
        # short-survey traces (PINGS=32) have no committed key; the
        # budgets are per-window and n_pings-independent — reuse the
        # 256-ping capture plan
        images256, _, _ = B.make_inputs(cfg, 256)
        plan_key = B._plan_key(
            cfg, 256, window, "brick", dense_mode_for_plan,
            (required_fan_cap(images256, cfg, cfg.image_height),
             required_window_cap(images256, cfg, cfg.image_height),
             required_free_cap(images256, cfg, cfg.image_height)),
            1 << 16, 0,
        )
    plan = plans[plan_key]
    T_host = batched_sonar_to_world(positions, quats, cfg)
    boxes = compute_window_boxes(
        T_host[:, :3, 3], cfg.max_range, cfg.voxel_resolution, window, 2,
        frame_bits=max(1, (window - 1).bit_length()),
    )
    return cfg, n_pings, images, T_host, tables, plan, boxes


def _make_run(jax, cfg, images, T_host, tables, plan, boxes, window,
              **scan_extra):
    import jax.numpy as jnp

    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid
    from sonar_3d_reconstruction_tpu.pipeline import scan_pings_brick

    images_dev = jnp.asarray(images)
    T_dev = jnp.asarray(T_host, jnp.float32)
    jax.block_until_ready((images_dev, T_dev))

    def run(mode, rep):
        # raw-candidate modes bypass the per-frame dedup: the lane budget
        # must cover VALID CANDIDATES (not compacted records) — run at
        # full lattice width first; snug from measured batch_n_lanes later
        raw = "raw" in mode.split("-")
        imgs = images_dev.at[0, 0, 0].set(np.uint8(rep % 251))
        st = init_brick_grid(plan["capacity"], jnp.float32)
        st, stats = scan_pings_brick(
            st, imgs, T_dev, tables=tables, cfg=cfg, dtype=jnp.float32,
            unique_budget=plan["unique_budget"], window=window,
            brick_budget=plan["brick_budget"],
            lane_budget=None if raw else plan["lane_budget"],
            insert_budget=plan["insert_budget"],
            vox_budget=plan["vox_budget"], dense_mode=mode,
            dedup_lane_budget=plan["dedup_lane_budget"], boxes=boxes,
            **scan_extra,
        )
        ov, used = jax.device_get((stats["overflowed"], st.used))
        assert not bool(np.asarray(ov).any()), f"{mode}: overflow"
        _ = int(used)
        return stats

    return run


def ab():
    jax = _setup()
    window = int(os.environ.get("WINDOW", "16"))
    cfg, n_pings, images, T_host, tables, plan, boxes = _bench_setup(
        jax, window
    )
    run = _make_run(jax, cfg, images, T_host, tables, plan, boxes, window)
    reps = int(os.environ.get("REPS", "3"))
    for mode in os.environ.get("MODES", "bfv,pallas").split(","):
        t0 = time.perf_counter()
        stats = run(mode, 0)  # compile + settle
        compile_s = time.perf_counter() - t0
        total = int(np.asarray(stats["num_candidates"]).sum())
        best = float("inf")
        for rep in range(1, reps + 1):
            t0 = time.perf_counter()
            run(mode, rep)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "step": "pallas_bin_ab", "mode": mode,
            "updates_per_sec": total / best,
            "ms_per_ping": 1e3 * best / n_pings,
            "pings_per_sec": n_pings / best,
            "first_run_s": round(compile_s, 1),
            "max_lanes": int(np.asarray(stats["batch_n_lanes"]).max()),
            "n_pings": n_pings, "window": window,
        }), flush=True)


def trace():
    jax = _setup()
    window = int(os.environ.get("WINDOW", "16"))
    mode = os.environ.get("TRACE_MODE", "pallas")
    os.environ.setdefault("PINGS", "32")
    cfg, n_pings, images, T_host, tables, plan, boxes = _bench_setup(
        jax, window
    )
    run = _make_run(jax, cfg, images, T_host, tables, plan, boxes, window)
    run(mode, 0)  # compile
    out_dir = os.environ.get("TRACE_DIR", "/tmp/pallas_bin_trace")
    with jax.profiler.trace(out_dir):
        run(mode, 1)
    import glob

    from profile_trace import parse_xplane_top_ops  # scripts/ sibling

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no xplane under {out_dir}"
    print(f"trace mode={mode} pings={n_pings} ({paths[-1]})", flush=True)
    for name, ps in parse_xplane_top_ops(paths[-1], top=40):
        print(f"{ps / 1e9 / n_pings:9.4f} ms/ping  {name}", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "ab"
    {"smoke": smoke, "ab": ab, "trace": trace}[cmd]()
