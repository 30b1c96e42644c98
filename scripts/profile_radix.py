"""Measured verdict on binned/radix dedup vs the comparison-sort dedup.

Round-3 attribution: ~50% of the 1.70 ms/ping step is sorts/scans, and the
compact box keys are single u32s with host-known bit layout — so a radix/
bucket histogram pass over 2^k bins is the obvious candidate to replace the
comparison sorts (round-3 verdict item 4).  This script measures every
building block a binned design would stand on, at the EXACT bench-frame
shapes (free-capped lattice width, measured valid fraction, real key
distribution from the bench survey's first ping), against the production
sort path:

  A. dedup_frame_compact      — the production sort-based dedup (baseline);
  B. dense scatter-add histogram over the full 2^V box space (the "one
     segment_sum over bins" design: count<<16|occ folded into one u32 add);
  C. the radix permute core: rank = bin_start[bin(key)] + intra_rank, then
     scatter lanes to ranked positions (every radix sort pays this per
     pass, whatever the digit width);
  D. one-hot matmul histogram at brick granularity (MXU route: bins =
     2^brick_bits_total, counts = ones @ onehot(bin)).

If B/C/D lose (the platform cost model predicts scatter at ~10 ns/index
makes any permute/atomic-histogram pass ~5-20x the sort's cost), the
recorded numbers make the sort-bound ceiling STRUCTURE-INDEPENDENT: not
"our dedup is sort-based" but "every binning alternative pays more at this
chip's scatter cost".

Usage: python scripts/profile_radix.py [--platform cpu] [--reps 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--chain", type=int, default=8,
                    help="chained dispatches per timing sync")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    # platform override BEFORE the cache enable (cache dir is picked by the
    # configured platform; see profile_publish.py / CLAUDE.md)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from sonar_3d_reconstruction_tpu.utils.compile_cache import (
        enable as _enable,
    )

    _enable()

    from bench import make_inputs
    from sonar_3d_reconstruction_tpu.config import MapperConfig
    from sonar_3d_reconstruction_tpu.grid.brick import DEFAULT_BRICK_BITS
    from sonar_3d_reconstruction_tpu.ops.backproject import (
        backproject_ping,
        build_fan_tables,
        required_fan_cap,
        required_free_cap,
        required_window_cap,
    )
    from sonar_3d_reconstruction_tpu.ops.dedup import dedup_frame_compact
    from sonar_3d_reconstruction_tpu.ops.packing import (
        compute_window_boxes,
        pack_box_keys,
    )
    from sonar_3d_reconstruction_tpu.pipeline import batched_sonar_to_world

    cfg = MapperConfig()
    images, positions, quats = make_inputs(cfg, 8)
    tables = build_fan_tables(
        cfg, cfg.image_height, cfg.image_width,
        fan_cap=required_fan_cap(images, cfg, cfg.image_height),
        window_cap=required_window_cap(images, cfg, cfg.image_height),
        free_cap=required_free_cap(images, cfg, cfg.image_height),
    )
    T_host = batched_sonar_to_world(positions, quats, cfg)
    boxes = compute_window_boxes(
        T_host[:, :3, 3], cfg.max_range, cfg.voxel_resolution, 8,
        DEFAULT_BRICK_BITS, frame_bits=3,
    )
    assert boxes is not None
    box_mins, box_bits = boxes
    key_bits = sum(box_bits) + 3 * DEFAULT_BRICK_BITS  # total V bits
    n_bins = 1 << key_bits
    brick_bins = 1 << sum(box_bits)

    # real frame-0 candidates (keys + occ + valid) from the bench survey,
    # packed exactly as the engine packs them (ops/records.frame_records)
    @jax.jit
    def make_candidates(image, T):
        cand = backproject_ping(image, T, tables, cfg, dtype=jnp.float32)
        keys = jnp.floor(
            cand["points"] / cfg.voxel_resolution
        ).astype(jnp.int32)
        bkey, in_range = pack_box_keys(
            keys, jnp.asarray(box_mins[0]), box_bits, DEFAULT_BRICK_BITS
        )
        return bkey, cand["is_occupied"], cand["valid"] & in_range

    key, occ, valid = make_candidates(
        jnp.asarray(images[0]), jnp.asarray(T_host[0], jnp.float32)
    )
    jax.block_until_ready(key)
    N = int(key.shape[0])
    n_valid = int(np.asarray(valid).sum())
    unique_budget = 94208
    lane_budget = 229376 if N > 229376 else N

    def timeit(fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(max(3, args.reps // args.chain)):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.chain):
                o = fn(*xs)
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / args.chain)
        return best

    results = {
        "device": jax.devices()[0].platform,
        "lattice_lanes": N,
        "valid_lanes": n_valid,
        "key_bits": key_bits,
        "hist_bins": n_bins,
        "brick_bins": brick_bins,
    }

    def row(name, fn, *xs):
        # each candidate fails independently (the 2^V dense histogram can
        # OOM on some configs) — the session artifact must still print the
        # rows that DID measure
        print(f"measuring {name} ...", file=sys.stderr, flush=True)
        try:
            results[name] = 1e3 * timeit(fn, *xs)
        except Exception as e:  # noqa: BLE001 — unattended chip session
            results[name] = f"ERROR: {type(e).__name__}: {e}"[:300]
        print(f"  {name} = {results[name]}", file=sys.stderr, flush=True)

    # A. production sort dedup
    f_sort = jax.jit(lambda k, o, v: dedup_frame_compact(
        k, o, v, unique_budget, lane_budget).key)
    row("A_sort_dedup_ms", f_sort, key, occ, valid)

    # B. dense histogram over the box space: one u32 scatter-add per lane
    def f_hist(k, o, v):
        upd = jnp.where(v, (jnp.uint32(1) << 16) | o.astype(jnp.uint32),
                        jnp.uint32(0))
        idx = jnp.where(v, k, jnp.uint32(0))
        return jnp.zeros((n_bins,), jnp.uint32).at[idx].add(upd)

    row("B_dense_hist_ms", jax.jit(f_hist), key, occ, valid)

    # C. radix permute core (one 8-bit digit pass): histogram + exclusive
    # bin starts + intra-bin rank (sorted-bin trick is unavailable without
    # the sort, so rank via a second scatter pass is modeled by cumsum over
    # a (bins,) one-hot — here we charge only histogram + permute scatter,
    # an UNDERCOUNT in the radix design's favor)
    digit_bins = 256

    def f_permute(k, o, v):
        d = (k >> (key_bits - 8)) & jnp.uint32(0xFF)
        hist = jnp.zeros((digit_bins,), jnp.int32).at[d].add(1)
        starts = jnp.cumsum(hist) - hist
        # fake intra rank (iota) — a real pass needs a per-bin running
        # count, which costs at least this much again
        pos = (starts[d] + (jnp.arange(N, dtype=jnp.int32) % 16)) % N
        return jnp.zeros((N,), jnp.uint32).at[pos].set(k)

    row("C_radix_pass_ms", jax.jit(f_permute), key, occ, valid)

    # D. one-hot matmul digit histogram (MXU route) — a 12-bit radix digit;
    # the one-hot is (N, 4096) bf16 = ~1.9 GB of implied traffic, which is
    # already the design's floor before any reordering happens
    digit12 = 4096

    def f_onehot(k, v):
        b = ((k >> (key_bits - 12)) & jnp.uint32(0xFFF)).astype(jnp.int32)
        oh = jax.nn.one_hot(jnp.where(v, b, -1), digit12, dtype=jnp.bfloat16)
        return jnp.ones((1, N), jnp.bfloat16) @ oh

    row("D_onehot_matmul_ms", jax.jit(f_onehot), key, valid)

    # reference row: the plain u32 sort at lattice width (sort1's cost)
    f_s1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1,
                                          is_stable=False)[0])
    row("sort1_u32_ms", f_s1, key)

    print(json.dumps(results))  # one line: session artifact is json.loads-able


if __name__ == "__main__":
    main()
