#!/bin/sh
# TPU session for the round-4 measurements (run when the axon tunnel is
# up; see bench-run-protocol memory / CLAUDE.md for the rules: warm cache
# mandatory for timing claims, never edit source while a run is live).
#
# Ordered so the CAPTURE-CRITICAL steps come first (round-3 verdict items
# 1-3): a driver-shaped cold/warm bench with the committed plan, then the
# A/Bs, then the new measurement rows.
#
#  0. Cold-cache wall budget: `python bench.py` exactly as the driver
#     runs it (the committed bench_plan.json should hold the program count
#     to ONE family + latency), wall-timed. -> bench_capture.json + wall
#  1. Warm driver-shaped rerun (the capture-contract number) + the
#     payload-shrink regression check vs the 103.1M record (the shrink is
#     always-on since round 3).             -> bench_warm.json
#  1b. Warm entry()'s compile-check program (full-ping hash update at
#      2^20 — its own program family).     -> graft_warm.log
#  2. dense_mode=row A/B (largest traced line item, 0.40 ms/ping).
#                                           -> bench_row.json
#  3. window=8 A/B (the pre-round-4 default; 16 is the default now).
#                                           -> bench_w8.json
#  4. Radix/binned dedup verdict at bench shapes (verdict item 4).
#                                           -> radix.json
#  5. Publish tick: extraction + serialization at 2^22 (verdict item 5).
#                                           -> publish.json
#  6. chunk=8 batched streaming latency (chunk=1 is the default now).
#                                           -> bench_chunk8.json
#  7. Row/value-op microcosts (capacity sweep, full-table-pass check).
#                                           -> rowscatter.log
#  8. S=1 sharding-machinery overhead.      -> shard_overhead.log
#  9. Capture-readiness check (plan hit + warm wall) — run LAST, after
#     everything above warmed the cache.    -> cache_check.json
#
# After this session: update PERFORMANCE.md rows, set defaults by
# measurement, regenerate bench_plan.json if defaults changed, re-run
# scripts/cache_check.py, and DO NOT commit traced-source changes after
# the final warm run.
set -x
# run from this script's repo (works from an isolated /tmp snapshot too —
# export SONAR3D_COMPILE_CACHE=/root/repo/.jax_cache there so the warm
# cache is shared with the live checkout)
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
# fresh per-session step log (sibling artifacts all use > and overwrite;
# a rerun must not interleave stale WALL/SKIP lines into the summary)
: > /tmp/tpu_ab/walltimes.log

# SESSION_END_EPOCH: absolute unix-time budget for this session.  The
# round-3 failure was the driver's own end-of-round bench colliding with
# TPU-acquisition hangs; the round-4 equivalent would be THIS session
# still hogging the single chip when the driver's capture bench runs.  The
# launcher passes a conservative estimate of (driver bench time − buffer);
# each step declares the seconds it needs COLD and is skipped (logged)
# when the remaining budget is smaller.  Capture-critical steps come
# first, so a late chip return still yields a warmed cache + warm number.
SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
need() {  # need <seconds> <label>: 1 = skip this step, not enough budget
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: needs $1 s, $(left) s left" >> /tmp/tpu_ab/walltimes.log
    return 1
  fi
  return 0
}

# walltime <label> <cmd...>: dash-portable wall clock (no `time` keyword in
# dash and no /usr/bin/time in this image — the original `time python ...`
# died with `time: not found`)
walltime() {
  _label="$1"; shift
  _t0=$(date +%s)
  "$@"
  _rc=$?
  _t1=$(date +%s)
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/walltimes.log
  return $_rc
}

# step 0 measures the TRUE cold wall — lift the salvage deadline so the
# cold compile completes instead of exiting with a partial at 1200 s (the
# driver-facing default stays 1200; this one run is diagnostic).  When the
# budget is tight the deadline is trimmed to (left − 900 s) so the warm
# rerun and cache_check still fit — bench.py salvages a partial at the
# deadline either way.  env(1) scopes the overrides: a dash
# `VAR=x funcname` assignment would PERSIST into every later step.
BD0=$(( $(left) - 900 ))
[ "$BD0" -gt 5400 ] && BD0=5400
[ "$BD0" -lt 900 ] && BD0=900
need 1500 bench_cold && \
walltime bench_cold env BENCH_DEADLINE=$BD0 python bench.py \
                                      > /tmp/tpu_ab/bench_capture.json 2> /tmp/tpu_ab/bench_capture.log
# warm, driver-shaped run at the real default deadline — this is the
# number the capture contract is judged on
need 500 bench_warm && \
walltime bench_warm python bench.py   > /tmp/tpu_ab/bench_warm.json    2> /tmp/tpu_ab/bench_warm.log
# warm the driver's single-chip compile-check program too: entry()'s
# full-ping update_hash_grid at 2^20 is a DIFFERENT program family from
# the bench's brick engine, and the driver compile-checks it on the chip
need 900 graft_warm && \
walltime graft_warm timeout 1800 python -c "import __graft_entry__ as g, jax; fn, a = g.entry(); o = jax.jit(fn)(*a); jax.block_until_ready(o); print('graft entry warm ok')" \
                                      > /tmp/tpu_ab/graft_warm.log 2>&1
# A/B steps get a raised BENCH_DEADLINE: these are diagnostic runs, not
# driver-shaped captures, and a plan MISS (or a stale plan fallback) pays a
# discovery program family that the driver default (1200 s) would
# salvage-kill mid-compile (the w16 apply alone has compiled >30 min)
need 2400 bench_row && \
walltime bench_row env BENCH_DENSE_MODE=row BENCH_DEADLINE=2300 python bench.py \
                                      > /tmp/tpu_ab/bench_row.json     2> /tmp/tpu_ab/bench_row.log
need 2400 bench_w8 && \
walltime bench_w8 env BENCH_WINDOW=8 BENCH_DEADLINE=2300 python bench.py \
                                      > /tmp/tpu_ab/bench_w8.json      2> /tmp/tpu_ab/bench_w8.log
need 1200 radix && \
walltime radix timeout 2400 python scripts/profile_radix.py \
                                      > /tmp/tpu_ab/radix.json         2> /tmp/tpu_ab/radix.log
need 1200 publish && \
walltime publish timeout 2700 python scripts/profile_publish.py \
                                      > /tmp/tpu_ab/publish.json       2> /tmp/tpu_ab/publish.log
need 2400 bench_chunk8 && \
walltime bench_chunk8 env BENCH_LATENCY_CHUNK=8 BENCH_REPS=1 BENCH_DEADLINE=2300 python bench.py \
                                      > /tmp/tpu_ab/bench_chunk8.json  2> /tmp/tpu_ab/bench_chunk8.log
need 900 rowscatter && \
walltime rowscatter timeout 1800 python scripts/profile_rowscatter.py \
                                      > /tmp/tpu_ab/rowscatter.log     2>&1
need 900 shard_overhead && \
walltime shard_overhead timeout 1800 python scripts/profile_shard_overhead.py \
                                      > /tmp/tpu_ab/shard_overhead.log 2>&1
need 120 cache_check && \
walltime cache_check timeout 900 python scripts/cache_check.py \
                                      > /tmp/tpu_ab/cache_check.json   2> /tmp/tpu_ab/cache_check.log
cat /tmp/tpu_ab/walltimes.log
tail -n 1 /tmp/tpu_ab/*.json
true
