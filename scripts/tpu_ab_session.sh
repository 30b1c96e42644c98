#!/bin/sh
# TPU A/B session for the pending row-3 experiments (run when the axon
# tunnel is up; see bench-run-protocol memory / CLAUDE.md for the rules:
# warm cache mandatory, never edit source while a run is live).
#
# Pending questions this answers, in priority order:
#   1. Does the always-on compact-dedup payload shrink hold/raise the
#      103.1M updates/s record?                       -> bench_scalar.json
#   2. Does dense_mode=row beat the scalar dense scatter (the single
#      largest traced line item, 0.40 ms/ping)?       -> bench_row.json
#   3. Does window=16 pay now that sorts shrank 4x (per-window fixed
#      costs halve; w16 previously measured ~= w8)?   -> bench_w16.json
#   4. Row/value-op microcosts incl. the value-row capacity sweep
#      (full-table-pass hypothesis).                  -> rowscatter.log
#
# Each bench line lands in the log; compare "value" fields.
set -x
cd /root/repo
mkdir -p /tmp/tpu_ab
python bench.py                       > /tmp/tpu_ab/bench_scalar.json 2> /tmp/tpu_ab/bench_scalar.log
BENCH_DENSE_MODE=row python bench.py  > /tmp/tpu_ab/bench_row.json    2> /tmp/tpu_ab/bench_row.log
BENCH_WINDOW=16 python bench.py       > /tmp/tpu_ab/bench_w16.json    2> /tmp/tpu_ab/bench_w16.log
python scripts/profile_rowscatter.py  > /tmp/tpu_ab/rowscatter.log    2>&1
#   5. Sharding machinery overhead on ONE real chip (S=1 mesh runs the
#      grouped dedup + block peel + self-all_to_all + psum against the
#      plain engine).                               -> shard_overhead.log
python scripts/profile_shard_overhead.py > /tmp/tpu_ab/shard_overhead.log 2>&1
tail -n 1 /tmp/tpu_ab/bench_*.json
