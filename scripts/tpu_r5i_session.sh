#!/bin/sh
# Round-5i: confirmation capture from current HEAD + cache_check.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r5i_walltimes.log
walltime() {
  _label="$1"; shift
  _t0=$(date +%s)
  "$@"
  _rc=$?
  _t1=$(date +%s)
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r5i_walltimes.log
  return $_rc
}
walltime bench env BENCH_DEADLINE=1200 python bench.py \
  > /tmp/tpu_ab/r5i_bench.json 2> /tmp/tpu_ab/r5i_bench.log
walltime cache_check timeout 1200 python scripts/cache_check.py \
  > /tmp/tpu_ab/r5i_cache_check.json 2> /tmp/tpu_ab/r5i_cache_check.log
cat /tmp/tpu_ab/r5i_walltimes.log
tail -n 1 /tmp/tpu_ab/r5i_*.json
true
