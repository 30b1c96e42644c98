#!/bin/sh
# Round-5k: S=1 shard overhead RE-measured under the new bfv library
# default (the r5b trace attributed the old gap to the scalar relayout),
# then cache_check.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r5k_walltimes.log
walltime() {
  _label="$1"; shift
  _t0=$(date +%s)
  "$@"
  _rc=$?
  _t1=$(date +%s)
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r5k_walltimes.log
  return $_rc
}
walltime shard timeout 3600 python scripts/profile_shard_overhead.py \
  > /tmp/tpu_ab/r5k_shard.log 2>&1
walltime cache_check timeout 1200 python scripts/cache_check.py \
  > /tmp/tpu_ab/r5k_cache_check.json 2> /tmp/tpu_ab/r5k_cache_check.log
cat /tmp/tpu_ab/r5k_walltimes.log
grep "ms/ping" /tmp/tpu_ab/r5k_shard.log | head -4
tail -n 1 /tmp/tpu_ab/r5k_cache_check.json
true
