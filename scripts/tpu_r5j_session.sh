#!/bin/sh
# Round-5j: records-loop FULL UNROLL A/B (records_batch=0) on the adopted
# pallas-tb16 mode, then cache_check.  Record-only.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r5j_walltimes.log
walltime() {
  _label="$1"; shift
  _t0=$(date +%s)
  "$@"
  _rc=$?
  _t1=$(date +%s)
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r5j_walltimes.log
  return $_rc
}
walltime unroll timeout 5400 env NULL=0 MODES=pallas-tb16 GROUPS=1 RECORDS_BATCH=0 \
  python scripts/profile_dispatch.py \
  > /tmp/tpu_ab/r5j_unroll.json 2> /tmp/tpu_ab/r5j_unroll.log
walltime cache_check timeout 1200 python scripts/cache_check.py \
  > /tmp/tpu_ab/r5j_cache_check.json 2> /tmp/tpu_ab/r5j_cache_check.log
cat /tmp/tpu_ab/r5j_walltimes.log
tail -n 1 /tmp/tpu_ab/r5j_*.json
true
