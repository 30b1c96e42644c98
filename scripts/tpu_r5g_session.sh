#!/bin/sh
# Round-5g mini-session: re-measure the incremental tick with the
# array-based BrickHostView, then final cache_check.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r5g_walltimes.log
SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
walltime() {
  _label="$1"; shift
  _t0=$(date +%s)
  "$@"
  _rc=$?
  _t1=$(date +%s)
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r5g_walltimes.log
  return $_rc
}
walltime publish timeout 2400 python scripts/profile_publish.py --pings 256 \
  > /tmp/tpu_ab/r5g_publish.json 2> /tmp/tpu_ab/r5g_publish.log
walltime cache_check timeout 1200 python scripts/cache_check.py \
  > /tmp/tpu_ab/r5g_cache_check.json 2> /tmp/tpu_ab/r5g_cache_check.log
cat /tmp/tpu_ab/r5g_walltimes.log
tail -n 2 /tmp/tpu_ab/r5g_*.json
true
