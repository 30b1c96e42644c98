#!/bin/sh
# Round-5f TPU session: incremental publish tick at survey scale
# (VERDICT r4 item 4 done-criterion), then the final capture chain.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r5f_walltimes.log
SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
need() {
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: needs $1 s, $(left) s left" >> /tmp/tpu_ab/r5f_walltimes.log
    return 1
  fi
  return 0
}
walltime() {
  _label="$1"; shift
  _t0=$(date +%s)
  "$@"
  _rc=$?
  _t1=$(date +%s)
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r5f_walltimes.log
  return $_rc
}

need 1200 publish && \
walltime publish timeout 2400 python scripts/profile_publish.py --pings 256 \
  > /tmp/tpu_ab/r5f_publish.json 2> /tmp/tpu_ab/r5f_publish.log

need 900 bench_final && \
walltime bench_final env BENCH_DEADLINE=1200 python bench.py \
  > /tmp/tpu_ab/r5f_bench.json 2> /tmp/tpu_ab/r5f_bench.log

need 600 cache_check && \
walltime cache_check timeout 1200 python scripts/cache_check.py \
  > /tmp/tpu_ab/r5f_cache_check.json 2> /tmp/tpu_ab/r5f_cache_check.log

cat /tmp/tpu_ab/r5f_walltimes.log
tail -n 2 /tmp/tpu_ab/r5f_*.json
true
