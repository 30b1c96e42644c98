#!/bin/sh
# Round-5d mini-session: on-chip full-shape map-state parity for the
# adopted Pallas kernel, then a final cache_check.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r5d_walltimes.log
SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
need() {
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: needs $1 s, $(left) s left" >> /tmp/tpu_ab/r5d_walltimes.log
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
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r5d_walltimes.log
  return $_rc
}

need 900 verify && \
walltime verify timeout 2400 python scripts/verify_pallas_chip.py \
  > /tmp/tpu_ab/r5d_verify.json 2> /tmp/tpu_ab/r5d_verify.log

need 600 cache_check && \
walltime cache_check timeout 1200 python scripts/cache_check.py \
  > /tmp/tpu_ab/r5d_cache_check.json 2> /tmp/tpu_ab/r5d_cache_check.log

cat /tmp/tpu_ab/r5d_walltimes.log
tail -n 2 /tmp/tpu_ab/r5d_*.json
true
