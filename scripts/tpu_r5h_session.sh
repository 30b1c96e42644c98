#!/bin/sh
# Round-5h mini-session: (a) window_group G=4 on top of the adopted
# pallas-tb16 kernel, (b) window-8 pallas vs bfv (the streaming window),
# then final cache_check.  Record-only: no default flips this late.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r5h_walltimes.log
SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
need() {
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: needs $1 s, $(left) s left" >> /tmp/tpu_ab/r5h_walltimes.log
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
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r5h_walltimes.log
  return $_rc
}

need 1500 group_pallas && \
walltime group_pallas timeout 3600 env NULL=0 MODES=pallas-tb16 GROUPS=1,4 \
  python scripts/profile_dispatch.py \
  > /tmp/tpu_ab/r5h_group.json 2> /tmp/tpu_ab/r5h_group.log

need 1200 w8 && \
walltime w8 timeout 2400 env WINDOW=8 MODES=bfv,pallas-tb16 \
  python scripts/profile_pallas_bin.py ab \
  > /tmp/tpu_ab/r5h_w8.json 2> /tmp/tpu_ab/r5h_w8.log

need 600 cache_check && \
walltime cache_check timeout 1200 python scripts/cache_check.py \
  > /tmp/tpu_ab/r5h_cache_check.json 2> /tmp/tpu_ab/r5h_cache_check.log

cat /tmp/tpu_ab/r5h_walltimes.log
tail -n 2 /tmp/tpu_ab/r5h_*.json
true
