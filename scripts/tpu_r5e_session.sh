#!/bin/sh
# Round-5e TPU session: raw-candidate mode A/B (pallas-tb16 baseline vs
# pallas-raw-tb16), then capture-readiness re-check.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r5e_walltimes.log
SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
need() {
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: needs $1 s, $(left) s left" >> /tmp/tpu_ab/r5e_walltimes.log
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
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r5e_walltimes.log
  return $_rc
}

need 2400 ab_raw && \
walltime ab_raw timeout 4800 env MODES=pallas-tb16,pallas-raw-tb16 python \
  scripts/profile_pallas_bin.py ab \
  > /tmp/tpu_ab/r5e_ab.json 2> /tmp/tpu_ab/r5e_ab.log

# raw map-state parity ON CHIP at full shapes (same harness as r5d)
if grep -q '"mode": "pallas-raw-tb16"' /tmp/tpu_ab/r5e_ab.json 2>/dev/null; then
  need 900 verify_raw && \
  walltime verify_raw timeout 2400 env MODE=pallas-raw-tb16 python \
    scripts/verify_pallas_chip.py \
    > /tmp/tpu_ab/r5e_verify.json 2> /tmp/tpu_ab/r5e_verify.log
fi

need 600 cache_check && \
walltime cache_check timeout 1200 python scripts/cache_check.py \
  > /tmp/tpu_ab/r5e_cache_check.json 2> /tmp/tpu_ab/r5e_cache_check.log

cat /tmp/tpu_ab/r5e_walltimes.log
tail -n 2 /tmp/tpu_ab/r5e_*.json
true
