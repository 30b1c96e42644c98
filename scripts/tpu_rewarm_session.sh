#!/bin/sh
# Host-migration re-warm session: the capture protocol codified as a
# standalone script (PERFORMANCE.md "Host-migration re-warm").
#
# Hosts rotate mid-round and `.jax_cache/` is gitignored, so every
# migration lands on an EMPTY local compile cache — exactly the state
# that cost round 3 both driver artifacts.  Recovery is cheap while the
# remote compile service's HLO cache is live (~7-10 min total), so run
# this (via scripts/tpu_poll_and_run.sh with
# SESSION_SCRIPT=scripts/tpu_rewarm_session.sh) immediately after any
# migration, and before the driver's end-of-round window:
#
#  0. Driver-shaped `python bench.py` (re-warms the two capture
#     programs + streaming-latency family).   -> rewarm_bench.json
#  1. Warm entry()'s compile-check program.   -> rewarm_graft.log
#  2. Warm dryrun_multichip(8) (CPU, per-host cache entries).
#                                             -> rewarm_dryrun.log
#  3. cache_check LAST — must print CAPTURE-READY.
#                                             -> rewarm_cache_check.json
#
# Every step is gated on the remaining SESSION_END_EPOCH budget so a
# late launch never collides with the driver's own capture bench.
# After this session passes: freeze traced sources (no commits that
# change traced code until the round ends — tpu_ab_session.sh header).
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/rewarm_walltimes.log

SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
need() {
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: needs $1 s, $(left) s left" >> /tmp/tpu_ab/rewarm_walltimes.log
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
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/rewarm_walltimes.log
  return $_rc
}

# 0: capture-family re-warm.  Empty local cache + warm service cache has
# measured 6.7-35 min across four migrations (the spread is the remote
# service's first-execution finalization pause); budget generously but
# leave room for the three cheap steps after it.
BD0=$(( $(left) - 1500 ))
[ "$BD0" -gt 5400 ] && BD0=5400
[ "$BD0" -lt 1200 ] && BD0=1200
need 1800 bench_warm && \
walltime bench_warm env BENCH_DEADLINE=$BD0 python bench.py \
  > /tmp/tpu_ab/rewarm_bench.json 2> /tmp/tpu_ab/rewarm_bench.log

need 900 graft_warm && \
walltime graft_warm timeout 1800 python -c "import __graft_entry__ as g, jax; fn, a = g.entry(); o = jax.jit(fn)(*a); jax.block_until_ready(o); print('graft entry warm ok')" \
  > /tmp/tpu_ab/rewarm_graft.log 2>&1

need 500 dryrun_warm && \
walltime dryrun_warm timeout 1200 python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun warm ok')" \
  > /tmp/tpu_ab/rewarm_dryrun.log 2>&1

need 600 cache_check && \
walltime cache_check timeout 900 python scripts/cache_check.py \
  > /tmp/tpu_ab/rewarm_cache_check.json 2> /tmp/tpu_ab/rewarm_cache_check.log

cat /tmp/tpu_ab/rewarm_walltimes.log
tail -n 1 /tmp/tpu_ab/rewarm_*.json
true
