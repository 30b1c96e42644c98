#!/bin/sh
# Round-4c TPU session (fresh host, empty local cache): re-warm the
# capture-critical programs FIRST, then A/B the pending records_batch
# knob (pipeline.scan_pings_brick records_batch — vmapped per-frame
# records groups; the w16 bfv trace attributes the largest remaining
# block to the sequential records lax.map).  Every step gated on the
# remaining SESSION_END_EPOCH budget like tpu_ab_session.sh.
#
#  0. Driver-shaped bench (bfv capture default): re-warms the capture
#     family on this host (remote compile service hits by HLO — the
#     records_batch commit is HLO-neutral at the default B=1).
#                                            -> r4c_bench_warm.json
#  1. Warm entry()'s compile-check program.  -> r4c_graft_warm.log
#  2. Warm dryrun_multichip(8) (CPU, per-host cache).
#                                            -> r4c_dryrun.log
#  3. BENCH_RECORDS_BATCH=16 driver-shaped run (full vmap — ONE new
#     program family).                       -> r4c_rb16.json
#  4. BENCH_RECORDS_BATCH=4 driver-shaped run (grouped middle point).
#                                            -> r4c_rb4.json
#  5. Warm rerun at the default (variance anchor). -> r4c_bench_warm2.json
#  6. cache_check LAST.                      -> r4c_cache_check.json
#
# After this session: flip DEFAULT_RECORDS_BATCH only on a >=1.05x
# measured win, then re-run bench warm + cache_check and freeze traced
# sources (capture protocol, tpu_ab_session.sh header).
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r4c_walltimes.log

SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
need() {
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: needs $1 s, $(left) s left" >> /tmp/tpu_ab/r4c_walltimes.log
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
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r4c_walltimes.log
  return $_rc
}

# 0: capture-family re-warm.  Empty local cache + warm service cache ran
# 6.7 min on the third-session host; give it room for a service miss.
BD0=$(( $(left) - 2400 ))
[ "$BD0" -gt 5400 ] && BD0=5400
[ "$BD0" -lt 1200 ] && BD0=1200
need 2000 bench_warm && \
walltime bench_warm env BENCH_DEADLINE=$BD0 python bench.py \
  > /tmp/tpu_ab/r4c_bench_warm.json 2> /tmp/tpu_ab/r4c_bench_warm.log

need 1200 graft_warm && \
walltime graft_warm timeout 1800 python -c "import __graft_entry__ as g, jax; fn, a = g.entry(); o = jax.jit(fn)(*a); jax.block_until_ready(o); print('graft entry warm ok')" \
  > /tmp/tpu_ab/r4c_graft_warm.log 2>&1

need 600 dryrun_warm && \
walltime dryrun_warm timeout 1200 python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun warm ok')" \
  > /tmp/tpu_ab/r4c_dryrun.log 2>&1

# 3/4: records_batch A/B — each compiles ONE new window-program family.
BD3=$(( $(left) - 1500 ))
[ "$BD3" -gt 4200 ] && BD3=4200
[ "$BD3" -lt 1200 ] && BD3=1200
need 2400 rb16 && \
walltime rb16 env BENCH_RECORDS_BATCH=16 BENCH_DEADLINE=$BD3 python bench.py \
  > /tmp/tpu_ab/r4c_rb16.json 2> /tmp/tpu_ab/r4c_rb16.log

BD4=$(( $(left) - 1200 ))
[ "$BD4" -gt 4200 ] && BD4=4200
[ "$BD4" -lt 1200 ] && BD4=1200
need 2000 rb4 && \
walltime rb4 env BENCH_RECORDS_BATCH=4 BENCH_DEADLINE=$BD4 python bench.py \
  > /tmp/tpu_ab/r4c_rb4.json 2> /tmp/tpu_ab/r4c_rb4.log

need 500 bench_warm2 && \
walltime bench_warm2 python bench.py \
  > /tmp/tpu_ab/r4c_bench_warm2.json 2> /tmp/tpu_ab/r4c_bench_warm2.log

need 600 cache_check && \
walltime cache_check timeout 900 python scripts/cache_check.py \
  > /tmp/tpu_ab/r4c_cache_check.json 2> /tmp/tpu_ab/r4c_cache_check.log

cat /tmp/tpu_ab/r4c_walltimes.log
tail -n 1 /tmp/tpu_ab/r4c_*.json
true
