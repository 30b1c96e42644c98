#!/bin/sh
# Round-5c TPU session: Pallas kernel tile-size sweep, the missed pallas
# op trace, then capture-readiness for the NEW pallas-tb16 default.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r5c_walltimes.log

SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
need() {
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: needs $1 s, $(left) s left" >> /tmp/tpu_ab/r5c_walltimes.log
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
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r5c_walltimes.log
  return $_rc
}

# 0: tile/chunk sweep around the measured optimum (tb16 @ c1024)
need 2400 sweep && \
walltime sweep timeout 4800 env MODES=pallas-tb32,pallas-tb16-c2048,pallas-tb16-c512 \
  python scripts/profile_pallas_bin.py ab \
  > /tmp/tpu_ab/r5c_sweep.json 2> /tmp/tpu_ab/r5c_sweep.log

# 1: the pallas op trace (plan-key fallback now handles PINGS=32)
need 1200 trace && \
walltime trace timeout 2400 env TRACE_MODE=pallas-tb16 PINGS=32 python \
  scripts/profile_pallas_bin.py trace \
  > /tmp/tpu_ab/r5c_trace.log 2>&1

# ---- capture readiness for the NEW default (DEFAULT_DENSE_MODE =
# pallas-tb16, plan keys committed)
BD=$(( $(left) - 1500 ))
[ "$BD" -gt 3600 ] && BD=3600
[ "$BD" -lt 1200 ] && BD=1200
need 1500 bench_default && \
walltime bench_default env BENCH_DEADLINE=$BD python bench.py \
  > /tmp/tpu_ab/r5c_bench.json 2> /tmp/tpu_ab/r5c_bench.log

need 1200 bench_rerun && \
walltime bench_rerun env BENCH_DEADLINE=1200 python bench.py \
  > /tmp/tpu_ab/r5c_bench2.json 2> /tmp/tpu_ab/r5c_bench2.log

need 600 graft_warm && \
walltime graft_warm timeout 1500 python -c "import __graft_entry__ as g, jax; fn, a = g.entry(); o = jax.jit(fn)(*a); jax.block_until_ready(o); print('graft entry warm ok')" \
  > /tmp/tpu_ab/r5c_graft.log 2>&1

need 500 dryrun_warm && \
walltime dryrun_warm timeout 1500 python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun warm ok')" \
  > /tmp/tpu_ab/r5c_dryrun.log 2>&1

need 600 cache_check && \
walltime cache_check timeout 1200 python scripts/cache_check.py \
  > /tmp/tpu_ab/r5c_cache_check.json 2> /tmp/tpu_ab/r5c_cache_check.log

cat /tmp/tpu_ab/r5c_walltimes.log
tail -n 2 /tmp/tpu_ab/r5c_*.json
true
