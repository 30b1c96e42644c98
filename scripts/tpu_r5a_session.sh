#!/bin/sh
# Round-5a TPU session: measure the fused Pallas binning kernel
# (VERDICT r4 item 1) on the real chip, then restore capture readiness.
#
#  0. pallas_bin smoke — Mosaic lowering + on-chip numerics at SMALL
#     shapes (fast fail signal before any big compile). -> r5a_smoke.json
#  1. A/B at exact bench shapes: bfv (warm plan family) vs pallas vs
#     pallas-tb16.                                       -> r5a_ab.json
#  2. op trace of the pallas window engine (32 pings).   -> r5a_trace.log
#  3. driver-shaped `python bench.py` (default capture config) + entry()
#     and cache_check LAST — capture stays ready no matter what the A/B
#     said.                                              -> r5a_bench.json,
#                                                           r5a_cache_check.json
# Every step is budget-gated on SESSION_END_EPOCH (tpu_poll_and_run.sh).
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r5a_walltimes.log

SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
need() {
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: needs $1 s, $(left) s left" >> /tmp/tpu_ab/r5a_walltimes.log
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
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r5a_walltimes.log
  return $_rc
}

need 600 smoke && \
walltime smoke timeout 1500 python scripts/profile_pallas_bin.py smoke \
  > /tmp/tpu_ab/r5a_smoke.json 2> /tmp/tpu_ab/r5a_smoke.log

# the A/B pays the pallas first compile (remote compiler: frame-update
# programs are ~5-7 min; budget generously).  bfv first: its programs are
# the warmed plan family, so a pallas compile failure cannot cost the
# baseline measurement.
need 2400 ab && \
walltime ab timeout 5400 env MODES=bfv,pallas python \
  scripts/profile_pallas_bin.py ab \
  > /tmp/tpu_ab/r5a_ab.json 2> /tmp/tpu_ab/r5a_ab.log

# tile-size variant only if the main A/B succeeded (same program family
# cost; skip on failure to save the window)
if [ -s /tmp/tpu_ab/r5a_ab.json ] && grep -q '"mode": "pallas"' /tmp/tpu_ab/r5a_ab.json; then
  need 2400 ab_tb16 && \
  walltime ab_tb16 timeout 5400 env MODES=pallas-tb16 python \
    scripts/profile_pallas_bin.py ab \
    >> /tmp/tpu_ab/r5a_ab.json 2> /tmp/tpu_ab/r5a_ab_tb16.log

  need 900 trace && \
  walltime trace timeout 1800 env TRACE_MODE=pallas PINGS=32 python \
    scripts/profile_pallas_bin.py trace \
    > /tmp/tpu_ab/r5a_trace.log 2>&1
fi

# ---- capture readiness restore (the driver's end-of-round contract)
BD=$(( $(left) - 1200 ))
[ "$BD" -gt 3600 ] && BD=3600
[ "$BD" -lt 1200 ] && BD=1200
need 1500 bench_rewarm && \
walltime bench_rewarm env BENCH_DEADLINE=$BD python bench.py \
  > /tmp/tpu_ab/r5a_bench.json 2> /tmp/tpu_ab/r5a_bench.log

need 600 graft_warm && \
walltime graft_warm timeout 1500 python -c "import __graft_entry__ as g, jax; fn, a = g.entry(); o = jax.jit(fn)(*a); jax.block_until_ready(o); print('graft entry warm ok')" \
  > /tmp/tpu_ab/r5a_graft.log 2>&1

need 500 dryrun_warm && \
walltime dryrun_warm timeout 1500 python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun warm ok')" \
  > /tmp/tpu_ab/r5a_dryrun.log 2>&1

need 600 cache_check && \
walltime cache_check timeout 900 python scripts/cache_check.py \
  > /tmp/tpu_ab/r5a_cache_check.json 2> /tmp/tpu_ab/r5a_cache_check.log

cat /tmp/tpu_ab/r5a_walltimes.log
tail -n 2 /tmp/tpu_ab/r5a_*.json
true
