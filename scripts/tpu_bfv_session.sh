#!/bin/sh
# Round-4b TPU session: A/B the dense_mode="bfv" window engine (the
# (brick, frame, offset) sort-key repack that removes the 0.11 ms/ping
# dense-buffer relayout copy found by the w16 op trace — PERFORMANCE.md
# "w16 op-trace attribution").  Ordered so the capture-critical warm
# check comes first and cache_check runs last; every step gated on the
# remaining SESSION_END_EPOCH budget like tpu_ab_session.sh.
#
#  0. Warm driver-shaped scalar bench: verifies the default capture
#     programs are still warm (and re-warms via the service cache if the
#     host cache was lost).                  -> bfv_bench_warm.json
#  1. BENCH_DENSE_MODE=bfv driver-shaped run (plan entries for bfv are
#     committed, so this compiles exactly ONE new program family).
#                                            -> bfv_bench.json
#  2. Repeat both once more (shared-chip variance check).
#                                            -> bfv_bench2.json / bfv_warm2.json
#  3. Op trace of the bfv w16 program (did the relayout copy disappear?).
#                                            -> bfv_trace.log
#  4. chunk=1 latency at bfv (streaming default check, only if roomy).
#  5. cache_check (scalar default) LAST.     -> bfv_cache_check.json
#
# After this session: if bfv >= ~1.05x scalar, flip DEFAULT_DENSE_MODE in
# bench.py (plan already committed), re-run bench warm + cache_check, and
# then freeze traced sources.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/bfv_walltimes.log

SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
need() {
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: needs $1 s, $(left) s left" >> /tmp/tpu_ab/bfv_walltimes.log
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
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/bfv_walltimes.log
  return $_rc
}

need 1500 bench_warm && \
walltime bench_warm python bench.py \
  > /tmp/tpu_ab/bfv_bench_warm.json 2> /tmp/tpu_ab/bfv_bench_warm.log
# first bfv run compiles the ONE new program family; the scalar w16 fused
# step has taken >30 min through the remote compiler cold, so give this
# run every second the budget allows (minus room for the warm reruns and
# cache_check), like tpu_ab_session.sh's cold step
BD1=$(( $(left) - 1500 ))
[ "$BD1" -gt 5400 ] && BD1=5400
[ "$BD1" -lt 1200 ] && BD1=1200
need 2700 bench_bfv && \
walltime bench_bfv env BENCH_DENSE_MODE=bfv BENCH_DEADLINE=$BD1 python bench.py \
  > /tmp/tpu_ab/bfv_bench.json 2> /tmp/tpu_ab/bfv_bench.log
# variance check: one more of each, interleaved
need 500 bench_bfv2 && \
walltime bench_bfv2 env BENCH_DENSE_MODE=bfv python bench.py \
  > /tmp/tpu_ab/bfv_bench2.json 2> /tmp/tpu_ab/bfv_bench2.log
need 500 bench_warm2 && \
walltime bench_warm2 python bench.py \
  > /tmp/tpu_ab/bfv_warm2.json 2> /tmp/tpu_ab/bfv_warm2.log
need 900 trace_bfv && \
walltime trace_bfv env TRACE_WINDOW=16 TRACE_DENSE_MODE=bfv \
  timeout 1800 python scripts/profile_trace_brick.py /tmp/sonar3d_trace_bfv \
  > /tmp/tpu_ab/bfv_trace.log 2>&1
need 600 cache_check && \
walltime cache_check timeout 900 python scripts/cache_check.py \
  > /tmp/tpu_ab/bfv_cache_check.json 2> /tmp/tpu_ab/bfv_cache_check.log
cat /tmp/tpu_ab/bfv_walltimes.log
tail -n 1 /tmp/tpu_ab/bfv_*.json
true
