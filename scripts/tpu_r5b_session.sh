#!/bin/sh
# Round-5b TPU session: Pallas binning kernel A/B (after the Mosaic cast
# fix), window_group dispatch A/B, S=1 shard-overhead trace attribution,
# the full-survey soak through the product surface, then capture restore.
# Artifacts in /tmp/tpu_ab/r5b_*.  Budget-gated on SESSION_END_EPOCH.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ab
: > /tmp/tpu_ab/r5b_walltimes.log

SESSION_END_EPOCH=${SESSION_END_EPOCH:-9999999999}
left() { echo $(( SESSION_END_EPOCH - $(date +%s) )); }
need() {
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: needs $1 s, $(left) s left" >> /tmp/tpu_ab/r5b_walltimes.log
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
  echo "WALL $_label $((_t1 - _t0)) s rc=$_rc" >> /tmp/tpu_ab/r5b_walltimes.log
  return $_rc
}

# 0: kernel smoke (small shapes — fast Mosaic + numerics signal)
need 600 smoke && \
walltime smoke timeout 1500 python scripts/profile_pallas_bin.py smoke \
  > /tmp/tpu_ab/r5b_smoke.json 2> /tmp/tpu_ab/r5b_smoke.log

# 1: the headline A/B (same-session bfv baseline + pallas)
need 2400 ab && \
walltime ab timeout 5400 env MODES=bfv,pallas python \
  scripts/profile_pallas_bin.py ab \
  > /tmp/tpu_ab/r5b_ab.json 2> /tmp/tpu_ab/r5b_ab.log

if grep -q '"mode": "pallas"' /tmp/tpu_ab/r5b_ab.json 2>/dev/null; then
  need 2400 ab_tb16 && \
  walltime ab_tb16 timeout 4800 env MODES=pallas-tb16 python \
    scripts/profile_pallas_bin.py ab \
    >> /tmp/tpu_ab/r5b_ab.json 2> /tmp/tpu_ab/r5b_ab_tb16.log

  need 1200 trace && \
  walltime trace timeout 2400 env TRACE_MODE=pallas PINGS=32 python \
    scripts/profile_pallas_bin.py trace \
    > /tmp/tpu_ab/r5b_trace.log 2>&1
fi

# 2: dispatch-floor probe + window_group A/B (G=2 first; G=4 pays a
# bigger compile, separate step so a timeout doesn't eat G=2's result)
need 2400 dispatch2 && \
walltime dispatch2 timeout 4800 env GROUPS=1,2 python \
  scripts/profile_dispatch.py \
  > /tmp/tpu_ab/r5b_dispatch.json 2> /tmp/tpu_ab/r5b_dispatch.log

if grep -q '"window_group": 2' /tmp/tpu_ab/r5b_dispatch.json 2>/dev/null; then
  need 2400 dispatch4 && \
  walltime dispatch4 timeout 4800 env NULL=0 GROUPS=4 python \
    scripts/profile_dispatch.py \
    >> /tmp/tpu_ab/r5b_dispatch.json 2> /tmp/tpu_ab/r5b_dispatch4.log
fi

# 3: S=1 sharding machinery trace attribution (VERDICT r4 item 6)
need 1800 shard_trace && \
walltime shard_trace timeout 3600 env TRACE=1 python \
  scripts/profile_shard_overhead.py \
  > /tmp/tpu_ab/r5b_shard_trace.log 2>&1

# 4: full-survey soak through the product surface (VERDICT r4 item 5):
# 5000 full-size pings, kiro_tilt60 preset, streaming map-bag with the
# publish tick on, growth enabled (default budgets)
need 2400 soak && \
walltime soak sh -c '
  timeout 900 python -m sonar_3d_reconstruction_tpu make-bag \
    /tmp/soak5000.mcap --pings 5000 --range-bins 500 --bearing-bins 512 \
    --rate 2.0 --seed 11 > /tmp/tpu_ab/r5b_soak_make.log 2>&1 &&
  timeout 3000 python -m sonar_3d_reconstruction_tpu map-bag \
    /tmp/soak5000.mcap --config config/kiro_tilt60.yaml --backend brick \
    --chunk 32 --window 8 --publish \
    > /tmp/tpu_ab/r5b_soak.json 2> /tmp/tpu_ab/r5b_soak.log
'

# ---- capture readiness restore (always last)
BD=$(( $(left) - 1200 ))
[ "$BD" -gt 3600 ] && BD=3600
[ "$BD" -lt 1200 ] && BD=1200
need 1500 bench_rewarm && \
walltime bench_rewarm env BENCH_DEADLINE=$BD python bench.py \
  > /tmp/tpu_ab/r5b_bench.json 2> /tmp/tpu_ab/r5b_bench.log

need 600 graft_warm && \
walltime graft_warm timeout 1500 python -c "import __graft_entry__ as g, jax; fn, a = g.entry(); o = jax.jit(fn)(*a); jax.block_until_ready(o); print('graft entry warm ok')" \
  > /tmp/tpu_ab/r5b_graft.log 2>&1

need 500 dryrun_warm && \
walltime dryrun_warm timeout 1500 python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun warm ok')" \
  > /tmp/tpu_ab/r5b_dryrun.log 2>&1

need 600 cache_check && \
walltime cache_check timeout 1200 python scripts/cache_check.py \
  > /tmp/tpu_ab/r5b_cache_check.json 2> /tmp/tpu_ab/r5b_cache_check.log

cat /tmp/tpu_ab/r5b_walltimes.log
tail -n 2 /tmp/tpu_ab/r5b_*.json
true
