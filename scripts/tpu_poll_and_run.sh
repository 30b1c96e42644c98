#!/bin/bash
# Poll the axon TPU tunnel; the moment it answers, run the round-4 A/B
# session (scripts/tpu_ab_session.sh) from an isolated git-archive snapshot
# so live edits in /root/repo can never race a running TPU bench
# (CLAUDE.md: "NEVER edit source while a TPU bench runs in the background").
#
# Probe cadence 180 s; each probe bounded at 75 s (a live tunnel answers the
# devices() call in a few seconds; a down tunnel sleeps forever in the
# acquisition retry loop, hence the hard timeout). If /tmp/pytest_running
# exists the launch waits for it to clear first (1-core host: a full pytest
# suite running concurrently would skew the session's host-side wall times).
set -u
REPO=/root/repo
SNAP=/tmp/tpu_snap
LOG=/tmp/tpu_ab
mkdir -p "$LOG"
echo $$ > /tmp/tpu_poll.pid

probe() {
  timeout 75 python -c "import jax; d = jax.devices(); print('TPU UP:', d)" \
    >> "$LOG/poll.log" 2>&1
}

# Absolute budget for the launched session: a conservative estimate of
# when the driver's own end-of-round capture bench will want the single
# chip (round start + ~12 h, minus a 20-min buffer).  The session script
# gates every step on the remaining budget, so a late chip return still
# warms the cache and records the warm capture number without colliding
# with the driver.  ALWAYS pass SESSION_END_EPOCH explicitly (the
# fallback is a conservative now+6h for a launch whose round start is
# unknown).  SESSION_SCRIPT selects which session to run from the
# snapshot (default: the round-4 A/B suite).
SESSION_END_EPOCH=${SESSION_END_EPOCH:-$(date -u -d 'now + 6 hours' +%s)}
export SESSION_END_EPOCH
SESSION_SCRIPT=${SESSION_SCRIPT:-scripts/tpu_ab_session.sh}

while true; do
  echo "$(date -u +%FT%TZ) probing" >> "$LOG/poll.log"
  if probe; then
    echo "$(date -u +%FT%TZ) tunnel is UP" >> "$LOG/poll.log"
    break
  fi
  sleep 180
done

if [ $(( SESSION_END_EPOCH - $(date +%s) )) -lt 1500 ]; then
  # Too close to the driver's capture window: leave the chip alone (the
  # driver's bench.py has its own deadline/salvage machinery for a cold
  # cache) and surface the state for a manual decision.
  echo "$(date -u +%FT%TZ) chip UP but <1500 s before the driver window — not launching" >> "$LOG/poll.log"
  touch "$LOG/CHIP_UP_LATE"
  exit 0
fi

# tests/conftest.py writes its PID into the marker at session start and
# removes it at session end; a crashed pytest leaves a stale file, so the
# wait only honors a marker whose PID is still alive (a forever-wait on a
# stale marker would silently eat the whole TPU window).
pytest_live() {
  # marker holds ONE PID PER LINE (concurrent suites append); live if any
  # listed pid still exists — non-numeric/dead lines are stale
  [ -f /tmp/pytest_running ] || return 1
  while read -r _pid; do
    case "$_pid" in
      ''|*[!0-9]*) continue ;;
    esac
    kill -0 "$_pid" 2>/dev/null && return 0
  done < /tmp/pytest_running
  return 1
}
while pytest_live; do
  echo "$(date -u +%FT%TZ) waiting for pytest (pid $(cat /tmp/pytest_running)) to finish" >> "$LOG/poll.log"
  sleep 60
done

# a long suite can eat the window — re-check after the wait
if [ $(( SESSION_END_EPOCH - $(date +%s) )) -lt 1500 ]; then
  echo "$(date -u +%FT%TZ) pytest wait consumed the window — not launching" >> "$LOG/poll.log"
  touch "$LOG/CHIP_UP_LATE"
  exit 0
fi

rm -rf "$SNAP"
mkdir -p "$SNAP"
git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
git -C "$REPO" rev-parse HEAD > "$LOG/session_head.txt"

# share the live warm cache so the driver's end-of-round bench hits it
export SONAR3D_COMPILE_CACHE="$REPO/.jax_cache"
echo "$(date -u +%FT%TZ) launching $SESSION_SCRIPT from $SNAP @ $(cat "$LOG/session_head.txt")" >> "$LOG/poll.log"
sh "$SNAP/$SESSION_SCRIPT" > "$LOG/session.log" 2>&1
echo "$(date -u +%FT%TZ) session finished rc=$?" >> "$LOG/poll.log"
touch "$LOG/SESSION_DONE"
