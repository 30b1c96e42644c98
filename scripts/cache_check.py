"""Compile-cache freshness check for the driver capture path.

Runs ``python bench.py`` exactly as the driver does (default env) and
asserts the capture invariants that round 3 lost (VERDICT.md r3 items 1-2):

- one parseable JSON line with no ``error`` field;
- the committed budget plan was HIT (``budget_plan: "hit"``) — a miss means
  bench_plan.json is stale for the current sources and a capture run would
  pay an extra discovery program family;
- total wall time under the warm budget (default 300 s; a warm cache loads
  entries in seconds, a cold remote TPU compile takes minutes per program).

Run this after the round's FINAL TPU warm run; committing traced-source
changes afterwards invalidates every warmed entry (CLAUDE.md: never
benchmark in a cold cache).  Exit 0 = capture-ready.

Usage: python scripts/cache_check.py [--budget SECONDS] [--platform cpu]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=480.0,
                    help="max warm wall time in seconds (tunnel-RTT "
                         "variance on the shared chip swings a warm run "
                         "107-330 s — round-4 measurements)")
    ap.add_argument("--platform", default=None,
                    help="BENCH_PLATFORM override (e.g. cpu for dev)")
    args = ap.parse_args()

    env = dict(os.environ)
    if args.platform:
        env["BENCH_PLATFORM"] = args.platform
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, capture_output=True, text=True,
            timeout=args.budget + 120,
        )
    except subprocess.TimeoutExpired:
        # the cold/stale-cache case this script exists to detect must
        # still produce the status JSON, not a traceback
        wall = time.monotonic() - t0
        print(json.dumps({
            "status": "NOT READY",
            "wall_s": round(wall, 1),
            "budget_s": args.budget,
            "problems": [
                f"bench.py exceeded {args.budget + 120:.0f}s subprocess "
                "timeout — compile cache is cold/stale for the capture "
                "programs"
            ],
            "value": None,
            "budget_plan": None,
        }))
        return 1
    wall = time.monotonic() - t0

    line = next(
        (ln for ln in proc.stdout.strip().splitlines()[::-1]
         if ln.startswith("{")), None,
    )
    problems = []
    parsed = None
    if line is None:
        problems.append("no JSON line on stdout")
    else:
        try:
            parsed = json.loads(line)
        except ValueError as e:
            problems.append(f"unparseable stdout line ({e}): {line[:200]}")
    if parsed is not None:
        if parsed.get("error"):
            problems.append(f"bench error: {parsed['error']}")
        detail = parsed.get("detail", {})
        if detail.get("budget_plan") not in (None, "hit"):
            problems.append(
                "budget plan MISS — bench_plan.json is stale for current "
                "sources; regenerate with BENCH_WRITE_PLAN=1"
            )
        if "latency_skipped" in detail:
            problems.append(
                f"latency skipped ({detail['latency_skipped']}) — warm "
                "cache should leave plenty of deadline headroom"
            )
    if wall > args.budget:
        problems.append(
            f"wall {wall:.0f}s exceeds warm budget {args.budget:.0f}s — "
            "compile cache is cold/stale for the capture programs"
        )

    status = "CAPTURE-READY" if not problems else "NOT READY"
    # one LINE of JSON (not indent=...) so `tail -n 1` in the session
    # script shows the whole verdict
    print(json.dumps({
        "status": status,
        "wall_s": round(wall, 1),
        "budget_s": args.budget,
        "problems": problems,
        "value": parsed.get("value") if parsed else None,
        "budget_plan": (parsed or {}).get("detail", {}).get("budget_plan"),
    }))
    if proc.returncode != 0 and not problems:
        print(proc.stderr[-2000:], file=sys.stderr)
        return 1
    return 0 if not problems else 1


if __name__ == "__main__":
    raise SystemExit(main())
