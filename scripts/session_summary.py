"""Summarize a TPU A/B session (/tmp/tpu_ab) into PERFORMANCE.md-ready rows.

Reads the artifacts scripts/tpu_ab_session.sh writes and prints one compact
table: per-bench-run updates/s, ms/ping, plan hit/miss, dense mode, plus the
radix/publish/latency rows and the step wall times.  Purely a reporting aid
— run it on the host after /tmp/tpu_ab/SESSION_DONE appears.

Usage: python scripts/session_summary.py [--dir /tmp/tpu_ab]
"""

import argparse
import json
import os

R3_SELF_MEASURED = 103.1e6  # updates/s, PERFORMANCE.md headline (self-measured)


def _last_json_line(path):
    try:
        with open(path) as f:
            lines = [ln.strip() for ln in f if ln.strip().startswith("{")]
        return json.loads(lines[-1]) if lines else None
    except (OSError, ValueError):
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/tpu_ab")
    args = ap.parse_args()
    d = args.dir

    print(f"== bench runs ({d}) ==")
    for name in ("bench_capture", "bench_warm", "bench_row", "bench_w16",
                 "bench_chunk1"):
        p = _last_json_line(os.path.join(d, name + ".json"))
        if p is None:
            print(f"{name:14s}  (missing)")
            continue
        if p.get("error"):
            print(f"{name:14s}  ERROR at {p.get('stage')}: {p['error']}")
            continue
        det = p.get("detail", {})
        v = p.get("value", 0.0)
        line = (
            f"{name:14s}  {v / 1e6:7.1f} M up/s  "
            f"({v / R3_SELF_MEASURED:5.2f}x r3)  "
            f"{det.get('mean_ping_latency_ms', float('nan')):6.2f} ms/ping  "
            f"plan={det.get('budget_plan', '?'):10s}  "
            f"mode={det.get('dense_mode', '?')}"
        )
        if "p50_ping_to_map_ms" in det:
            line += (
                f"  p50={det['p50_ping_to_map_ms']:.0f}ms"
                f" p95={det.get('p95_ping_to_map_ms', float('nan')):.0f}ms"
                f" @chunk={det.get('latency_chunk')}"
            )
        if "latency_skipped" in det:
            line += f"  latency SKIPPED ({det['latency_skipped']})"
        print(line)

    for name in ("radix", "publish", "cache_check"):
        p = _last_json_line(os.path.join(d, name + ".json"))
        print(f"\n== {name} ==")
        print(json.dumps(p, indent=1) if p else " (missing)")

    wt = os.path.join(d, "walltimes.log")
    if os.path.exists(wt):
        print("\n== step walls ==")
        with open(wt) as f:
            print(f.read().rstrip())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
