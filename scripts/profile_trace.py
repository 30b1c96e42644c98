"""Capture a real jax.profiler device trace of the hot path on the axon TPU
(VERDICT r1 item 10: the round-1 ablations were wall-clock subtraction; this
is the op-level device record).

Writes a TensorBoard/Perfetto trace directory and prints the top self-time
ops parsed from the trace's .xplane.pb when the protobuf tooling allows,
falling back to listing the artifact paths.

Usage: python scripts/profile_trace.py [outdir]
"""

import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.utils.compile_cache import enable as _enable
_enable()

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.grid.hash import init_hash_grid
from sonar_3d_reconstruction_tpu.ops.backproject import build_fan_tables
from sonar_3d_reconstruction_tpu.pipeline import (
    batched_sonar_to_world,
    scan_pings_hash,
)
from sonar_3d_reconstruction_tpu.utils.profiling import device_trace
from bench import make_inputs

def _read_varint(buf, pos):
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _fields(buf):
    """Walk one protobuf message's (field, wire_type, value) triples."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wt == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:
            return
        yield fnum, wt, val


def parse_xplane_top_ops(path, top=25):
    """Minimal XSpace reader: extracts (event metadata name, total duration
    ps) from the serialized proto without the generated classes."""
    import collections
    import struct as _s

    data = open(path, "rb").read()

    totals = collections.Counter()
    # XSpace.planes(1) -> XPlane{name(2), lines(3), event_metadata(4 map),
    # stat_metadata(5 map)}
    for f1, w1, plane in _fields(data):
        if f1 != 1 or w1 != 2:
            continue
        meta_names = {}
        plane_name = b""
        for f2, w2, v2 in _fields(plane):
            if f2 == 2 and w2 == 2:
                plane_name = v2
            elif f2 == 4 and w2 == 2:  # map<int64, XEventMetadata>
                k = None
                name = b""
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1 and w3 == 0:
                        k = v3
                    elif f3 == 2 and w3 == 2:
                        for f4, w4, v4 in _fields(v3):
                            if f4 == 2 and w4 == 2:
                                name = v4
                if k is not None:
                    meta_names[k] = name.decode(errors="replace")
        if b"TPU" not in plane_name and b"tpu" not in plane_name:
            continue
        for f2, w2, v2 in _fields(plane):
            if f2 != 3 or w2 != 2:  # XLine
                continue
            for f3, w3, v3 in _fields(v2):
                if f3 != 4 or w3 != 2:  # XEvent
                    continue
                mid = dur = 0
                for f4, w4, v4 in _fields(v3):
                    if f4 == 1 and w4 == 0:
                        mid = v4
                    elif f4 == 3 and w4 == 0:
                        dur = v4
                totals[meta_names.get(mid, f"#{mid}")] += dur
    return totals.most_common(top)



def main():
    OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sonar3d_trace"

    cfg = MapperConfig()
    N = 16
    images, positions, quats = make_inputs(cfg, N)
    tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    T = jnp.asarray(batched_sonar_to_world(positions, quats, cfg), jnp.float32)
    imgs = jnp.asarray(images)
    print("device:", jax.devices()[0].platform, flush=True)

    # warm/compile outside the trace
    st = init_hash_grid(1 << 24, jnp.float32)
    st, _ = scan_pings_hash(st, imgs, T, tables=tables, cfg=cfg,
                            dtype=jnp.float32, window=8)
    _ = int(st.used)
    print("warm; tracing...", flush=True)

    t0 = time.perf_counter()
    with device_trace(OUT):
        st2 = init_hash_grid(1 << 24, jnp.float32)
        st2, _ = scan_pings_hash(
            st2, imgs.at[0, 0, 0].set(np.uint8(7)), T, tables=tables, cfg=cfg,
            dtype=jnp.float32, window=8,
        )
        _ = int(st2.used)
    print(f"traced run: {(time.perf_counter()-t0)*1e3:.0f} ms "
          f"({(time.perf_counter()-t0)/N*1e3:.1f} ms/ping)", flush=True)

    artifacts = glob.glob(os.path.join(OUT, "**", "*"), recursive=True)
    xplanes = [a for a in artifacts if a.endswith(".xplane.pb")]
    print(f"{len(artifacts)} artifacts under {OUT}")
    for a in sorted(artifacts)[-8:]:
        print("  ", a, os.path.getsize(a) if os.path.isfile(a) else "(dir)")

    # best-effort xplane summarization (no tensorboard in the image; parse the
    # raw proto for event durations by op name using the generic wire format)
    for xp in xplanes:
        try:
            print(f"\nTop device ops by total duration ({os.path.basename(xp)}):")
            for name, ps in parse_xplane_top_ops(xp):
                print(f"  {ps/1e9:10.3f} ms  {name[:90]}")
        except Exception as e:  # parsing is best-effort
            print("xplane parse failed:", e)



if __name__ == "__main__":
    main()

def parse_xplane_lines(path):
    """Per-XLine occupancy: (line_name, n_events, busy_ps, span_ps) for the
    TPU plane — busy = summed event durations, span = last end - first
    start.  The 'XLA Modules' line exposes dead time BETWEEN dispatched
    programs that per-op totals cannot show."""
    data = open(path, "rb").read()

    out = []
    for f1, w1, plane in _fields(data):
        if f1 != 1 or w1 != 2:
            continue
        plane_name = b""
        for f2, w2, v2 in _fields(plane):
            if f2 == 2 and w2 == 2:
                plane_name = v2
        if b"TPU" not in plane_name and b"tpu" not in plane_name:
            continue
        for f2, w2, v2 in _fields(plane):
            if f2 != 3 or w2 != 2:  # XLine
                continue
            lname = b""
            n = busy = 0
            lo, hi = None, 0
            for f3, w3, v3 in _fields(v2):
                if f3 == 2 and w3 == 2:
                    lname = v3
                elif f3 == 4 and w3 == 2:  # XEvent
                    off = dur = 0
                    for f4, w4, v4 in _fields(v3):
                        if f4 == 2 and w4 == 0:
                            off = v4
                        elif f4 == 3 and w4 == 0:
                            dur = v4
                    n += 1
                    busy += dur
                    lo = off if lo is None else min(lo, off)
                    hi = max(hi, off + dur)
            if n:
                out.append((lname.decode(errors="replace"), n, busy,
                            (hi - lo) if lo is not None else 0))
    return out
