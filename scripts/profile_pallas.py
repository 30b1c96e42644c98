"""Pallas vs XLA table interaction on the real TPU (VERDICT r1 item 3).

Same op both sides: find-or-insert U unique records in the bucketized
table and accumulate their values.  The Pallas kernel holds the whole
table in VMEM (capacity capped at 2^20 slots = 12 MB) and processes
records sequentially; the XLA path is the production gather/sort/scatter
machinery at the same capacity.

Usage: python scripts/profile_pallas.py [n_records]
Results recorded in PERFORMANCE.md ("Pallas experiment").
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.utils.compile_cache import enable as _enable
_enable()

from sonar_3d_reconstruction_tpu.ops.packing import EMPTY_HI
from sonar_3d_reconstruction_tpu.pallas import (
    pallas_lookup_accumulate,
    xla_lookup_accumulate,
)

U = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
CAP = 1 << 19  # VMEM ceiling: in+out table blocks both resident (12 MB total)
NB = CAP // 128

rng = np.random.default_rng(0)
print(f"U={U} capacity={CAP} device={jax.devices()[0].platform}", flush=True)

ks = rng.choice(
    rng.integers(0, 1 << 48, size=4 * U, dtype=np.uint64), size=U,
    replace=False,
)
khi = jnp.asarray((ks >> 32).astype(np.uint32))
klo = jnp.asarray((ks & 0xFFFFFFFF).astype(np.uint32))
upd = jnp.asarray(rng.normal(size=U).astype(np.float32))
rows0 = jnp.full((NB, 256), EMPTY_HI, jnp.uint32)
vals0 = jnp.zeros((NB, 128), jnp.float32)
jax.block_until_ready((khi, klo, upd, rows0, vals0))


CHAIN = 16  # dependent calls per timed rep: ONE sync (~28 ms through the
            # tunnel) amortized 16x so the per-call cost is the op, not the
            # round trip (CLAUDE.md bench protocol)


def timeit(label, fn, reps=5):
    fn(0)  # compile
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        fn(r)
        best = min(best, time.perf_counter() - t0)
    per_call = best / CHAIN
    print(f"{label:46s} {per_call*1e3:9.2f} ms   "
          f"({per_call/U*1e9:6.1f} ns/record)", flush=True)
    return per_call


def _chain(op, r):
    # vary one update per link so the runtime can't dedup dispatches; the
    # first link inserts every key, the rest find-and-accumulate
    rows, vals = rows0, vals0
    for k in range(CHAIN):
        u = upd.at[0].set(np.float32(r * CHAIN + k))
        rows, vals = op(khi, klo, u, rows, vals)
    return float(vals[0, 0]) + float(rows[0, 0])


def run_pallas(r):
    return _chain(pallas_lookup_accumulate, r)


def run_xla(r):
    return _chain(xla_lookup_accumulate, r)


t_x = timeit("XLA lookup+insert+accumulate", run_xla)
t_p = timeit("Pallas VMEM sequential kernel", run_pallas)
print(f"pallas/xla ratio: {t_p/t_x:.2f}x", flush=True)
