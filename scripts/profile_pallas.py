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
CAP = 1 << 20     # VMEM ceiling for the Pallas table (8 MB keys + 4 MB vals)
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


def timeit(label, fn, reps=5):
    fn(0)  # compile
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        fn(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best*1e3:9.2f} ms   "
          f"({best/U*1e9:6.1f} ns/record)", flush=True)
    return best


def run_pallas(r):
    # vary one update so the runtime can't dedup repeated dispatches
    u = upd.at[0].set(np.float32(r))
    rows, vals = pallas_lookup_accumulate(khi, klo, u, rows0, vals0)
    return float(vals[0, 0]) + float(rows[0, 0])


def run_xla(r):
    u = upd.at[0].set(np.float32(r))
    rows, vals = xla_lookup_accumulate(khi, klo, u, rows0, vals0)
    return float(vals[0, 0]) + float(rows[0, 0])


t_x = timeit("XLA lookup+insert+accumulate", run_xla)
t_p = timeit("Pallas VMEM sequential kernel", run_pallas)
print(f"pallas/xla ratio: {t_p/t_x:.2f}x", flush=True)
