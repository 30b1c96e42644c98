"""Measure the indexed-op primitives for the row-structured apply redesign.

Questions (PERFORMANCE.md cost table extensions):
  1. Does a (N, W) u32 ROW scatter with sorted+unique indices cost per ROW
     (like the key-row gathers, ~width-independent) or per element?  If per
     row, packing a voxel's W=window frame slots into one row cuts the
     apply's dense-scatter index count by the records-per-voxel factor.
  2. What does a row GATHER (N, W) from a (L, W) source cost (needed to
     compact complete rows before the scatter)?
  3. Scatter with DUPLICATE sorted indices + max combiner (the
     compaction-free variant: every lane of a voxel segment writes the
     same row, values OR-combine).
  4. u64 scalar scatter (pair-packing variant) — or is it 2x u32?
  5. u16 vs i32 cumsum at the dedup lattice width (mod-2^16 payload pack).

Protocol: host-driven chains, marginal cost via chain-length slope
(bench-run-protocol), payload perturbed per call so the runtime cannot
dedup identical dispatches.

Usage: python scripts/profile_rowscatter.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.utils.compile_cache import enable as _enable
_enable()

LB = 720896          # window valid-lane scale (B*U at the bench config)
UV = 212992          # unique voxels per window scale
NBVOL = 7168 * 64    # brick budget * volume
B = 8                # window
LATTICE = 233728     # free-capped per-frame candidate lattice

print("device:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)


def marginal(label, fn, k_lo=4, k_hi=20, reps=5):
    """Marginal per-call ms via chain-length slope."""

    def chain(k, r):
        out = None
        for i in range(k):
            out = fn(jnp.uint32(r * 1000 + i))
        jax.block_until_ready(out)

    chain(2, 0)  # warm compile
    best_lo = best_hi = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        chain(k_lo, 10 + r)
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        chain(k_hi, 100 + r)
        best_hi = min(best_hi, time.perf_counter() - t0)
    ms = (best_hi - best_lo) / (k_hi - k_lo) * 1e3
    print(f"{label:64s} {ms:8.3f} ms", flush=True)
    return ms


# ---- baseline: scalar u32 scatter, sorted+unique, LB entries ----------
didx = np.sort(
    rng.choice(NBVOL * B, size=LB, replace=False).astype(np.int32)
)
didx_d = jnp.asarray(didx)
pay = jnp.asarray(rng.integers(1, 2**31, size=LB, dtype=np.uint32))


@jax.jit
def scalar_scatter(p):
    return (
        jnp.zeros((NBVOL * B,), jnp.uint32)
        .at[didx_d]
        .set(pay + p, mode="drop", unique_indices=True,
             indices_are_sorted=True)
    )


base = marginal(f"scalar u32 scatter  N={LB} -> ({NBVOL*B},)", scalar_scatter)
print(f"    -> {base*1e6/LB:.2f} ns/entry", flush=True)

# ---- row scatters at widths 2/4/8, sorted+unique ----------------------
for W in (2, 4, 8):
    NR = LB // W
    ridx = np.sort(
        rng.choice(NBVOL * B // W, size=NR, replace=False).astype(np.int32)
    )
    ridx_d = jnp.asarray(ridx)
    rpay = jnp.asarray(
        rng.integers(1, 2**31, size=(NR, W), dtype=np.uint32)
    )

    def row_scatter(p, ridx_d=ridx_d, rpay=rpay, W=W):
        return (
            jnp.zeros((NBVOL * B // W, W), jnp.uint32)
            .at[ridx_d]
            .set(rpay + p, mode="drop", unique_indices=True,
                 indices_are_sorted=True)
        )

    ms = marginal(
        f"row u32 scatter  ({NR},{W}) rows -> ({NBVOL*B//W},{W})",
        jax.jit(row_scatter),
    )
    print(f"    -> {ms*1e6/NR:.2f} ns/row ({ms*1e6/LB:.2f} ns/element)",
          flush=True)

# ---- row scatter W=8 at UV rows (the actual redesign operand) ---------
NR = UV
ridx = np.sort(rng.choice(NBVOL, size=NR, replace=False).astype(np.int32))
ridx_d8 = jnp.asarray(ridx)
rpay8 = jnp.asarray(rng.integers(1, 2**31, size=(NR, B), dtype=np.uint32))


@jax.jit
def row_scatter_uv(p):
    return (
        jnp.zeros((NBVOL, B), jnp.uint32)
        .at[ridx_d8]
        .set(rpay8 + p, mode="drop", unique_indices=True,
             indices_are_sorted=True)
    )


ms = marginal(f"row u32 scatter  ({NR},{B}) rows -> ({NBVOL},{B})",
              row_scatter_uv)
print(f"    -> {ms*1e6/NR:.2f} ns/row", flush=True)

# ---- duplicate-index row scatter-max, LB entries, W=8 -----------------
dup_idx = np.sort(rng.integers(0, NBVOL, size=LB).astype(np.int32))
dup_idx_d = jnp.asarray(dup_idx)
dpay = jnp.asarray(rng.integers(1, 2**31, size=(LB, B), dtype=np.uint32))


@jax.jit
def dup_row_scatter_max(p):
    return (
        jnp.zeros((NBVOL, B), jnp.uint32)
        .at[dup_idx_d]
        .max(dpay + p, mode="drop", indices_are_sorted=True)
    )


ms = marginal(
    f"dup row u32 scatter-max  ({LB},{B}) rows -> ({NBVOL},{B})",
    dup_row_scatter_max,
)
print(f"    -> {ms*1e6/LB:.2f} ns/row", flush=True)

# ---- row gather (UV, 8) from (LB, 8) ----------------------------------
gsrc = jnp.asarray(rng.integers(1, 2**31, size=(LB, B), dtype=np.uint32))
gidx = np.sort(rng.choice(LB, size=UV, replace=False).astype(np.int32))
gidx_d = jnp.asarray(gidx)


@jax.jit
def row_gather(p):
    return (gsrc + p)[gidx_d]


ms = marginal(f"row u32 gather  ({UV},{B}) rows from ({LB},{B})", row_gather)
print(f"    -> {ms*1e6/UV:.2f} ns/row", flush=True)

# ---- brick VALUE-row ops: does cost scale with ROWS or with TABLE
# capacity?  (round-3 row_bench measured ~250-300 ns/row at few-k rows
# and the cost looked ~proportional to table bytes — a full-table pass
# would mean snugger/dynamically-sized value tables cut the apply's
# table ops directly.  Fixed 7168 gathered+scattered rows, capacity
# swept 2^14..2^17.)
NROWS = 7168
for cap_pow in (14, 15, 16, 17):
    CAP = 1 << cap_pow
    vidx = np.sort(
        rng.choice(CAP, size=NROWS, replace=False).astype(np.int32)
    )
    vidx_d = jnp.asarray(vidx)
    vtab = jnp.asarray(
        rng.standard_normal((CAP, 64)).astype(np.float32)
    )

    def value_rmw(p, vidx_d=vidx_d, vtab=vtab):
        rows = vtab[vidx_d] + p.astype(jnp.float32)
        return vtab.at[vidx_d].set(
            rows, mode="drop", unique_indices=True, indices_are_sorted=True
        )

    ms = marginal(
        f"f32 value row gather+scatter  {NROWS} rows of (2^{cap_pow},64)",
        jax.jit(value_rmw),
    )
    print(f"    -> {ms*1e6/NROWS:.2f} ns/row "
          f"({CAP*64*4/ms*1e-6:.1f} GB/s if full-table)", flush=True)

# ---- u64 scalar scatter ------------------------------------------------
# Everything (array creation, tracing, execution) must run INSIDE the
# x64 context or jnp silently downgrades uint64 -> uint32 and the
# "u64" row would be a second u32 measurement.
try:
    with jax.enable_x64(True):
        didx2 = np.sort(
            rng.choice(NBVOL * B // 2, size=LB // 2, replace=False).astype(
                np.int32
            )
        )
        didx2_d = jnp.asarray(didx2)
        pay64 = jnp.asarray(
            rng.integers(1, 2**62, size=LB // 2, dtype=np.uint64),
            dtype=jnp.uint64,
        )
        assert pay64.dtype == jnp.uint64, pay64.dtype

        @jax.jit
        def u64_scatter(p):
            return (
                jnp.zeros((NBVOL * B // 2,), jnp.uint64)
                .at[didx2_d]
                .set(pay64 + p.astype(jnp.uint64), mode="drop",
                     unique_indices=True, indices_are_sorted=True)
            )

        out = u64_scatter(jnp.zeros((), jnp.int32))
        assert out.dtype == jnp.uint64, out.dtype
        ms = marginal(f"scalar u64 scatter  N={LB//2} -> ({NBVOL*B//2},)",
                      u64_scatter)
        print(f"    -> {ms*1e6/(LB//2):.2f} ns/entry", flush=True)
except Exception as e:  # u64 may be unsupported without x64
    print("u64 scatter: skipped:", e, flush=True)

# ---- cumsum width: i32 vs u16 at the lattice --------------------------
c32 = jnp.asarray(rng.integers(0, 2, size=LATTICE, dtype=np.int32))
c16 = c32.astype(jnp.uint16)


@jax.jit
def cumsum_i32(p):
    return jnp.cumsum(c32 + p.astype(jnp.int32))


@jax.jit
def cumsum_u16(p):
    return jnp.cumsum(c16 + p.astype(jnp.uint16))


ms = marginal(f"cumsum i32  N={LATTICE}", cumsum_i32)
ms = marginal(f"cumsum u16  N={LATTICE}", cumsum_u16)

# ---- sort reference points at LB --------------------------------------
k1 = jnp.asarray(rng.integers(0, 2**31, size=LB, dtype=np.uint32))
k2 = jnp.asarray(rng.integers(0, 2**31, size=LB, dtype=np.uint32))


@jax.jit
def sort1(p):
    (out,) = jax.lax.sort((k1 + p,), num_keys=1, is_stable=False)
    return out


@jax.jit
def sort2(p):
    return jax.lax.sort((k1 + p, k2), num_keys=1, is_stable=False)[0]


marginal(f"sort 1xu32  N={LB}", sort1)
marginal(f"sort 2xu32 (1 key)  N={LB}", sort2)
