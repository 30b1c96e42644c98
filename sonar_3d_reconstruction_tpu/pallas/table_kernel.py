"""Pallas VMEM-resident bucket lookup + insert + accumulate kernel.

The VERDICT round-1 experiment (item 3): round 1 rejected Pallas for the
table interaction from theory ("scalar core ~ same 1e8/s indexed-op
ceiling"); this module is the MEASURED comparison.  Both paths apply the
same operation the batched engine needs per window (grid/hash.py
apply_records_batched): for U unique packed keys, find-or-insert each key
in the bucketized table and read-modify-write its value slot.

Pallas design (one core, whole table resident in VMEM):

  * the table must fit VMEM (~16 MB/core): capacity 2^19 slots = 4 MB of
    interleaved key rows + 2 MB float32 values, and Mosaic materialises
    both the (unused) aliased input blocks and the output blocks, doubling
    that to 12 MB — ~8x smaller than the 2^22+ tables the XLA path runs
    with in HBM.  A production
    kernel would shard the table by bucket range and pre-bin records (the
    dedup sort already yields them key-sorted), so the capacity limit is a
    partitioning cost, not a blocker.
  * records process SEQUENTIALLY (fori_loop): on a single core, sequential
    semantics make insertion trivially collision-free — no plan/sort — and
    the adaptive read-modify-write needs no rank machinery.  This is the
    structural advantage Pallas could have over the XLA path, which pays a
    sort + segmented ranking + 6 separate U-sized indexed ops per window.
  * per record: 2 scalar key reads, one 256-wide bucket-row read, vector
    compare/argmax on the VPU, and full-row masked write-backs (dynamic
    single-lane stores are avoided — each RMW rewrites the (1, 128) row
    through a lane-mask select, which Mosaic handles natively).

Measured on v5e (scripts/profile_pallas.py): see PERFORMANCE.md.  The XLA
path stays the default; this kernel is kept as the measured record and as
the starting point for a sharded-table variant if the balance ever flips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sonar_3d_reconstruction_tpu.ops.packing import EMPTY_HI, mix2

BUCKET_SLOTS = 128  # matches grid/hash.py layout: rows are [hi x128 | lo x128]


def _kernel(khi_ref, klo_ref, upd_ref, rows_in, vals_in, rows_ref, vals_ref):
    """Sequential find-or-insert + accumulate over one 1024-record chunk.

    khi/klo/upd: (8, 128) record chunks in SMEM (EMPTY_HI = inactive lane)
    — dynamic per-record scalar reads only lower from scalar memory, so the
    grid streams the record arrays through SMEM in 1024-record blocks
    (sublane block must be a multiple of 8) while the table blocks below
    stay pinned in VMEM across all grid steps (constant index map).  The
    TPU grid is sequential, preserving the record order.
    rows_in/vals_in are the aliased input views of the output refs (the
    kernel reads and writes through rows_ref/vals_ref only).
    rows: (NB, 256) interleaved key rows (aliased in/out).
    vals: (NB, 128) float32 values (aliased in/out).
    """
    del rows_in, vals_in  # aliased to rows_ref / vals_ref
    n_rows, n_lanes = khi_ref.shape
    nb = rows_ref.shape[0]
    empty = np.uint32(EMPTY_HI)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, BUCKET_SLOTS), 1)

    def body(i, _):
        r = i // n_lanes
        l = i % n_lanes
        hi = khi_ref[r, l]
        lo = klo_ref[r, l]
        upd = upd_ref[r, l]

        @pl.when(hi != empty)
        def _():
            b = (mix2(hi, lo) & np.uint32(nb - 1)).astype(jnp.int32)
            row = rows_ref[pl.ds(b, 1), :]          # (1, 256)
            row_hi = row[:, :BUCKET_SLOTS]
            row_lo = row[:, BUCKET_SLOTS:]
            eq = (row_hi == hi) & (row_lo == lo)
            found = jnp.any(eq)
            # prefix-fill invariant: first empty slot == fill count
            fill = jnp.sum(row_hi == empty)
            first_empty = BUCKET_SLOTS - fill.astype(jnp.int32)
            # matched slot via masked min-reduce (Mosaic's reduce-index
            # lowering only supports f32; a plain int32 reduce does not)
            eq_slot = jnp.min(
                jnp.where(eq, lane_ids, jnp.int32(BUCKET_SLOTS))
            )
            slot = jnp.where(found, eq_slot, first_empty)
            sel = lane_ids == slot                  # (1, 128)

            # insert-if-absent: full-row masked write (no scalar stores)
            ins = sel & jnp.logical_not(found)
            new_hi = jnp.where(ins, hi, row_hi)
            new_lo = jnp.where(ins, lo, row_lo)
            rows_ref[pl.ds(b, 1), :] = jnp.concatenate(
                [new_hi, new_lo], axis=1
            )

            # accumulate: read-modify-write the value row through the mask
            vrow = vals_ref[pl.ds(b, 1), :]
            vals_ref[pl.ds(b, 1), :] = jnp.where(sel, vrow + upd, vrow)

        return 0

    jax.lax.fori_loop(0, n_rows * n_lanes, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_lookup_accumulate(
    khi: jnp.ndarray,     # (U,) uint32, EMPTY_HI = inactive
    klo: jnp.ndarray,     # (U,) uint32
    upd: jnp.ndarray,     # (U,) float32
    key_rows: jnp.ndarray,  # (NB, 256) uint32
    values: jnp.ndarray,    # (NB, 128) float32
    interpret: bool = False,
):
    """Find-or-insert every record and add its update to the value slot.
    Returns (new_key_rows, new_values)."""
    u = khi.shape[0]
    pad = (-u) % 1024  # SMEM record blocks are (8, 128); pad with inactive
    if pad:
        khi = jnp.concatenate(
            [khi, jnp.full((pad,), EMPTY_HI, khi.dtype)]
        )
        klo = jnp.concatenate([klo, jnp.zeros((pad,), klo.dtype)])
        upd = jnp.concatenate([upd, jnp.zeros((pad,), upd.dtype)])
        u += pad
    shape2 = (u // 128, 128)
    rec_spec = pl.BlockSpec(
        (8, 128), lambda i: (i, 0), memory_space=pltpu.SMEM
    )
    rows_spec = pl.BlockSpec(
        key_rows.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    vals_spec = pl.BlockSpec(
        values.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        grid=(u // 1024,),
        out_shape=(
            jax.ShapeDtypeStruct(key_rows.shape, key_rows.dtype),
            jax.ShapeDtypeStruct(values.shape, values.dtype),
        ),
        in_specs=[rec_spec, rec_spec, rec_spec, rows_spec, vals_spec],
        out_specs=(rows_spec, vals_spec),
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(
        khi.reshape(shape2), klo.reshape(shape2),
        upd.reshape(shape2), key_rows, values,
    )
    return out


@jax.jit
def xla_lookup_accumulate(khi, klo, upd, key_rows, values):
    """The XLA equivalent on the same layout (the production approach:
    grid/hash.bucket_lookup + plan/commit insert + one value scatter),
    restricted to the same op so the comparison is apples-to-apples.
    Requires the records to be mutually distinct (the engine's dedup
    guarantees it)."""
    from sonar_3d_reconstruction_tpu.grid.hash import (
        bucket_lookup,
        commit_insert,
        plan_insert,
    )

    nb = key_rows.shape[0]
    capacity = nb * BUCKET_SLOTS
    active = khi != jnp.uint32(EMPTY_HI)
    bucket, found, found_slot, fill = bucket_lookup(key_rows, khi, klo)
    need = active & ~found
    plan = plan_insert(key_rows, khi, klo, need, bucket, fill)
    new_rows = commit_insert(key_rows, plan, abort=jnp.zeros((), bool))
    slots = jnp.where(found, found_slot, plan.slots)
    slots = jnp.where(active, slots, capacity)
    flat = values.reshape(-1)
    cur = flat[jnp.minimum(slots, capacity - 1)]
    new_vals = flat.at[jnp.where(active, slots, capacity)].set(
        jnp.where(active, cur + upd, 0.0), mode="drop"
    )
    return new_rows, new_vals.reshape(values.shape)
