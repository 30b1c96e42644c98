"""Vector-parallel binned dedup+accumulate Pallas kernel (SURVEY §7 Stage 4,
VERDICT r4 item 1 — "the one unmeasured single-chip lever").

The brick window apply's single largest traced line item is the dense
record scatter: 1.34M sorted+unique u32 lanes into a (NB, B, vol) HBM
buffer at ~4.9 ns/lane (0.41 ms/ping at w16) — ~1000x off HBM bandwidth,
i.e. op-bound, not bandwidth-bound.  The round-2 Pallas experiment
(pallas/table_kernel.py) processed records SEQUENTIALLY on the scalar core
and lost 3.9x; its recorded lesson names the untried variant: process many
records per loop iteration — vector-parallel binning.  This kernel is that
variant, fused one step further:

  * records arrive (brick, frame, offset)-sorted (the bfv window sort the
    engine already does — "exploit that", VERDICT), so each compacted
    brick's records are a CONTIGUOUS range; an XLA-side compaction sort
    carries the start position of every brick's range (``brick_starts``);
  * the grid walks tiles of TB bricks; each tile streams its record range
    from HBM through double-buffered VMEM chunks (chunk-aligned dynamic
    DMA — up to one wasted boundary chunk per tile);
  * binning is MXU matmuls, not scatter: a chunk of CHUNK records builds a
    routing one-hot M (B*TB, CHUNK) over (frame, tile-local brick) and an
    offset one-hot scaled by the per-record aggregates (vol, CHUNK); two
    dot_generals accumulate (count, n_occ) into a (B*TB, vol) VMEM
    accumulator — at most ONE record per output slot (records are unique
    per (brick, frame, offset)), so the f32 sums are exact selections;
  * the reference's sequential per-frame adaptive update
    (scripts/3d_mapper.py:553-567, via ops/logodds.finalize_voxel_updates
    — the SAME function the XLA chain eval calls, so arithmetic is
    bit-identical) then runs over the VMEM accumulator against the brick
    value rows, which pipeline in/out as blocked operands.

Net: the dense buffer, its zero-init, the record scatter, and the chain
eval's HBM round trips all collapse into one kernel whose per-record cost
is ~1 VPU-cycle-per-64-slot-compare + amortized MXU passes.  Whether that
beats XLA's 4.9 ns/lane scatter at bench shapes is exactly what
scripts/profile_pallas_bin.py and the BENCH_DENSE_MODE=pallas A/B measure
(PERFORMANCE.md records the outcome either way).

Exactness vs the XLA path is asserted in interpret mode on CPU
(tests/test_pallas_bin.py) in f32 and f64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sonar_3d_reconstruction_tpu.ops.logodds import finalize_voxel_updates
from sonar_3d_reconstruction_tpu.ops.packing import EMPTY32

DEFAULT_TB = 8       # bricks per grid tile (B*TB = MXU-friendly 128 at w16)
DEFAULT_CHUNK = 1024  # records per DMA chunk


def _bin_kernel(
    starts_ref,            # (NBp+1,) i32 scalar-prefetch record-range starts
    key_hbm, pay_hbm,      # (KC, 1, CHUNK) u32, stay in HBM (manual DMA)
    rows_ref,              # (TB, vol) dtype current value rows (pipelined)
    v_ref, upd_ref,        # (TB, vol) outputs: new rows, touched i32 0/1
    *refs,                 # [occ_ref, free_ref (B, 1) if stats_out] + scratch
    B, vol, f_bits, o, TB, CHUNK, cfg, dtype, stats_out=False,
):
    if stats_out:
        occ_ref, free_ref = refs[0], refs[1]
        kbuf, pbuf, acc_cnt, acc_occ, sems = refs[2:]
    else:
        kbuf, pbuf, acc_cnt, acc_occ, sems = refs

    j = pl.program_id(0)
    base = starts_ref[j * TB]
    end = starts_ref[(j + 1) * TB]
    count = end - base

    acc_cnt[:] = jnp.zeros(acc_cnt.shape, acc_cnt.dtype)
    acc_occ[:] = jnp.zeros(acc_occ.shape, acc_occ.dtype)

    # chunk-aligned range [c0, c1]; boundary chunks are shared with the
    # neighbor tiles and masked by the g-in-[base, end) record test
    c0 = base // CHUNK
    c1 = jnp.maximum(end - 1, 0) // CHUNK
    n = jnp.where(count > 0, c1 - c0 + 1, 0)

    def dma(slot, c, buf, hbm, sem_i):
        return pltpu.make_async_copy(hbm.at[c], buf.at[slot], sems.at[slot, sem_i])

    @pl.when(n > 0)
    def _():
        dma(c0 % 2, c0, kbuf, key_hbm, 0).start()
        dma(c0 % 2, c0, pbuf, pay_hbm, 1).start()

    fmask = np.uint32((1 << f_bits) - 1)
    omask = np.uint32((1 << o) - 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (B * TB, CHUNK), 0)
    iota_off = jax.lax.broadcasted_iota(jnp.int32, (vol, CHUNK), 0)
    dn = (((1,), (1,)), ((), ()))  # contract the record dim of both

    def body(i, _):
        c = c0 + i
        slot = c % 2

        @pl.when(i + 1 < n)
        def _():
            dma((c + 1) % 2, c + 1, kbuf, key_hbm, 0).start()
            dma((c + 1) % 2, c + 1, pbuf, pay_hbm, 1).start()

        dma(slot, c, kbuf, key_hbm, 0).wait()
        dma(slot, c, pbuf, pay_hbm, 1).wait()

        key = kbuf[slot]                      # (1, CHUNK) u32
        pay = pbuf[slot]
        g = c * CHUNK + iota_r                # global record index
        in_rng = (g >= base) & (g < end)

        # tile-local brick rank from POSITION vs the tile's start
        # boundaries (no key arithmetic: ranks are compaction ranks)
        lb = jnp.zeros((1, CHUNK), jnp.int32)
        for t in range(1, TB):
            lb = lb + (g >= starts_ref[j * TB + t]).astype(jnp.int32)

        frame = ((key >> o) & fmask).astype(jnp.int32)
        off = (key & omask).astype(jnp.int32)
        col = jnp.where(in_rng, frame * TB + lb, -1)  # -1: one-hot row 0s

        m = (iota_col == col).astype(dtype)           # (B*TB, CHUNK)
        oh = (iota_off == off).astype(dtype)          # (vol, CHUNK)
        # Mosaic has no u32 -> float cast; values are < 2^16, so the
        # int32 hop is exact
        cnt = (pay >> 16).astype(jnp.int32).astype(dtype)  # (1, CHUNK)
        occ = (pay & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(dtype)
        # dedup records: one per (brick, frame, offset) slot -> at most
        # ONE nonzero term per accumulator element.  Raw-candidate mode:
        # many count<=2^16 integer terms sum exactly in f32 (< 2^24).
        acc_cnt[:] += jax.lax.dot_general(
            m, oh * cnt, dn, preferred_element_type=acc_cnt.dtype
        )
        acc_occ[:] += jax.lax.dot_general(
            m, oh * occ, dn, preferred_element_type=acc_occ.dtype
        )
        return 0

    jax.lax.fori_loop(0, n, body, 0)

    # sequential per-frame adaptive chain eval over the VMEM accumulator —
    # the exact arithmetic of grid/brick._apply_window_tail's dense loop
    occL = jnp.asarray(cfg.log_odds_occupied, dtype)
    freL = jnp.asarray(cfg.log_odds_free, dtype)
    v = rows_ref[:]
    upd = jnp.zeros((TB, vol), jnp.bool_)
    for f in range(B):
        cnt_f = acc_cnt[f * TB:(f + 1) * TB, :]
        occ_f = acc_occ[f * TB:(f + 1) * TB, :]
        lo_sum = occ_f * occL + (cnt_f - occ_f) * freL
        upd = upd | (cnt_f != 0)
        v = finalize_voxel_updates(v, lo_sum, cnt_f, occ_f > 0, cfg)
        if stats_out:
            # per-frame UNIQUE voxel counts by type over this tile (the
            # reference's num_occupied/num_free — needed when records
            # arrive as RAW candidates and the rec arrays no longer count
            # uniques).  Scalar reduce into the SMEM stat blocks (Mosaic
            # rejects the (B, TB*vol) reshape a vector variant would need).
            o_nz = occ_f > 0
            occ_ref[f, 0] = jnp.sum(o_nz.astype(jnp.int32))
            free_ref[f, 0] = jnp.sum(
                ((cnt_f != 0) & jnp.logical_not(o_nz)).astype(jnp.int32)
            )
    v_ref[:] = v
    upd_ref[:] = upd.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "B", "vol", "f_bits", "o", "cfg", "TB", "CHUNK", "interpret",
        "stats_out",
    ),
)
def pallas_bin_apply(
    s_flat,     # (L,) u32 (brick, frame, offset)-sorted bfv flat keys
    s_pay,      # (L,) u32 count<<16 | n_occ (records need NOT be unique:
                # the accumulator SUMS per slot — raw-candidate mode)
    starts,     # (NB+1,) i32 per-compacted-brick record-range starts
    rows_cur,   # (NB, vol) dtype gathered value rows, compacted-brick order
    *,
    B: int,
    vol: int,
    f_bits: int,
    o: int,
    cfg,
    TB: int = DEFAULT_TB,
    CHUNK: int = DEFAULT_CHUNK,
    interpret: bool = False,
    stats_out: bool = False,
):
    """Returns (new rows (NB, vol) dtype, touched-this-window (NB, vol)
    bool) — the chain-evaluated replacement for the XLA dense scatter +
    per-frame masked passes (grid/brick._apply_window_tail).  With
    ``stats_out`` additionally returns per-frame unique-voxel counts
    (occupied-typed (B,), free-typed (B,)) summed over tiles."""
    L = s_flat.shape[0]
    NB = rows_cur.shape[0]
    dtype = rows_cur.dtype
    KC = max(1, -(-L // CHUNK))
    padL = KC * CHUNK - L
    if padL:
        s_flat = jnp.concatenate(
            [s_flat, jnp.full((padL,), EMPTY32, jnp.uint32)]
        )
        s_pay = jnp.concatenate([s_pay, jnp.zeros((padL,), jnp.uint32)])
    key3 = s_flat.reshape(KC, 1, CHUNK)
    pay3 = s_pay.reshape(KC, 1, CHUNK)

    NT = -(-NB // TB)
    NBp = NT * TB
    if NBp != NB:
        rows_cur = jnp.concatenate(
            [rows_cur, jnp.zeros((NBp - NB, vol), dtype)]
        )
        # pad bricks are empty: start == end sentinel
        starts = jnp.concatenate(
            [starts[:NB], jnp.broadcast_to(starts[NB], (NBp + 1 - NB,))]
        )
    starts = starts.astype(jnp.int32)

    tile_spec = pl.BlockSpec(
        (TB, vol), lambda j, starts: (j, 0), memory_space=pltpu.VMEM
    )
    out_specs = [tile_spec, tile_spec]
    out_shape = [
        jax.ShapeDtypeStruct((NBp, vol), dtype),
        jax.ShapeDtypeStruct((NBp, vol), jnp.int32),
    ]
    if stats_out:
        stat_spec = pl.BlockSpec(
            (B, 1), lambda j, starts: (j, 0), memory_space=pltpu.SMEM
        )
        out_specs += [stat_spec, stat_spec]
        out_shape += [
            jax.ShapeDtypeStruct((NT * B, 1), jnp.int32),
            jax.ShapeDtypeStruct((NT * B, 1), jnp.int32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            tile_spec,
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((2, 1, CHUNK), jnp.uint32),
            pltpu.VMEM((2, 1, CHUNK), jnp.uint32),
            pltpu.VMEM((B * TB, vol), dtype),
            pltpu.VMEM((B * TB, vol), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kern = functools.partial(
        _bin_kernel, B=B, vol=vol, f_bits=f_bits, o=o, TB=TB, CHUNK=CHUNK,
        cfg=cfg, dtype=dtype, stats_out=stats_out,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(starts, key3, pay3, rows_cur)
    if stats_out:
        v, upd, occ_u, free_u = out
        return (
            v[:NB], upd[:NB] != 0,
            occ_u.reshape(NT, B).sum(axis=0),
            free_u.reshape(NT, B).sum(axis=0),
        )
    v, upd = out
    return v[:NB], upd[:NB] != 0
