"""Brick grid — sparse hash of DENSE voxel bricks (sparse-of-dense).

The round-2 voxel hash (grid/hash.py) spends its apply almost entirely on
indexed table operations whose measured cost is ~10 ns per ROW and
width-independent (PERFORMANCE.md cost table).  This backend exploits that:
the hash table is keyed by voxel BRICKS (4x4x4 by default) and each entry
stores a dense (brick_volume,) log-odds row, so one row gather/scatter moves
a whole brick of voxels for the price of one indexed lane.  Measured on the
bench survey, an 8-ping window touches ~30x fewer bricks than voxels
(~5-6k bricks vs ~186k distinct voxels), so the per-unique indexed work
almost vanishes.

The window apply also RESTRUCTURES chain evaluation into dense brick space:

  1. per-frame unique records (ops/dedup.py, brick-major packing from
     ops/packing.pack_brick_keys) are flattened with the FRAME INDEX folded
     into the packed code's 4 reserved low bits — one 2-key sort orders
     lanes (brick, offset, frame) with no extra payload array;
  2. record payloads (count<<16 | n_occ) scatter ONCE into a dense
     (NB, brick_volume, B) buffer with sorted+unique indices (the sort
     order makes the scatter indices strictly ascending — the only
     per-record indexed op in the whole apply);
  3. the reference's sequential per-frame adaptive update runs as B masked
     elementwise passes over the dense (NB, brick_volume) value rows —
     voxels with no record in frame f pass through untouched, exactly the
     semantics of applying frames one at a time (reference
     scripts/3d_mapper.py:553-567 per frame);
  4. one row gather before and one row scatter after move the table data.

A ``touched`` bitmask per brick preserves the reference's touched-voxel
semantics (SimpleOctree's dict only contains updated keys,
scripts/3d_mapper.py:34): extraction/classification/queries must
distinguish a never-updated voxel (p = 0.5, not reported) from an updated
voxel whose log-odds happens to be 0.0.

Failure contract identical to grid/hash.py: any overflow (lane budget,
brick budget, insert budget, bucket fill, key range, per-frame unique
budget, count-packing width) rejects the window all-or-nothing via dropped
scatters and poisons the state; the host grows the right knob and replays.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.grid.hash import (
    BUCKET_SLOTS,
    bucket_lookup,
    commit_insert,
    empty_key_rows,
    plan_insert,
)
from sonar_3d_reconstruction_tpu.ops.logodds import finalize_voxel_updates
from sonar_3d_reconstruction_tpu.ops.packing import (
    EMPTY32,
    EMPTY_HI,
    brick_layout,
    pack_brick_keys,
    unpack_box_brick,
    unpack_brick_keys,
)

DEFAULT_BRICK_BITS = 2  # 4x4x4 = 64 voxels per brick

_BRICK_BITS_BY_VOLUME = {8: 1, 64: 2, 512: 3}


class BrickGridState(NamedTuple):
    """Map state pytree.  Brick capacity Cb is static per jitted program;
    ``brick_bits`` is recovered from the value-row width."""

    key_rows: jnp.ndarray    # (Cb/128, 256) uint32 brick codes (offset+frame bits zero)
    log_odds: jnp.ndarray    # (Cb, brick_volume) dtype
    touched: jnp.ndarray     # (Cb, ceil(volume/32)) uint32 voxel bitmask
    min_bounds: jnp.ndarray  # (3,)
    max_bounds: jnp.ndarray  # (3,)
    used: jnp.ndarray        # () int32 touched VOXEL count
    poisoned: jnp.ndarray    # () bool

    @property
    def capacity(self) -> int:
        """Brick capacity (slots in the key table)."""
        return self.key_rows.shape[0] * BUCKET_SLOTS

    @property
    def brick_volume(self) -> int:
        return self.log_odds.shape[1]

    @property
    def brick_bits(self) -> int:
        return _BRICK_BITS_BY_VOLUME[self.brick_volume]

    @property
    def key_hi(self) -> jnp.ndarray:
        return self.key_rows[:, :BUCKET_SLOTS].reshape(-1)

    @property
    def key_lo(self) -> jnp.ndarray:
        return self.key_rows[:, BUCKET_SLOTS:].reshape(-1)


def init_brick_grid(
    capacity: int = 1 << 17,
    dtype=jnp.float32,
    brick_bits: int = DEFAULT_BRICK_BITS,
) -> BrickGridState:
    vol = 1 << (3 * brick_bits)
    words = max(1, vol // 32)
    big = jnp.asarray(jnp.inf, dtype)
    return BrickGridState(
        key_rows=empty_key_rows(capacity),
        log_odds=jnp.zeros((capacity, vol), dtype),
        touched=jnp.zeros((capacity, words), jnp.uint32),
        min_bounds=jnp.full((3,), big, dtype),
        max_bounds=jnp.full((3,), -big, dtype),
        used=jnp.zeros((), jnp.int32),
        poisoned=jnp.zeros((), bool),
    )


def _masks(brick_bits: int) -> Tuple[jnp.ndarray, int]:
    """(brick-identity lo mask, offset bit count)."""
    _, o, _ = brick_layout(brick_bits)
    return jnp.uint32(0xFFFFFFFF ^ ((1 << (o + 4)) - 1)), o


def _pack_touched(mask: jnp.ndarray) -> jnp.ndarray:
    """(NB, volume) bool -> (NB, words) uint32 bitmask (bit v%32 of word v/32)."""
    nb, vol = mask.shape
    words = max(1, vol // 32)
    per = min(32, vol)
    m = mask.reshape(nb, words, per).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(per, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(m * weights, axis=2).astype(jnp.uint32)


def default_brick_budget(window: int, unique_budget: int) -> int:
    """Safe default for the window's distinct-brick budget.  Measured
    occupancy on realistic surveys is ~30+ voxels/brick at 4x4x4 and 5 cm
    (PERFORMANCE.md); the default only assumes >= 4 with a generous floor —
    hosts double it on ``batch_overflow`` and the bench tunes it snugly from
    the reported ``batch_n_bricks``.

    The window factor is capped at 8: consecutive pings overlap heavily
    (grid/hash.default_batch_budget rationale) AND the dense chain buffer
    is (budget, volume, window) — an uncapped w16 default put a 2 GB+
    buffer in one program and blew the 16 GB HBM at compile time (and the
    //4 default grazed it at w8 on a 16 GB chip: 15.76/15.75 G).  //6
    still assumes well under the measured ~32 voxels/brick; hosts grow on
    ``batch_overflow`` if a geometry is sparser."""
    return max(8192, (min(window, 8) * unique_budget) // 6)


def apply_brick_records_batched(
    state: BrickGridState,
    recs,   # ops.dedup.UniqueRecords stacked over B frames, BRICK packing
    auxs,   # ops.records.FrameAux stacked over B frames
    cfg: MapperConfig,
    brick_budget: Optional[int] = None,
    lane_budget: Optional[int] = None,
    insert_budget: Optional[int] = None,
    fail_reduce=None,
) -> Tuple[BrickGridState, Dict[str, jnp.ndarray]]:
    """Apply a window of B frames to the brick table (see module docstring).

    ``lane_budget`` bounds the window's summed per-frame unique records (the
    one per-record indexed op — the dense scatter — runs at this width);
    ``brick_budget`` bounds its DISTINCT bricks (all table ops run at this
    width); ``insert_budget`` bounds NEW bricks (grid/hash.plan_insert
    budget slicing).  All-or-nothing on any overflow, exactly like
    grid/hash.apply_records_batched.
    """
    B, U = recs.hi.shape
    bb = state.brick_bits
    vol = state.brick_volume
    brick_mask, o = _masks(bb)
    assert B <= 16, "frame index is folded into 4 reserved key bits"

    n = B * U
    NB = brick_budget or default_brick_budget(B, U)
    Lb = min(n, max(lane_budget or n, 1))

    hi = recs.hi.reshape(-1)
    lo = recs.lo.reshape(-1)
    frame = jnp.repeat(jnp.arange(B, dtype=jnp.uint32), U)
    lo_f = lo | frame  # low 4 bits are reserved zero in brick packing
    count = recs.count.reshape(-1)
    n_occ = recs.n_occ.reshape(-1)
    # count<<16|n_occ packing: a voxel receiving 2^16+ emissions in ONE
    # frame is beyond any real sonar geometry; reject (not growable) if
    # hit.  Only frames whose dedup did NOT overflow may assert it: a
    # unique-budget overflow marks every record lane "valid" (n_unique =
    # n+1) and the truncated tail then carries adjacent-difference
    # GARBAGE counts — the window is rejected either way (all-or-nothing),
    # but the host must see the growable unique_overflow cause, not a
    # spurious fatal pack_overflow (bit us: a snug streaming budget raised
    # "2^16+ emissions" instead of growing).
    frame_ok = jnp.repeat(recs.n_unique <= U, U)
    pack_overflow = jnp.any(frame_ok & (count > 0xFFFF))
    payload = (
        (count.astype(jnp.uint32) << 16) | n_occ.astype(jnp.uint32)
    )

    # ---- the one big sort: (brick, offset, frame) ascending.  Keys are
    # UNIQUE per (voxel, frame) record, so the unstable sort (no implicit
    # tiebreak array) is exact
    s_hi, s_lo, s_pay = jax.lax.sort(
        (hi, lo_f, payload), num_keys=2, is_stable=False
    )
    seg_valid = s_hi != EMPTY_HI
    n_valid_lanes = jnp.sum(seg_valid).astype(jnp.int32)
    lanes_overflow = n_valid_lanes > Lb

    b_lo_id = s_lo & brick_mask
    new_brick = jnp.concatenate(
        [jnp.ones((1,), bool),
         (s_hi[1:] != s_hi[:-1]) | (b_lo_id[1:] != b_lo_id[:-1])]
    )
    n_bricks = jnp.sum(new_brick & seg_valid).astype(jnp.int32)
    brick_overflow = n_bricks > NB
    # distinct voxels (diagnostic stat only — nothing is budgeted on it)
    vox_id = s_lo & jnp.uint32(0xFFFFFFF0)
    new_vox = jnp.concatenate(
        [jnp.ones((1,), bool),
         (s_hi[1:] != s_hi[:-1]) | (vox_id[1:] != vox_id[:-1])]
    )
    n_unique = jnp.sum(new_vox & seg_valid).astype(jnp.int32)

    brick_seg = jnp.cumsum(new_brick.astype(jnp.int32)) - 1

    # ---- dense record scatter at the Lb prefix (sorted + unique indices)
    s_lo_l = s_lo[:Lb]
    valid_l = seg_valid[:Lb]
    offset_l = ((s_lo_l >> 4) & jnp.uint32((1 << o) - 1)).astype(jnp.int32)
    frame_l = (s_lo_l & jnp.uint32(0xF)).astype(jnp.int32)
    lane_l = jnp.arange(Lb, dtype=jnp.int32)
    didx = brick_seg[:Lb] * (vol * B) + offset_l * B + frame_l
    # tail lanes: ascending unique out-of-range indices keep the sorted/
    # unique promises honest while dropping the writes
    didx = jnp.where(valid_l, didx, NB * vol * B + lane_l)
    dense = (
        jnp.zeros((NB * vol * B,), jnp.uint32)
        .at[didx]
        .set(s_pay[:Lb], mode="drop", unique_indices=True,
             indices_are_sorted=True)
        .reshape(NB, vol, B)
    )

    # ---- compact distinct bricks to the NB budget (record starts live in
    # the valid prefix, so the compaction sort runs at Lb lanes)
    # brick identities are distinct among start lanes, so promoting them to
    # sort keys keeps the compacted list key-ordered (brick_seg indexes it)
    # without stable-sort cost
    not_start = (~(new_brick[:Lb] & valid_l)).astype(jnp.uint32)
    _, c_hi, c_lo = jax.lax.sort(
        (not_start, s_hi[:Lb], b_lo_id[:Lb]), num_keys=3, is_stable=False
    )

    def take(x, fill):
        if NB <= Lb:
            return x[:NB]
        return jnp.concatenate([x, jnp.full((NB - Lb,), fill, x.dtype)])

    lane_b = jnp.arange(NB, dtype=jnp.int32)
    valid_b = lane_b < n_bricks
    c_hi = jnp.where(valid_b, take(c_hi, EMPTY_HI), EMPTY_HI)
    c_lo = jnp.where(valid_b, take(c_lo, EMPTY_HI), EMPTY_HI)

    rec_valid = recs.hi != jnp.uint32(EMPTY_HI)  # (B, U)
    return _apply_window_tail(
        state, cfg, c_hi, c_lo, valid_b, n_bricks, dense,
        lanes_overflow=lanes_overflow, brick_overflow=brick_overflow,
        pack_overflow=pack_overflow,
        frame_overflow=jnp.any(recs.n_unique > U),
        auxs=auxs, rec_valid=rec_valid, rec_occ=rec_valid & (recs.n_occ > 0),
        n_unique=n_unique, n_valid_lanes=n_valid_lanes,
        insert_budget=insert_budget, fail_reduce=fail_reduce,
    )


def _apply_window_tail(
    state: BrickGridState,
    cfg: MapperConfig,
    c_hi, c_lo, valid_b, n_bricks, dense,
    *,
    lanes_overflow, brick_overflow, pack_overflow, frame_overflow,
    auxs, rec_valid, rec_occ, n_unique, n_valid_lanes,
    insert_budget, fail_reduce, dense_order: str = "bvf",
    pallas_bin=None,
) -> Tuple[BrickGridState, Dict[str, jnp.ndarray]]:
    """Shared second half of the window apply: table interaction at NB
    compacted-brick lanes, dense sequential chain evaluation, all-or-nothing
    commit and stats — identical for global-key and compact box-key fronts.

    ``dense_order`` names the dense buffer's frame-axis position:
    ``"bvf"`` = (NB, vol, B) (scalar/row modes), ``"bfv"`` = (NB, B, vol).
    ``n_unique=None`` computes the window's distinct-voxel stat from the
    chain's touched-union popcount (bfv mode — see the compact front).
    ``pallas_bin`` (dense_mode="pallas"): ``dense`` is None and the dict
    carries (s_flat, s_pay, starts, f_bits, o) for the fused
    pallas/bin_kernel.py binning + chain-eval kernel.
    """
    B = rec_valid.shape[0]
    vol = state.brick_volume
    cap = state.capacity
    dtype = state.log_odds.dtype
    NB = c_hi.shape[0]

    # ---- table ops at NB lanes
    bucket, found, found_slot, fill = bucket_lookup(state.key_rows, c_hi, c_lo)
    need = valid_b & ~found
    plan = plan_insert(
        state.key_rows, c_hi, c_lo, need, bucket, fill, budget=insert_budget
    )
    insert_overflow = plan.budget_overflow

    range_fail = jnp.any(auxs.range_fail)
    failed = (
        lanes_overflow
        | brick_overflow
        | plan.overflowed
        | range_fail
        | frame_overflow
        | pack_overflow
        | state.poisoned
    )
    if fail_reduce is not None:
        failed = fail_reduce(failed)

    key_rows = commit_insert(state.key_rows, plan, abort=failed)
    slots = jnp.where(found, found_slot, plan.slots)
    slots = jnp.where(valid_b, slots, cap)
    slots_c = jnp.minimum(slots, cap - 1)
    rows_cur = state.log_odds[slots_c]          # (NB, vol) row gather
    touched_cur = state.touched[slots_c]        # (NB, words)
    # rows of never-inserted bricks read 0 — the reference's never-seen
    # log-odds (3d_mapper.py:117-120); new-brick value rows are still
    # all-zero by the never-removed invariant

    # ---- dense sequential chain evaluation: B masked elementwise passes
    # (or the fused Pallas binning kernel, which subsumes the dense buffer)
    k_occ = k_free = None
    if pallas_bin is not None:
        from sonar_3d_reconstruction_tpu.pallas.bin_kernel import (
            pallas_bin_apply,
        )

        out = pallas_bin_apply(
            pallas_bin["s_flat"], pallas_bin["s_pay"],
            pallas_bin["starts"], rows_cur,
            B=B, vol=vol, f_bits=pallas_bin["f_bits"], o=pallas_bin["o"],
            cfg=cfg, TB=pallas_bin["tb"], CHUNK=pallas_bin["chunk"],
            stats_out=pallas_bin["raw"],
            # Mosaic needs the real TPU; everywhere else (CPU tests,
            # virtual meshes) the interpreter preserves exact semantics
            interpret=jax.devices()[0].platform != "tpu",
        )
        if pallas_bin["raw"]:
            v, upd_mask, k_occ, k_free = out
        else:
            v, upd_mask = out
    else:
        occL = jnp.asarray(cfg.log_odds_occupied, dtype)
        freL = jnp.asarray(cfg.log_odds_free, dtype)
        v = rows_cur
        upd_mask = jnp.zeros((NB, vol), bool)  # touched-this-window accum
        for f in range(B):
            d = dense[:, :, f] if dense_order == "bvf" else dense[:, f, :]
            cnt_f = (d >> 16).astype(dtype)
            occ_f = (d & jnp.uint32(0xFFFF)).astype(dtype)
            lo_sum = occ_f * occL + (cnt_f - occ_f) * freL
            upd_mask = upd_mask | (d != 0)
            v = finalize_voxel_updates(v, lo_sum, cnt_f, occ_f > 0, cfg)

    bits = _pack_touched(upd_mask)
    if n_unique is None:
        # exact when nothing overflowed (every record scattered); budget-
        # clipped under overflow, where the window is rejected anyway
        n_unique = jnp.sum(
            jnp.where(valid_b[:, None], jax.lax.population_count(bits), 0)
        ).astype(jnp.int32)
    touched_new = touched_cur | bits
    n_new = jnp.sum(
        jnp.where(
            valid_b[:, None],
            jax.lax.population_count(bits & ~touched_cur),
            0,
        )
    ).astype(jnp.int32)

    w_slots = jnp.where(failed, cap, slots)
    new_lo = state.log_odds.at[w_slots].set(v, mode="drop")
    new_touched = state.touched.at[w_slots].set(touched_new, mode="drop")

    zero = jnp.zeros((), jnp.int32)
    new_state = state._replace(
        key_rows=key_rows,
        log_odds=new_lo,
        touched=new_touched,
        min_bounds=jnp.where(
            failed,
            state.min_bounds,
            jnp.minimum(
                state.min_bounds, jnp.min(auxs.cmin, axis=0).astype(dtype)
            ),
        ),
        max_bounds=jnp.where(
            failed,
            state.max_bounds,
            jnp.maximum(
                state.max_bounds, jnp.max(auxs.cmax, axis=0).astype(dtype)
            ),
        ),
        used=state.used + jnp.where(failed, zero, n_new),
        poisoned=state.poisoned | failed,
    )

    zeroB = jnp.zeros((B,), jnp.int32)
    stats = {
        "num_occupied": jnp.where(
            failed, zeroB, jnp.sum(rec_occ, axis=1).astype(jnp.int32)
        ),
        "num_free": jnp.where(
            failed, zeroB,
            jnp.sum(rec_valid & ~rec_occ, axis=1).astype(jnp.int32),
        ),
        "num_candidates": jnp.where(failed, zeroB, auxs.n_valid),
        "overflowed": jnp.broadcast_to(failed, (B,)),
        "unique_overflow": jnp.broadcast_to(frame_overflow, (B,)),
        # host growth channel: double brick/lane budgets (cheap recompile)
        "batch_overflow": jnp.broadcast_to(
            brick_overflow | lanes_overflow, (B,)
        ),
        "insert_overflow": jnp.broadcast_to(insert_overflow, (B,)),
        # measured requirements for snug budget sizing
        "batch_n_unique": jnp.broadcast_to(n_unique, (B,)),
        "batch_n_bricks": jnp.broadcast_to(n_bricks, (B,)),
        "batch_n_lanes": jnp.broadcast_to(n_valid_lanes, (B,)),
        "batch_n_need": jnp.broadcast_to(plan.n_need, (B,)),
        "pack_overflow": jnp.broadcast_to(pack_overflow, (B,)),
        "range_fail": auxs.range_fail,
    }
    if k_occ is not None:
        # raw-candidate mode: the rec arrays count CANDIDATES, not unique
        # voxels — the kernel's per-frame popcounts are the reference
        # num_occupied/num_free (unique voxels by type)
        stats["num_occupied"] = jnp.where(failed, zeroB, k_occ)
        stats["num_free"] = jnp.where(failed, zeroB, k_free)
    return new_state, stats


def apply_brick_records_compact(
    state: BrickGridState,
    recs,   # ops.dedup.CompactRecords stacked over B frames (box keys)
    auxs,   # ops.records.FrameAux stacked over B frames
    cfg: MapperConfig,
    box_min,                 # (3,) int32 brick-aligned box-origin voxel key
    box_bits: Tuple[int, int, int],
    brick_budget: Optional[int] = None,
    lane_budget: Optional[int] = None,
    insert_budget: Optional[int] = None,
    vox_budget: Optional[int] = None,
    dense_mode: str = "scalar",
    fail_reduce=None,
) -> Tuple[BrickGridState, Dict[str, jnp.ndarray]]:
    """apply_brick_records_batched over single-u32 BOX-RELATIVE keys
    (ops/packing box-key section).  The window sort carries (key, payload)
    instead of (hi, lo, payload) and the brick compaction sort carries ONE
    u32 instead of three — sort cost is ~linear in bytes.  Identical
    semantics, budgets, and failure contract; the compacted brick list is
    translated back to global codes (NB elementwise lanes) before the
    shared table/chain tail.

    ``dense_mode`` selects how record payloads reach the dense
    chain buffer (all bit-identical):

    * ``"scalar"`` — one u32 scatter at the Lb lane prefix (one index
      entry per record lane, valid or not; measured ~4.6 ns/entry) into
      a (NB, vol, B) buffer.
    * ``"bfv"`` — same scatter, but the flat sort key packs the FRAME
      field between brick and offset ((brick, frame, offset) ascending
      instead of (brick, offset, frame)), so the sorted+unique scatter
      writes a (NB, B, vol) buffer whose per-frame chain slices
      ``dense[:, f, :]`` are contiguous per brick row.  Motivation: the
      round-4 w16 op trace showed the scalar buffer paying a 0.11
      ms/ping pure RELAYOUT copy ({2,1,0} -> {1,0,2}) between the
      scatter's row-major output and the chain evaluation's preferred
      frame-major tiling — bfv hands the chain eval its layout directly.
      Brick compaction is unchanged (brick ids occupy the same high bits
      in both packings); the window-unique-voxel stat is computed from
      the chain's touched-union popcount instead of the sort adjacency
      (records of one voxel are no longer adjacent across frames), so
      under a budget overflow ``batch_n_unique`` reports the
      budget-clipped count — fine, nothing grows from it in this mode.
    * ``"pallas"`` — the bfv front (same frame-mid flat keys, window sort,
      and brick compaction — the compaction additionally carries each
      brick's record-range START position), but NO dense buffer at all:
      the sorted (key, payload) records and the per-brick ranges go to
      the fused Pallas binning kernel (pallas/bin_kernel.py), which bins
      records into VMEM accumulators with MXU one-hot matmuls and runs
      the per-frame chain eval against the pipelined value rows in one
      kernel.  Replaces the dense record scatter — the single largest
      traced op (PERFORMANCE.md w16 trace) — plus the dense buffer's HBM
      round trips.  Bit-identical (asserted in interpret mode,
      tests/test_pallas_bin.py); adoption is strictly by measured A/B
      (VERDICT r4 item 1).
    * ``"row"`` — records of one voxel are CONTIGUOUS after the big sort
      (frame is the key's low field), so the window's whole per-voxel
      frame row (B payloads) is assembled elementwise from backward
      shifts and scattered as ONE (B,)-wide row per distinct voxel:
      index entries drop from Lb to ``vox_budget`` (~3x fewer on survey
      data; indexed-op cost is per index entry).  Costs one extra
      2-array compaction sort (voxel end lanes + their positions) and a
      row gather; the brick list then falls out of the compacted voxel
      keys with a vox_budget-wide sort instead of the Lb-wide one.

    ``vox_budget`` bounds the window's DISTINCT voxels in row mode
    (default: ``lane_budget`` — always sufficient; hosts size it snugly
    from the reported ``batch_n_unique``).  Overflow reports through the
    growable ``batch_overflow`` channel.
    """
    B, U = recs.key.shape
    bb = state.brick_bits
    vol = state.brick_volume
    o = 3 * bb
    V = sum(box_bits) + o
    f_bits = max(1, (B - 1).bit_length())
    assert V + f_bits <= 31, (box_bits, B)

    n = B * U
    NB = brick_budget or default_brick_budget(B, U)
    Lb = min(n, max(lane_budget or n, 1))

    key = recs.key.reshape(-1)
    rec_valid_flat = key != EMPTY32
    frame = jnp.repeat(
        jnp.arange(B, dtype=jnp.uint32), U
    )
    # "pallas" accepts static tuning suffixes: "pallas-tb16-c512" sets the
    # kernel's bricks-per-tile / records-per-chunk (defaults 8 / 1024).
    # They ride in the dense_mode STRING so they stay part of every jit
    # static-arg key up the stack (an env knob would silently be ignored
    # by a same-shape cached trace).
    is_pallas = dense_mode.startswith("pallas")
    if dense_mode == "bfv" or is_pallas:
        # (brick, FRAME, offset) flat key — same total width, frame field
        # moved between brick and offset; valid keys stay < 2^31
        o_mask = jnp.uint32((1 << o) - 1)
        flat = jnp.where(
            rec_valid_flat,
            ((key >> o) << (o + f_bits)) | (frame << o) | (key & o_mask),
            EMPTY32,
        )
    else:
        # (voxel, frame) flat key; valid keys stay < 2^31 (V + f_bits <= 31)
        flat = jnp.where(rec_valid_flat, (key << f_bits) | frame, EMPTY32)
    # dedup_frame_compact pre-packs (count<<16 | n_occ) and detects the
    # unrepresentable 2^16+ case itself, budget-independently — no
    # count-width check needed here (contrast apply_brick_records_batched)
    pack_overflow = jnp.any(recs.pack_fail)
    payload = recs.payload.reshape(-1)

    # ---- the one big sort: (brick, offset, frame) ascending, TWO arrays.
    # Valid keys are unique per (voxel, frame) record; EMPTY lanes carry
    # payload 0, so the unstable tie order among them is irrelevant
    s_flat, s_pay = jax.lax.sort((flat, payload), num_keys=1, is_stable=False)
    seg_valid = s_flat != EMPTY32
    n_valid_lanes = jnp.sum(seg_valid).astype(jnp.int32)
    lanes_overflow = n_valid_lanes > Lb

    brick_id = s_flat >> (f_bits + o)   # EMPTY lanes -> all-ones id
    new_brick = jnp.concatenate(
        [jnp.ones((1,), bool), brick_id[1:] != brick_id[:-1]]
    )
    n_bricks = jnp.sum(new_brick & seg_valid).astype(jnp.int32)
    brick_overflow = n_bricks > NB
    if dense_mode == "bfv" or is_pallas:
        # a voxel's records across frames are not adjacent in
        # (brick, frame, offset) order — the exact window-unique count is
        # computed in the tail from the touched-union popcount instead
        n_unique = None
    else:
        vox_id = s_flat >> f_bits
        new_vox = jnp.concatenate(
            [jnp.ones((1,), bool), vox_id[1:] != vox_id[:-1]]
        )
        n_unique = jnp.sum(new_vox & seg_valid).astype(jnp.int32)

    s_flat_l = s_flat[:Lb]
    valid_l = seg_valid[:Lb]
    if dense_mode == "bfv" or is_pallas:
        frame_l = (
            (s_flat_l >> o) & jnp.uint32((1 << f_bits) - 1)
        ).astype(jnp.int32)
    else:
        frame_l = (
            s_flat_l & jnp.uint32((1 << f_bits) - 1)
        ).astype(jnp.int32)
    lane_l = jnp.arange(Lb, dtype=jnp.int32)
    vox_overflow = jnp.zeros((), bool)
    pallas_bin = None
    dense = None

    if is_pallas:
        # ---- NO dense buffer (see docstring): the brick compaction sort
        # additionally carries each start's lane POSITION (2 arrays where
        # bfv's carries 1) — the Lb-lane dense scatter it buys off is ~4x
        # the extra payload's sort bytes.  Ranges of the compacted bricks
        # tile the valid lane prefix contiguously, so brick i's records
        # are [starts[i], starts[i+1]).
        c_key = jnp.where(new_brick[:Lb] & valid_l, brick_id[:Lb], EMPTY32)
        c_bid, c_pos = jax.lax.sort(
            (c_key, lane_l.astype(jnp.uint32)), num_keys=1, is_stable=False
        )
        if NB > Lb:
            c_bid = jnp.concatenate(
                [c_bid, jnp.full((NB - Lb,), EMPTY32, jnp.uint32)]
            )
            c_pos = jnp.concatenate(
                [c_pos, jnp.zeros((NB - Lb,), jnp.uint32)]
            )
        else:
            c_bid = c_bid[:NB]
            c_pos = c_pos[:NB]
        # empty/tail bricks get the end sentinel (empty ranges); under a
        # brick/lane overflow the ranges are garbage-but-bounded and the
        # window is rejected all-or-nothing anyway
        n_val_c = jnp.minimum(n_valid_lanes, jnp.int32(Lb))
        lane_nb = jnp.arange(NB, dtype=jnp.int32)
        starts = jnp.where(
            (lane_nb < n_bricks) & (c_bid != EMPTY32),
            c_pos.astype(jnp.int32), n_val_c,
        )
        starts = jnp.concatenate([starts, n_val_c[None]])
        tb, chunk, raw = 8, 1024, False
        for part in dense_mode.split("-")[1:]:
            if part == "raw":
                # records are RAW candidates (ops/records raw mode): the
                # kernel's summing accumulator computes the aggregates,
                # and the per-frame unique stats come from the kernel
                raw = True
            elif part.startswith("tb"):
                tb = int(part[2:])
            elif part.startswith("c"):
                chunk = int(part[1:])
        pallas_bin = dict(
            s_flat=s_flat_l, s_pay=s_pay[:Lb], starts=starts,
            f_bits=f_bits, o=o, tb=tb, chunk=chunk, raw=raw,
        )
    elif dense_mode == "bfv":
        brick_seg = jnp.cumsum(new_brick.astype(jnp.int32)) - 1

        # ---- dense record scatter at the Lb prefix: (brick, frame,
        # offset) sorted order makes frame-mid flat indices ascending, so
        # the scatter stays sorted+unique and lands directly in the
        # (NB, B, vol) layout the chain eval slices
        offset_l = (s_flat_l & jnp.uint32((1 << o) - 1)).astype(jnp.int32)
        didx = brick_seg[:Lb] * (vol * B) + frame_l * vol + offset_l
        didx = jnp.where(valid_l, didx, NB * vol * B + lane_l)
        dense = (
            jnp.zeros((NB * vol * B,), jnp.uint32)
            .at[didx]
            .set(s_pay[:Lb], mode="drop", unique_indices=True,
                 indices_are_sorted=True)
            .reshape(NB, B, vol)
        )

        # ---- brick compaction identical to scalar mode (brick ids occupy
        # the same high bits in both packings)
        c_bid = jnp.where(new_brick[:Lb] & valid_l, brick_id[:Lb], EMPTY32)
        (c_bid,) = jax.lax.sort((c_bid,), num_keys=1, is_stable=False)

        if NB > Lb:
            c_bid = jnp.concatenate(
                [c_bid, jnp.full((NB - Lb,), EMPTY32, jnp.uint32)]
            )
        else:
            c_bid = c_bid[:NB]
    elif dense_mode == "scalar":
        brick_seg = jnp.cumsum(new_brick.astype(jnp.int32)) - 1

        # ---- dense record scatter at the Lb prefix (sorted + unique)
        offset_l = ((s_flat_l >> f_bits) & jnp.uint32((1 << o) - 1)).astype(
            jnp.int32
        )
        didx = brick_seg[:Lb] * (vol * B) + offset_l * B + frame_l
        didx = jnp.where(valid_l, didx, NB * vol * B + lane_l)
        dense = (
            jnp.zeros((NB * vol * B,), jnp.uint32)
            .at[didx]
            .set(s_pay[:Lb], mode="drop", unique_indices=True,
                 indices_are_sorted=True)
            .reshape(NB, vol, B)
        )

        # ---- compact distinct bricks to NB: ONE u32 sort array (brick ids
        # are distinct among start lanes and < 2^(V-o), so EMPTY32 is a safe
        # not-a-start sentinel that sorts last)
        c_bid = jnp.where(new_brick[:Lb] & valid_l, brick_id[:Lb], EMPTY32)
        (c_bid,) = jax.lax.sort((c_bid,), num_keys=1, is_stable=False)

        if NB > Lb:
            c_bid = jnp.concatenate(
                [c_bid, jnp.full((NB - Lb,), EMPTY32, jnp.uint32)]
            )
        else:
            c_bid = c_bid[:NB]
    else:
        assert dense_mode == "row", dense_mode
        UV = min(Lb, max(vox_budget or Lb, 1))

        # ---- per-voxel (B,) frame rows, assembled elementwise: within a
        # voxel the sorted order is frame-ascending, so lane i's row slot k
        # is the payload of the unique lane i-j (j < B) of the SAME voxel
        # with frame k — backward-inclusive, so each voxel's END lane
        # holds its complete row (only end lanes are consumed below)
        vox_l = s_flat_l >> f_bits
        rows = []
        for k in range(B):
            acc = jnp.zeros((Lb,), jnp.uint32)
            # shifts j >= Lb move every lane out of the window (their pads
            # never match vox_l), and the slice below would go negative —
            # clamp so a lane budget below the window size degrades to the
            # normal lanes_overflow contract instead of a trace-time crash
            for j in range(min(B - k, Lb)):
                # frames strictly ascend within a voxel, so lane i-j has
                # frame <= frame[i] - j; slot k (== frame[i-j]) therefore
                # only comes from shifts j <= (B-1) - k
                pay_j = (
                    s_pay[:Lb] if j == 0
                    else jnp.concatenate(
                        [jnp.zeros((j,), jnp.uint32), s_pay[: Lb - j]]
                    )
                )
                vox_j = (
                    vox_l if j == 0
                    else jnp.concatenate(
                        [jnp.full((j,), EMPTY32, jnp.uint32),
                         vox_l[: Lb - j]]
                    )
                )
                frame_j = (
                    frame_l if j == 0
                    else jnp.concatenate(
                        [jnp.full((j,), -1, jnp.int32), frame_l[: Lb - j]]
                    )
                )
                acc = acc | jnp.where(
                    (vox_j == vox_l) & (frame_j == k), pay_j, 0
                )
            rows.append(acc)
        rows = jnp.stack(rows, axis=1)  # (Lb, B)

        # ---- compact voxel END lanes (key + source position, 2 arrays)
        vend = (
            jnp.concatenate([vox_l[:-1] != vox_l[1:], jnp.ones((1,), bool)])
            & valid_l
        )
        end_key = jnp.where(vend, vox_l, EMPTY32)
        c_vox, c_pos = jax.lax.sort(
            (end_key, lane_l.astype(jnp.uint32)), num_keys=1,
            is_stable=False,
        )

        # UV <= Lb by construction (the vox budget is clamped to the lane
        # prefix above), so the compacted views are plain prefix slices
        lane_v = jnp.arange(UV, dtype=jnp.int32)
        valid_v = lane_v < n_unique
        vox_overflow = n_unique > UV
        c_vox = jnp.where(valid_v, c_vox[:UV], EMPTY32)
        c_pos = jnp.minimum(c_pos[:UV], jnp.uint32(Lb - 1))
        rows_c = rows[c_pos.astype(jnp.int32)]  # (UV, B) row gather

        # ---- brick ranks fall out of the compacted voxel keys
        bid_c = c_vox >> o
        newb_c = jnp.concatenate(
            [jnp.ones((1,), bool), bid_c[1:] != bid_c[:-1]]
        ) & valid_v
        brick_rank = jnp.cumsum(newb_c.astype(jnp.int32)) - 1
        off_c = (c_vox & jnp.uint32((1 << o) - 1)).astype(jnp.int32)
        row_idx = jnp.where(
            valid_v, brick_rank * vol + off_c, NB * vol + lane_v
        )
        dense = (
            jnp.zeros((NB * vol, B), jnp.uint32)
            .at[row_idx]
            .set(rows_c, mode="drop", unique_indices=True,
                 indices_are_sorted=True)
            .reshape(NB, vol, B)
        )

        # ---- distinct-brick list from the UV-wide compacted voxels
        c_bid = jnp.where(newb_c, bid_c, EMPTY32)
        (c_bid,) = jax.lax.sort((c_bid,), num_keys=1, is_stable=False)
        if NB > UV:
            c_bid = jnp.concatenate(
                [c_bid, jnp.full((NB - UV,), EMPTY32, jnp.uint32)]
            )
        else:
            c_bid = c_bid[:NB]

    lane_b = jnp.arange(NB, dtype=jnp.int32)
    # the EMPTY32 mask matters in row mode under a vox-budget overflow:
    # n_bricks counts the FULL lane width while the truncated voxel list
    # carries fewer distinct bricks, and translating the EMPTY32 tail
    # would misreport the (growable, batch_overflow) truncation as a
    # fatal range_fail (scalar mode: the first n_bricks entries are
    # never EMPTY32, so the mask is a no-op)
    valid_b = (lane_b < n_bricks) & (c_bid != EMPTY32)

    # ---- translate compacted brick box ids -> global brick codes (NB
    # elementwise lanes; box_min is brick-aligned so corners stay aligned).
    # compute_window_boxes pre-verified the box against the global packable
    # range, so in_range can only fail on a (would-be) engine bug — fold it
    # into range_fail to keep the failure contract airtight.
    corner = unpack_box_brick(
        jnp.where(valid_b, c_bid, 0), box_min, box_bits, bb
    )
    g_hi, g_lo, g_ok = pack_brick_keys(corner, bb)
    trans_fail = jnp.any(valid_b & ~g_ok)
    c_hi = jnp.where(valid_b, g_hi, EMPTY_HI)
    c_lo = jnp.where(valid_b, g_lo, EMPTY_HI)

    auxs = auxs._replace(range_fail=auxs.range_fail | trans_fail)
    rec_valid = recs.key != EMPTY32  # (B, U)
    return _apply_window_tail(
        state, cfg, c_hi, c_lo, valid_b, n_bricks, dense,
        # vox-budget overflow is growable like the lane budget: both
        # report through batch_overflow and hosts re-derive them from the
        # measured batch_n_unique / batch_n_lanes stats
        lanes_overflow=lanes_overflow | vox_overflow,
        brick_overflow=brick_overflow,
        pack_overflow=pack_overflow,
        frame_overflow=jnp.any(recs.n_unique > U),
        auxs=auxs, rec_valid=rec_valid, rec_occ=rec_valid & (recs.n_occ > 0),
        n_unique=n_unique, n_valid_lanes=n_valid_lanes,
        insert_budget=insert_budget, fail_reduce=fail_reduce,
        dense_order="bfv" if (dense_mode == "bfv" or is_pallas) else "bvf",
        pallas_bin=pallas_bin,
    )


# ---------------------------------------------------------------------------
# Growth
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("new_capacity",))
def _rehash_bricks_once(state: BrickGridState, new_capacity: int):
    old_hi, old_lo = state.key_hi, state.key_lo
    occupied = old_hi != EMPTY_HI
    fresh = empty_key_rows(new_capacity)
    bucket, found, _, fill = bucket_lookup(fresh, old_hi, old_lo)
    plan = plan_insert(fresh, old_hi, old_lo, occupied & ~found, bucket, fill)
    key_rows = commit_insert(fresh, plan)
    slots = jnp.minimum(plan.slots, new_capacity)
    new_lo = jnp.zeros(
        (new_capacity, state.brick_volume), state.log_odds.dtype
    ).at[slots].set(state.log_odds, mode="drop")
    new_touched = jnp.zeros(
        (new_capacity, state.touched.shape[1]), jnp.uint32
    ).at[slots].set(state.touched, mode="drop")
    return (
        BrickGridState(
            key_rows=key_rows,
            log_odds=new_lo,
            touched=new_touched,
            min_bounds=state.min_bounds,
            max_bounds=state.max_bounds,
            used=state.used,
            poisoned=jnp.zeros((), bool),
        ),
        plan.overflowed,
    )


def rehash_bricks(state: BrickGridState, new_capacity: int) -> BrickGridState:
    """Host-triggered grow (clears ``poisoned`` for replay), doubling again
    until every existing bucket fits — grid/hash.rehash for brick tables."""
    while True:
        new_state, overflowed = _rehash_bricks_once(
            state, new_capacity=new_capacity
        )
        if not bool(overflowed):
            return new_state
        new_capacity *= 2


# ---------------------------------------------------------------------------
# Extraction (reference get_occupied_voxels / classified,
# 3d_mapper.py:127-188) — brick-level device compaction, O(occupied bricks)
# transfer, exact float64 per-voxel thresholds applied on the HOST over the
# pulled rows (no device-side threshold parity tricks needed).
# ---------------------------------------------------------------------------

@jax.jit
def _compact_bricks_by_class(key_rows, class_key):
    # (class, hi, lo) keys: selected bricks come out in CANONICAL
    # ascending-key order — extraction output is then deterministic across
    # table capacities/layouts, and the incremental host view
    # (BrickHostView, sorted by the same keys) reproduces it byte-for-byte
    hi = key_rows[:, :BUCKET_SLOTS].reshape(-1)
    lo = key_rows[:, BUCKET_SLOTS:].reshape(-1)
    counts = jnp.bincount(class_key, length=4)
    slot = jnp.arange(hi.shape[0], dtype=jnp.int32)
    _, s_hi, s_lo, s_slot = jax.lax.sort(
        (class_key.astype(jnp.uint32), hi, lo, slot), num_keys=3,
        is_stable=False,
    )
    return s_hi, s_lo, s_slot, counts


def _touched_bool(touched_rows: np.ndarray, vol: int) -> np.ndarray:
    """(N, words) uint32 -> (N, vol) bool."""
    n, words = touched_rows.shape
    per = min(32, vol)
    bits = (touched_rows[:, :, None] >> np.arange(per, dtype=np.uint32)) & 1
    return bits.astype(bool).reshape(n, words * per)[:, :vol]


def _pull_brick_rows(state: BrickGridState, sel_slots_sorted, n: int):
    """Transfer n compacted brick rows (+keys) to host, pow2-padded."""
    if n == 0:
        vol = state.brick_volume
        return (
            np.empty((0,), np.uint32), np.empty((0,), np.uint32),
            np.empty((0, vol)), np.empty((0, state.touched.shape[1]), np.uint32),
        )
    n_pad = min(1 << (n - 1).bit_length(), sel_slots_sorted[0].shape[0])
    s_hi, s_lo, s_slot = sel_slots_sorted
    idx = s_slot[:n_pad]
    rows = state.log_odds[idx]
    touched = state.touched[idx]
    return (
        np.asarray(s_hi[:n_pad])[:n],
        np.asarray(s_lo[:n_pad])[:n],
        np.asarray(rows)[:n],
        np.asarray(touched)[:n],
    )


def _brick_voxel_points(
    hi: np.ndarray, lo: np.ndarray, vol: int, brick_bits: int,
    resolution: float,
) -> np.ndarray:
    """(N,) brick codes -> (N, vol, 3) float64 voxel centers."""
    base = np.asarray(
        unpack_brick_keys(jnp.asarray(hi), jnp.asarray(lo), brick_bits)
    )  # offsets decoded as 0 since the stored code has offset bits zero
    off = np.arange(vol, dtype=np.int32)
    b = 1 << brick_bits
    offs = np.stack(
        [off >> (2 * brick_bits), (off >> brick_bits) & (b - 1), off & (b - 1)],
        axis=-1,
    )
    keys = base[:, None, :] + offs[None, :, :]
    return (keys.astype(np.float64) + 0.5) * resolution


def extract_occupied_brick(
    state: BrickGridState, cfg: MapperConfig
) -> Tuple[np.ndarray, np.ndarray]:
    from sonar_3d_reconstruction_tpu.ops.logodds import probability_to_log_odds

    thr = probability_to_log_odds(cfg.min_probability, cfg)
    vol = state.brick_volume
    # conservative device prefilter (one f32 ulp low); exact f64 filter on host
    t = jnp.asarray(
        np.nextafter(np.asarray(thr, state.log_odds.dtype),
                     -np.inf), state.log_odds.dtype
    )
    tb = _touched_bool  # alias
    words = state.touched.shape[1]
    per = min(32, vol)
    bitw = (jnp.uint32(1) << jnp.arange(per, dtype=jnp.uint32))
    tbits = (
        state.touched[:, :, None] & bitw[None, None, :]
    ).astype(bool).reshape(state.capacity, words * per)[:, :vol]
    sel = jnp.any(tbits & (state.log_odds > t), axis=1)
    occupied_brick = state.key_hi != EMPTY_HI
    class_key = jnp.where(occupied_brick & sel, 0, 1).astype(jnp.int32)
    s_hi, s_lo, s_slot, counts = _compact_bricks_by_class(
        state.key_rows, class_key
    )
    n = int(counts[0])
    hi, lo, rows, touched = _pull_brick_rows(state, (s_hi, s_lo, s_slot), n)
    if n == 0:
        return np.empty((0, 3)), np.empty((0,))
    mask = tb(touched, vol) & (rows.astype(np.float64) > thr)
    points = _brick_voxel_points(hi, lo, vol, state.brick_bits,
                                 cfg.voxel_resolution)[mask]
    probs = 1.0 / (1.0 + np.exp(-rows.astype(np.float64)[mask]))
    return points.reshape(-1, 3), probs


def extract_classified_brick(
    state: BrickGridState, cfg: MapperConfig
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    vol = state.brick_volume
    class_key = jnp.where(state.key_hi != EMPTY_HI, 0, 1).astype(jnp.int32)
    s_hi, s_lo, s_slot, counts = _compact_bricks_by_class(
        state.key_rows, class_key
    )
    n = int(counts[0])
    hi, lo, rows, touched = _pull_brick_rows(state, (s_hi, s_lo, s_slot), n)
    free_thr = np.log(0.3 / 0.7)
    occ_thr = np.log(cfg.min_probability / (1.0 - cfg.min_probability))
    out = {}
    if n == 0:
        for k in ("free", "occupied", "unknown"):
            out[k] = (np.empty((0, 3)), np.empty((0,)))
        return out
    tmask = _touched_bool(touched, vol)
    lo_v = rows.astype(np.float64)
    points = _brick_voxel_points(hi, lo, vol, state.brick_bits,
                                 cfg.voxel_resolution)
    free_m = tmask & (lo_v < free_thr)
    occ_m = tmask & ~free_m & (lo_v > occ_thr)
    unk_m = tmask & ~free_m & ~occ_m
    for name, m in (("free", free_m), ("occupied", occ_m), ("unknown", unk_m)):
        out[name] = (
            points[m].reshape(-1, 3),
            1.0 / (1.0 + np.exp(-lo_v[m])),
        )
    return out


def touched_voxels_brick(
    state: BrickGridState,
) -> Tuple[np.ndarray, np.ndarray]:
    """((N, 3) int32 voxel keys, (N,) log-odds) of every TOUCHED voxel —
    the layout-independent view io/checkpoint.py snapshots (same content
    as grid/hash's occupied-slot dump)."""
    vol = state.brick_volume
    class_key = jnp.where(state.key_hi != EMPTY_HI, 0, 1).astype(jnp.int32)
    s_hi, s_lo, s_slot, counts = _compact_bricks_by_class(
        state.key_rows, class_key
    )
    n = int(counts[0])
    hi, lo, rows, touched = _pull_brick_rows(state, (s_hi, s_lo, s_slot), n)
    if n == 0:
        # keep the state's value dtype so an empty float64 map round-trips
        # through io/checkpoint.py without silently becoming float32
        return np.empty((0, 3), np.int32), np.empty((0,), rows.dtype)
    mask = _touched_bool(touched, vol)
    base = np.asarray(
        unpack_brick_keys(jnp.asarray(hi), jnp.asarray(lo), state.brick_bits)
    )
    b = 1 << state.brick_bits
    off = np.arange(vol, dtype=np.int32)
    offs = np.stack(
        [off >> (2 * state.brick_bits), (off >> state.brick_bits) & (b - 1),
         off & (b - 1)], axis=-1,
    )
    keys = (base[:, None, :] + offs[None, :, :])[mask]
    return keys.astype(np.int32), rows[mask]


def load_voxels_brick(
    keys: np.ndarray,
    log_odds: np.ndarray,
    capacity: Optional[int] = None,
    dtype=jnp.float32,
    brick_bits: int = DEFAULT_BRICK_BITS,
) -> BrickGridState:
    """Build a BrickGridState holding the given voxel set (io/checkpoint.py
    restore path; bounds are set by the caller).  ``keys`` must be unique."""
    keys = np.asarray(keys, np.int32).reshape(-1, 3)
    n = len(keys)
    bb = brick_bits
    vol = 1 << (3 * bb)

    hi, lo, in_range = pack_brick_keys(jnp.asarray(keys), bb)
    assert n == 0 or bool(jnp.all(in_range)), "keys out of packable range"
    brick_mask, o = _masks(bb)
    b_lo = lo & brick_mask
    offset = ((lo >> 4) & jnp.uint32((1 << o) - 1)).astype(jnp.int32)

    # one insert per distinct brick: flag each brick code's first occurrence
    # (host-side — restore is a host operation)
    codes = (
        np.asarray(hi).astype(np.int64) << 32
    ) | np.asarray(b_lo).astype(np.int64)
    _, first = np.unique(codes, return_index=True)
    n_bricks = len(first)
    first_mask = np.zeros((n,), bool)
    first_mask[first] = True
    if capacity is None:
        capacity = 1 << 10
        while capacity < 4 * max(1, n_bricks):
            capacity *= 2

    from sonar_3d_reconstruction_tpu.grid.hash import insert_unique

    while True:
        state = init_brick_grid(capacity, dtype, brick_bits=bb)
        bucket, found, _, fill = bucket_lookup(state.key_rows, hi, b_lo)
        key_rows, _, overflowed, _ = insert_unique(
            state.key_rows, hi, b_lo, jnp.asarray(first_mask) & ~found,
            bucket, fill,
        )
        if not bool(overflowed):
            break
        capacity *= 2

    # resolve every voxel's slot against the committed table
    _, found2, slot2, _ = bucket_lookup(key_rows, hi, b_lo)
    assert n == 0 or bool(jnp.all(found2))
    log = jnp.zeros((capacity * vol,), dtype).at[
        slot2 * vol + offset
    ].set(jnp.asarray(log_odds, dtype), mode="drop").reshape(capacity, vol)
    words = max(1, vol // 32)
    tb = np.zeros((capacity, words), np.uint32)
    slot_np = np.asarray(slot2)
    off_np = np.asarray(offset)
    np.bitwise_or.at(
        tb, (slot_np, off_np // 32),
        np.uint32(1) << (off_np % 32).astype(np.uint32),
    )
    return state._replace(
        key_rows=key_rows,
        log_odds=log,
        touched=jnp.asarray(tb),
        used=jnp.asarray(n, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Incremental publish extraction (VERDICT r4 item 4).
#
# The full-table extraction above is O(capacity) on device and O(occupied)
# across the host link EVERY tick (measured 356-402 ms at a 515k-voxel
# survey through the tunnel — PERFORMANCE.md round-4 table), which strains
# the reference's 10 Hz publish contract (3d_mapper_node.py:227-231) as
# maps grow.  The incremental path keeps a HOST-side view of the published
# map and per tick pulls only bricks inside the DIRTY REGION — the union
# of the chunk pose boxes mapped since the last tick.  Every candidate
# emission lies within max_range of its ping's sonar origin (the same
# host-provable coverage guarantee the compact box-key engine is built
# on, ops/packing.py), so the pose-derived boxes are a proven superset of
# the touched bricks: the pull is conservative, the content exact, and —
# crucially — NO compiled engine program changes (the warm capture
# family is untouched; dirty tracking is pure host bookkeeping).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("brick_bits",))
def _select_bricks_in_boxes(key_rows, box_lo, box_hi, *, brick_bits):
    """Class-compact the occupied bricks whose corner key lies in ANY of
    the (K, 3) inclusive [box_lo, box_hi] bounds (pre-expanded by the
    caller so corner-containment covers brick overlap)."""
    hi = key_rows[:, :BUCKET_SLOTS].reshape(-1)
    lo = key_rows[:, BUCKET_SLOTS:].reshape(-1)
    occ = hi != EMPTY_HI
    corner = unpack_brick_keys(hi, lo, brick_bits)  # garbage on empty slots
    inb = jnp.any(
        jnp.all(
            (corner[:, None, :] >= box_lo[None])
            & (corner[:, None, :] <= box_hi[None]),
            axis=-1,
        ),
        axis=-1,
    )
    class_key = jnp.where(occ & inb, 0, 1).astype(jnp.int32)
    return _compact_bricks_by_class(key_rows, class_key)


def pull_bricks_in_boxes(state: BrickGridState, boxes):
    """Pull the rows of every brick intersecting any box to the host.

    ``boxes``: (K, 2, 3) int32 — per box inclusive [lo, hi] VOXEL-key
    bounds.  K is padded to a power of two with never-matching boxes so
    tick-to-tick K variation reuses a handful of compiled programs.
    Returns host ``(hi, lo, rows, touched)`` (empty arrays for K=0).
    """
    boxes = np.asarray(boxes, np.int32).reshape(-1, 2, 3)
    K = len(boxes)
    if K == 0:
        vol = state.brick_volume
        return (
            np.empty((0,), np.uint32), np.empty((0,), np.uint32),
            np.empty((0, vol)), np.empty((0, state.touched.shape[1]),
                                         np.uint32),
        )
    brick = 1 << state.brick_bits
    lo_b = boxes[:, 0] - (brick - 1)  # corner-containment covers overlap
    hi_b = boxes[:, 1].copy()
    Kp = 1 << (K - 1).bit_length()
    if Kp != K:
        pad_lo = np.ones((Kp - K, 3), np.int32)
        pad_hi = np.zeros((Kp - K, 3), np.int32)  # lo > hi: never matches
        lo_b = np.concatenate([lo_b, pad_lo])
        hi_b = np.concatenate([hi_b, pad_hi])
    s_hi, s_lo, s_slot, counts = _select_bricks_in_boxes(
        state.key_rows, jnp.asarray(lo_b), jnp.asarray(hi_b),
        brick_bits=state.brick_bits,
    )
    n = int(counts[0])
    return _pull_brick_rows(state, (s_hi, s_lo, s_slot), n)


def pull_all_touched_bricks(state: BrickGridState):
    """Pull every occupied brick's rows to the host (the incremental
    view's initial seed; also a checkpoint-resume reseed)."""
    class_key = jnp.where(state.key_hi != EMPTY_HI, 0, 1).astype(jnp.int32)
    sel = _compact_bricks_by_class(state.key_rows, class_key)
    n = int(sel[3][0])
    return _pull_brick_rows(state, sel[:3], n)


class BrickHostView:
    """Host-side copy of the published map, merged incrementally from
    pulled brick rows and extracted with the exact float64 math of
    extract_occupied_brick (same point ORDER too: bricks ascend by
    (hi, lo) — the device class sort's order — and voxels by offset, so
    the serialized PointCloud2 is byte-identical to the full path's).

    Storage is ARRAY-based (append-only rows + a key->row dict index),
    so a steady-state tick costs one vectorized row assignment for the
    re-pulled bricks, a small append for new ones, and a cached-order
    vectorized extraction — the first array-of-dict implementation
    rebuilt every array per tick and its Python-loop cost exceeded the
    full O(capacity) extraction at survey scale (r5f measurement)."""

    def __init__(self):
        self._index = {}  # (hi, lo) -> row into the arrays below
        self._hi = np.empty((0,), np.uint32)
        self._lo = np.empty((0,), np.uint32)
        self._rows = None      # (N, vol)
        self._touched = None   # (N, words) uint32
        self._centers = None   # (N, vol, 3) float64 voxel centers (cached)
        self._order = None     # cached argsort by (hi, lo)

    def __len__(self):
        return len(self._index)

    def merge(self, hi, lo, rows, touched) -> None:
        hi = np.asarray(hi, np.uint32)
        lo = np.asarray(lo, np.uint32)
        rows = np.asarray(rows)
        touched = np.asarray(touched, np.uint32)
        if len(hi) == 0:
            return
        idx = np.fromiter(
            (self._index.get(k, -1) for k in zip(hi.tolist(), lo.tolist())),
            np.int64, count=len(hi),
        )
        old = idx >= 0
        if old.any() and self._rows is not None:
            self._rows[idx[old]] = rows[old]
            self._touched[idx[old]] = touched[old]
        new = ~old
        if new.any():
            base = len(self._hi)
            nh, nl = hi[new], lo[new]
            for j, k in enumerate(zip(nh.tolist(), nl.tolist())):
                self._index[k] = base + j
            self._hi = np.concatenate([self._hi, nh])
            self._lo = np.concatenate([self._lo, nl])
            nr, nt = rows[new], touched[new]
            self._rows = (
                nr.copy() if self._rows is None
                else np.concatenate([self._rows, nr])
            )
            self._touched = (
                nt.copy() if self._touched is None
                else np.concatenate([self._touched, nt])
            )
            self._order = None

    def extract_occupied(self, cfg: MapperConfig, brick_bits: int):
        from sonar_3d_reconstruction_tpu.ops.logodds import (
            probability_to_log_odds,
        )

        if not self._index:
            return np.empty((0, 3)), np.empty((0,))
        # centers depend only on keys and the arrays are append-only:
        # compute just the new tail (the first call computes everything)
        n = len(self._hi)
        done = 0 if self._centers is None else len(self._centers)
        if done < n:
            nc = _brick_voxel_points(
                self._hi[done:], self._lo[done:], self._rows.shape[1],
                brick_bits, cfg.voxel_resolution,
            )
            self._centers = (
                nc if self._centers is None
                else np.concatenate([self._centers, nc])
            )
        if self._order is None:
            self._order = np.lexsort((self._lo, self._hi))
        o = self._order
        rows = self._rows[o]
        vol = rows.shape[1]
        thr = probability_to_log_odds(cfg.min_probability, cfg)
        mask = (
            _touched_bool(self._touched[o], vol)
            & (rows.astype(np.float64) > thr)
        )
        points = self._centers[o][mask]
        probs = 1.0 / (1.0 + np.exp(-rows.astype(np.float64)[mask]))
        return points.reshape(-1, 3), probs


# ---------------------------------------------------------------------------
# Point queries (reference SimpleOctree.get_log_odds / get_probability)
# ---------------------------------------------------------------------------

def query_log_odds_brick(
    state: BrickGridState, points, cfg: MapperConfig
) -> np.ndarray:
    """Batched (N, 3) world coords -> (N,) log-odds; 0.0 where never updated.
    Host float64 quantization (see grid/hash.query_log_odds rationale)."""
    pts = np.asarray(points, np.float64).reshape(-1, 3)
    keys = jnp.asarray(
        np.clip(
            np.floor(pts / cfg.voxel_resolution), -(2**30), 2**30
        ).astype(np.int32)
    )
    bb = state.brick_bits
    vol = state.brick_volume
    hi, lo, in_range = pack_brick_keys(keys, bb)
    brick_mask, o = _masks(bb)
    b_lo = lo & brick_mask
    offset = ((lo >> 4) & jnp.uint32((1 << o) - 1)).astype(jnp.int32)
    _, found, found_slot, _ = bucket_lookup(state.key_rows, hi, b_lo)
    slot = jnp.minimum(found_slot, state.capacity - 1)
    vals = state.log_odds[slot, offset]
    word = state.touched[slot, offset // 32]
    bit = (word >> (offset % 32).astype(jnp.uint32)) & 1
    hit = found & in_range & (bit == 1)
    zero = jnp.zeros((), state.log_odds.dtype)
    return np.asarray(jnp.where(hit, vals, zero))


def query_probability_brick(
    state: BrickGridState, points, cfg: MapperConfig
) -> np.ndarray:
    lo = query_log_odds_brick(state, points, cfg).astype(np.float64)
    return 1.0 / (1.0 + np.exp(-lo))
