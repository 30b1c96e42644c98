"""Open-addressing hashed sparse voxel grid (device-resident).

The TPU-native replacement for the reference's dict-based "SimpleOctree"
(scripts/3d_mapper.py:19-194, a defaultdict keyed by voxel index triples):
an open-addressing hash table held in device arrays —

  keys      (C, 3) int32   voxel index triples; EMPTY sentinel rows are free
  log_odds  (C,)   float   per-voxel log-odds

so the map supports the reference's dynamic expansion (unbounded world
coordinates) while every per-ping update stays a fixed-shape XLA program.

Insert protocol (claim-verify): candidates probe linearly from a spatial hash
of their key; a batch of candidates scatter-writes whole key ROWS into empty
slots (one scatter op, so concurrent claims of one slot have exactly one
winner), then re-reads the slot — if the winner holds OUR key (either we won
or a duplicate of us did), the slot is resolved; otherwise probing continues.
The probe loop is a fully-unrolled STATIC sequence of MAX_PROBES rounds (a
data-dependent while_loop is ~1000x slower on the TPU runtime, see the
MAX_PROBES note) at the load factors we maintain (<= 0.25).

Growth: static capacity with host-side rehash — when the load factor trips or
a frame overflows the probe budget, the host doubles capacity (a new jitted
re-insert program per power-of-two capacity) and replays the failed frame.
Frames after an overflow within one jitted scan are NOT applied (the state
carries a poisoned flag), so the host can always resume exactly at the first
failed frame.

Per-frame update semantics are identical to grid/dense.py (and the reference
3d_mapper.py:523-567): commuting scatter accumulation of sum/count/occupied-
priority, then an idempotent gather-compute-set finalize.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.grid.dense import voxel_keys
from sonar_3d_reconstruction_tpu.ops.logodds import finalize_voxel_updates

# Empty-slot sentinel. Voxel keys are floor(world/res) and bounded by
# max_range/res plus trajectory extent — never near int32 max.
EMPTY = np.int32(0x7FFFFFFF)

# Teschner et al. spatial hash primes (public-domain constant choice).
_P1, _P2, _P3 = np.uint32(73856093), np.uint32(19349663), np.uint32(83492791)

# STATIC probe budget per find-or-insert; beyond this the frame reports
# overflow and the host grows the table.  Deliberately small and fully
# unrolled: a data-dependent `lax.while_loop` costs ~46 ms PER ITERATION on
# the TPU runtime (host-synced trip count), while the same body unrolled runs
# at ~30 us — measured 186 ms -> 0.3 ms for one real ping.  At the load
# factors we maintain (<= 0.25, see models/mapper.py) linear-probe chains
# longer than 8 are vanishingly rare; when one occurs the host doubles
# capacity and replays the frame, exactly like a load-factor trip.
MAX_PROBES = 8


class HashGridState(NamedTuple):
    """Map state pytree. Capacity C is static per jitted program."""

    keys: jnp.ndarray       # (C, 3) int32, EMPTY rows free
    log_odds: jnp.ndarray   # (C,) dtype
    min_bounds: jnp.ndarray  # (3,)
    max_bounds: jnp.ndarray  # (3,)
    used: jnp.ndarray       # () int32 occupied slot count
    poisoned: jnp.ndarray   # () bool: a frame overflowed; later frames skipped


def init_hash_grid(capacity: int = 1 << 20, dtype=jnp.float32) -> HashGridState:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    big = jnp.asarray(jnp.inf, dtype)
    return HashGridState(
        keys=jnp.full((capacity, 3), EMPTY, jnp.int32),
        log_odds=jnp.zeros((capacity,), dtype),
        min_bounds=jnp.full((3,), big, dtype),
        max_bounds=jnp.full((3,), -big, dtype),
        used=jnp.zeros((), jnp.int32),
        poisoned=jnp.zeros((), bool),
    )


def _mix(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3-style 32-bit avalanche finalizer: the low bits (used as the
    slot index) must depend on every input bit — the raw prime-product XOR
    clusters badly for the spatially contiguous keys a real ping produces
    (measured: probe chains > 8 at 14% load without this)."""
    h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> 16)


def spatial_hash(keys: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """(N, 3) int32 voxel keys -> (N,) uint32 slot in [0, capacity)."""
    k = keys.astype(jnp.uint32)
    h = _mix((k[..., 0] * _P1) ^ (k[..., 1] * _P2) ^ (k[..., 2] * _P3))
    return h & jnp.uint32(capacity - 1)


def probe_stride(keys: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Odd per-key probe stride (double hashing). Any odd stride is coprime
    with the power-of-two capacity, so the probe sequence visits distinct
    slots; double hashing breaks the primary clustering of linear probing."""
    k = keys.astype(jnp.uint32)
    h = _mix((k[..., 0] * _P3) ^ (k[..., 1] * _P1) ^ (k[..., 2] * _P2))
    return ((h >> 15) | jnp.uint32(1)) & jnp.uint32(capacity - 1)


def find_or_insert(
    table_keys: jnp.ndarray, cand_keys: jnp.ndarray, active: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Resolve a slot for every active candidate key, inserting misses.

    Args:
      table_keys: (C, 3) int32 table (EMPTY rows free).
      cand_keys:  (N, 3) int32 candidate voxel keys (duplicates fine).
      active:     (N,) bool; inactive candidates resolve to the dump slot C.

    Returns (new_table_keys, slots (N,) int32 in [0, C], overflowed () bool).
    Slot C is the dump slot for inactive candidates; when ``overflowed`` is
    true some ACTIVE candidate exhausted MAX_PROBES and its slot is C too —
    callers must treat the whole frame as failed.
    """
    capacity = table_keys.shape[0]
    n = cand_keys.shape[0]
    h0 = spatial_hash(cand_keys, capacity).astype(jnp.int32)
    stride = probe_stride(cand_keys, capacity).astype(jnp.int32)
    dump = jnp.int32(capacity)

    tbl = table_keys
    slots = jnp.full((n,), dump, jnp.int32)
    pending = active
    for probe in range(MAX_PROBES):  # static unroll — see MAX_PROBES note
        slot = (h0 + probe * stride) & (capacity - 1)
        # claim empty slots for pending candidates (single row scatter ->
        # one winner per slot even with duplicate indices)
        cur = tbl[slot]  # (N, 3)
        is_empty = jnp.all(cur == EMPTY, axis=-1)
        claim_idx = jnp.where(pending & is_empty, slot, dump)
        tbl = tbl.at[claim_idx].set(cand_keys, mode="drop")
        # verify: do we own (or share) the slot now?
        now = tbl[slot]
        mine = jnp.all(now == cand_keys, axis=-1)
        resolved = pending & mine
        slots = jnp.where(resolved, slot, slots)
        pending = pending & ~mine
    return tbl, slots, jnp.any(pending)


def update_hash_grid(
    state: HashGridState,
    candidates: Dict[str, jnp.ndarray],
    cfg: MapperConfig,
) -> Tuple[HashGridState, Dict[str, jnp.ndarray]]:
    """Apply one ping's candidate emissions to the hashed map. Pure function.

    Mirrors grid.dense.update_dense_grid but with hash-slot addressing and
    dynamic insertion. If the frame overflows the probe budget (or the state
    is already poisoned), the input state is returned unchanged with
    ``poisoned`` set, so a host driver can grow capacity and replay.
    """
    dtype = state.log_odds.dtype
    capacity = state.keys.shape[0]
    pts = candidates["points"]
    lo = candidates["log_odds"].astype(dtype)
    occ = candidates["is_occupied"]
    valid = candidates["valid"]

    keys = voxel_keys(pts, cfg.voxel_resolution)
    new_table, slots, overflowed = find_or_insert(state.keys, keys, valid)
    failed = jnp.logical_or(overflowed, state.poisoned)

    ok = valid  # all valid candidates resolved when not failed
    dump = jnp.int32(capacity)
    lin = jnp.where(ok, slots, dump)

    # --- pass 1: commuting per-frame accumulation
    lo_sum = jnp.zeros((capacity,), dtype).at[lin].add(
        jnp.where(ok, lo, 0), mode="drop"
    )
    count = jnp.zeros((capacity,), dtype).at[lin].add(
        jnp.where(ok, jnp.ones((), dtype), 0), mode="drop"
    )
    occ_vox = jnp.zeros((capacity,), jnp.int32).at[lin].max(
        (ok & occ).astype(jnp.int32), mode="drop"
    )

    # --- pass 2: idempotent finalize
    safe = jnp.minimum(lin, capacity - 1)
    cur = state.log_odds[safe]
    new_val = finalize_voxel_updates(
        cur, lo_sum[safe], count[safe], occ_vox[safe] > 0, cfg
    )
    new_lo = state.log_odds.at[lin].set(jnp.where(ok, new_val, 0), mode="drop")

    # --- bounds over updated voxel centers (reference 3d_mapper.py:112-115)
    centers = (keys.astype(dtype) + 0.5) * cfg.voxel_resolution
    inf = jnp.asarray(jnp.inf, dtype)
    cmin = jnp.min(jnp.where(ok[:, None], centers, inf), axis=0)
    cmax = jnp.max(jnp.where(ok[:, None], centers, -inf), axis=0)

    used = jnp.sum(new_table[:, 0] != EMPTY).astype(jnp.int32)

    applied = HashGridState(
        keys=new_table,
        log_odds=new_lo,
        min_bounds=jnp.minimum(state.min_bounds, cmin),
        max_bounds=jnp.maximum(state.max_bounds, cmax),
        used=used,
        poisoned=state.poisoned,
    )
    poisoned_state = state._replace(poisoned=jnp.ones((), bool))
    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(failed, a, b), poisoned_state, applied
    )

    inv = jnp.where(ok, 1.0 / jnp.maximum(count[safe], 1), 0.0)
    occ_frac = (occ_vox[safe] > 0).astype(inv.dtype)
    zero = jnp.zeros((), jnp.int32)
    stats = {
        "num_occupied": jnp.where(
            failed, zero, jnp.round(jnp.sum(inv * occ_frac)).astype(jnp.int32)
        ),
        "num_free": jnp.where(
            failed, zero, jnp.round(jnp.sum(inv * (1 - occ_frac))).astype(jnp.int32)
        ),
        "num_candidates": jnp.where(failed, zero, jnp.sum(ok).astype(jnp.int32)),
        "overflowed": failed,
    }
    return new_state, stats


@partial(jax.jit, static_argnames=("new_capacity",))
def _rehash_once(state: HashGridState, new_capacity: int):
    """Re-insert every occupied slot into a new table of the given capacity.
    Returns (state, overflowed); on overflow the result table is invalid."""
    occupied = state.keys[:, 0] != EMPTY
    new_keys = jnp.full((new_capacity, 3), EMPTY, jnp.int32)
    # inactive rows carry EMPTY keys; route them to the dump slot
    tbl, slots, overflowed = find_or_insert(new_keys, state.keys, occupied)
    lin = jnp.where(occupied, slots, jnp.int32(new_capacity))
    new_lo = jnp.zeros((new_capacity,), state.log_odds.dtype).at[lin].set(
        state.log_odds, mode="drop"
    )
    return (
        HashGridState(
            keys=tbl,
            log_odds=new_lo,
            min_bounds=state.min_bounds,
            max_bounds=state.max_bounds,
            used=state.used,
            poisoned=jnp.zeros((), bool),
        ),
        overflowed,
    )


def rehash(state: HashGridState, new_capacity: int) -> HashGridState:
    """Host-triggered grow: re-insert into a larger table, clearing
    ``poisoned`` so the failed frame can be replayed.  In the (rare) event a
    unique existing key still exhausts the static probe budget, capacity
    doubles again until the rehash fits."""
    while True:
        new_state, overflowed = _rehash_once(state, new_capacity=new_capacity)
        if not bool(overflowed):
            return new_state
        new_capacity *= 2


# ---------------------------------------------------------------------------
# Host-side extraction (reference get_occupied_voxels / classified,
# 3d_mapper.py:127-188)
# ---------------------------------------------------------------------------

def extract_occupied_hash(
    state: HashGridState, cfg: MapperConfig
) -> Tuple[np.ndarray, np.ndarray]:
    from sonar_3d_reconstruction_tpu.ops.logodds import probability_to_log_odds

    thr = probability_to_log_odds(cfg.min_probability, cfg)
    keys = np.asarray(state.keys)
    lo = np.asarray(state.log_odds)
    mask = (keys[:, 0] != EMPTY) & (lo > thr)
    points = (keys[mask].astype(np.float64) + 0.5) * cfg.voxel_resolution
    probs = 1.0 / (1.0 + np.exp(-lo[mask].astype(np.float64)))
    return points, probs


def extract_classified_hash(
    state: HashGridState, cfg: MapperConfig
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    keys = np.asarray(state.keys)
    lo = np.asarray(state.log_odds)
    touched = keys[:, 0] != EMPTY
    free_thr = np.log(0.3 / 0.7)
    occ_thr = np.log(cfg.min_probability / (1.0 - cfg.min_probability))
    masks = {
        "free": touched & (lo < free_thr),
        "occupied": touched & (lo > occ_thr),
        "unknown": touched & (lo >= free_thr) & (lo <= occ_thr),
    }
    out = {}
    for name, m in masks.items():
        points = (keys[m].astype(np.float64) + 0.5) * cfg.voxel_resolution
        probs = 1.0 / (1.0 + np.exp(-lo[m].astype(np.float64)))
        out[name] = (points, probs)
    return out
