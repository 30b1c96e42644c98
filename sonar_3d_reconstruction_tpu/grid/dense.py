"""Dense bounded voxel grid map state.

The validation-first map backend (SURVEY.md section 7 stage 3): a bounded
axis-aligned grid of per-voxel log-odds, updated per ping with the reference's
per-frame dedup/average semantics (scripts/3d_mapper.py:523-567) — but without
any sort.  The update is three scatter passes over the candidate set:

  1. scatter-ADD candidate log-odds and counts, scatter-MAX the occupied flag,
     into per-frame accumulator grids (all updates commute);
  2. gather (sum, count, occupied, current) back at every candidate position,
     compute the averaged + adaptive + clamped new value, and scatter-SET it —
     duplicates all compute the identical value from identical per-voxel
     aggregates, so the write is idempotent and order-free;
  3. per-frame accumulators are fresh zeros each ping (fused by XLA).

This replaces the reference's hash-map accumulation loop and its sequential
update_voxel sweep (SURVEY.md hot loop 5) with pure data-parallel scatters.

The dense grid exists for bounded-domain validation and as the multi-chip
reduce_scatter target; unbounded "dynamic expansion" capability lives in
grid/hash.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.ops.logodds import finalize_voxel_updates


@dataclasses.dataclass(frozen=True)
class DenseGridSpec:
    """Static grid geometry. ``origin_key`` is the integer voxel key
    (floor(world/resolution)) of grid cell (0,0,0)."""

    origin_key: Tuple[int, int, int]
    shape: Tuple[int, int, int]
    resolution: float

    @property
    def num_cells(self) -> int:
        x, y, z = self.shape
        return x * y * z

    @staticmethod
    def for_world_bounds(
        lo: Tuple[float, float, float],
        hi: Tuple[float, float, float],
        resolution: float,
    ) -> "DenseGridSpec":
        ok = tuple(int(math.floor(v / resolution)) for v in lo)
        hk = tuple(int(math.floor(v / resolution)) for v in hi)
        shape = tuple(h - o + 1 for o, h in zip(ok, hk))
        return DenseGridSpec(origin_key=ok, shape=shape, resolution=resolution)


class DenseGridState(NamedTuple):
    """Map state pytree carried through lax.scan over pings."""

    log_odds: jnp.ndarray   # (num_cells,) flattened
    touched: jnp.ndarray    # (num_cells,) bool — voxel exists in the reference dict
    min_bounds: jnp.ndarray  # (3,) running min over updated points (3d_mapper.py:112-115)
    max_bounds: jnp.ndarray  # (3,)
    overflow: jnp.ndarray   # () int32 count of candidates outside the grid


def init_dense_grid(spec: DenseGridSpec, dtype=jnp.float32) -> DenseGridState:
    n = spec.num_cells
    big = jnp.asarray(jnp.inf, dtype)
    return DenseGridState(
        log_odds=jnp.zeros((n,), dtype),
        touched=jnp.zeros((n,), bool),
        min_bounds=jnp.full((3,), big, dtype),
        max_bounds=jnp.full((3,), -big, dtype),
        overflow=jnp.zeros((), jnp.int32),
    )


def voxel_keys(points: jnp.ndarray, resolution: float) -> jnp.ndarray:
    """floor(world / resolution) integer keys (reference 3d_mapper.py:63-66)."""
    return jnp.floor(points / resolution).astype(jnp.int32)


def linearize_keys(keys, spec: DenseGridSpec):
    """Integer voxel keys -> (in_bounds mask, linear cell index).

    The single implementation of the grid's key -> cell mapping, shared by
    the update scatter path and the point-query path (works on jnp or np
    arrays — both expose the same indexing ops)."""
    if isinstance(keys, np.ndarray):
        origin, shape = np.asarray(spec.origin_key), np.asarray(spec.shape)
    else:
        origin = jnp.asarray(spec.origin_key, jnp.int32)
        shape = jnp.asarray(spec.shape, jnp.int32)
    idx3 = keys - origin
    in_bounds = (idx3 >= 0).all(axis=-1) & (idx3 < shape).all(axis=-1)
    lin = (idx3[..., 0] * spec.shape[1] + idx3[..., 1]) * spec.shape[2]         + idx3[..., 2]
    return in_bounds, lin


def update_dense_grid(
    state: DenseGridState,
    candidates: Dict[str, jnp.ndarray],
    spec: DenseGridSpec,
    cfg: MapperConfig,
) -> Tuple[DenseGridState, Dict[str, jnp.ndarray]]:
    """Apply one ping's candidate emissions to the map.  Pure function.

    ``candidates`` is the dict produced by ops.backproject.backproject_ping.
    Returns (new_state, stats) with stats fields mirroring the reference
    process_sonar_image return (3d_mapper.py:587-595): num_occupied / num_free
    count UNIQUE voxels updated this frame by type.
    """
    dtype = state.log_odds.dtype
    pts = candidates["points"]
    lo = candidates["log_odds"].astype(dtype)
    occ = candidates["is_occupied"]
    valid = candidates["valid"]

    keys = voxel_keys(pts, spec.resolution)
    in_bounds, lin = linearize_keys(keys, spec)
    ok = valid & in_bounds

    n = spec.num_cells
    # route dropped candidates one-past-the-end; every scatter uses mode='drop'
    lin = jnp.where(ok, lin, n)

    # --- pass 1: commuting per-frame accumulation (sum / count / occ-priority)
    lo_sum = jnp.zeros((n,), dtype).at[lin].add(
        jnp.where(ok, lo, 0), mode="drop"
    )
    count = jnp.zeros((n,), dtype).at[lin].add(
        jnp.where(ok, jnp.ones((), dtype), 0), mode="drop"
    )
    occ_vox = jnp.zeros((n,), jnp.int32).at[lin].max(
        (ok & occ).astype(jnp.int32), mode="drop"
    )

    # --- pass 2: idempotent finalize at candidate positions
    safe = jnp.minimum(lin, n - 1)
    cur = state.log_odds[safe]
    new_val = finalize_voxel_updates(
        cur, lo_sum[safe], count[safe], occ_vox[safe] > 0, cfg
    )
    new_lo = state.log_odds.at[lin].set(
        jnp.where(ok, new_val, 0), mode="drop"
    )
    new_touched = state.touched.at[lin].set(ok, mode="drop") | state.touched

    # --- bounds over updated voxel CENTERS (the reference passes
    # key_to_world(key) into update_voxel; 3d_mapper.py:560, 112-115)
    centers = (keys.astype(dtype) + 0.5) * spec.resolution
    inf = jnp.asarray(jnp.inf, dtype)
    cmin = jnp.min(jnp.where(ok[:, None], centers, inf), axis=0)
    cmax = jnp.max(jnp.where(ok[:, None], centers, -inf), axis=0)

    new_state = DenseGridState(
        log_odds=new_lo,
        touched=new_touched,
        min_bounds=jnp.minimum(state.min_bounds, cmin),
        max_bounds=jnp.maximum(state.max_bounds, cmax),
        overflow=state.overflow + jnp.sum(valid & ~in_bounds).astype(jnp.int32),
    )

    # --- unique-voxel stats via the 1/count trick: each voxel's candidates
    # contribute count * (1/count) = 1 in total.
    inv = jnp.where(ok, 1.0 / jnp.maximum(count[safe], 1), 0.0)
    occ_frac = (occ_vox[safe] > 0).astype(inv.dtype)
    stats = {
        "num_occupied": jnp.round(jnp.sum(inv * occ_frac)).astype(jnp.int32),
        "num_free": jnp.round(jnp.sum(inv * (1 - occ_frac))).astype(jnp.int32),
        "num_candidates": jnp.sum(ok).astype(jnp.int32),
    }
    return new_state, stats


# ---------------------------------------------------------------------------
# Host-side extraction (low rate; reference 10 Hz publish path, SURVEY.md 3.3)
# ---------------------------------------------------------------------------

def extract_occupied(
    state: DenseGridState, spec: DenseGridSpec, cfg: MapperConfig
) -> Tuple[np.ndarray, np.ndarray]:
    """(points Nx3, probabilities N) for voxels with log-odds strictly above
    the min_probability threshold (reference 3d_mapper.py:127-153)."""
    from sonar_3d_reconstruction_tpu.ops.logodds import probability_to_log_odds

    thr = probability_to_log_odds(cfg.min_probability, cfg)
    lo = np.asarray(state.log_odds)
    touched = np.asarray(state.touched)
    mask = touched & (lo > thr)
    (flat_idx,) = np.nonzero(mask)
    keys = np.stack(np.unravel_index(flat_idx, spec.shape), axis=-1) + np.asarray(
        spec.origin_key
    )
    points = (keys.astype(np.float64) + 0.5) * spec.resolution
    probs = 1.0 / (1.0 + np.exp(-lo[flat_idx].astype(np.float64)))
    return points, probs


def extract_classified(
    state: DenseGridState, spec: DenseGridSpec, cfg: MapperConfig
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Three-way free/unknown/occupied split of touched voxels
    (reference 3d_mapper.py:155-188)."""
    lo = np.asarray(state.log_odds)
    touched = np.asarray(state.touched)
    free_thr = np.log(0.3 / 0.7)
    occ_thr = np.log(cfg.min_probability / (1.0 - cfg.min_probability))

    out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    # if/elif classification (reference 3d_mapper.py:169-176): mutually
    # exclusive even when min_probability < 0.3 puts occ_thr below free_thr
    free_m = touched & (lo < free_thr)
    occ_m = touched & ~free_m & (lo > occ_thr)
    masks = {
        "free": free_m,
        "occupied": occ_m,
        "unknown": touched & ~free_m & ~occ_m,
    }
    for name, m in masks.items():
        (flat_idx,) = np.nonzero(m)
        keys = np.stack(
            np.unravel_index(flat_idx, spec.shape), axis=-1
        ) + np.asarray(spec.origin_key)
        points = (keys.astype(np.float64) + 0.5) * spec.resolution
        probs = 1.0 / (1.0 + np.exp(-lo[flat_idx].astype(np.float64)))
        out[name] = (points, probs)
    return out


def query_probability_dense(
    state: DenseGridState, points, spec: DenseGridSpec, cfg
) -> np.ndarray:
    """Batched point query on the dense grid: (N, 3) world coords -> (N,)
    occupancy probabilities; untouched / out-of-bounds voxels answer 0.5
    (reference SimpleOctree.get_probability, 3d_mapper.py:122-126 — the
    dict's 0.0 log-odds default)."""
    pts = np.asarray(points, np.float64).reshape(-1, 3)
    keys = np.floor(pts / spec.resolution).astype(np.int64)
    in_b, lin = linearize_keys(keys, spec)
    lin = np.where(in_b, lin, 0)
    lo = np.asarray(state.log_odds).astype(np.float64)[lin]
    touched = np.asarray(state.touched)[lin]
    lo = np.where(in_b & touched, lo, 0.0)
    return 1.0 / (1.0 + np.exp(-lo))
