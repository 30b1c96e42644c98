"""Multi-chip spatial sharding of the hashed voxel map (shard_map over ICI).

Design (SURVEY.md section 5.8; a design choice, not a port — the reference is
a single Python process over DDS with zero parallelism):

  * Mesh axis ``"space"``: the hash table is split into S independent
    bucketized sub-tables (grid/hash.py layout), one per device.  A voxel
    key's OWNER shard is a hash of its packed code mod S — independent of
    the in-shard bucket bits — so each shard resolves its keys entirely
    locally.
  * Within-ping data parallelism: backprojection + key packing are ordinary
    jit regions — GSPMD partitions them over the same mesh; the packed
    candidate stream is then all-gathered (XLA inserts the collective,
    riding ICI) so each shard can filter the candidates it owns and run the
    sort-dedup + bucket-table update (ops/dedup.py + grid/hash.py) on its
    local block.
  * Per-frame update semantics are identical to the single-chip path:
    ownership partitions the candidate set BEFORE dedup, so every per-voxel
    aggregate is computed entirely on the owner shard and sharded /
    single-chip maps hold identical log-odds.
  * Frame atomicity: if ANY shard overflows (unique budget or a bucket) the
    frame is rejected on EVERY shard (one psum over ICI decides before any
    write lands), so the host can grow all sub-tables and replay exactly as
    single-chip.

Frame ordering (the adaptive update reads pre-frame state, so pings are a
strict sequential scan) is preserved: steps chain over pings, parallelism is
within a ping.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.grid.hash import (
    DEFAULT_UNIQUE_BUDGET,
    HashGridState,
    apply_unique_records,
    voxel_keys,
)
from sonar_3d_reconstruction_tpu.ops.backproject import (
    FanTables,
    backproject_ping,
)
from sonar_3d_reconstruction_tpu.ops.dedup import dedup_frame
from sonar_3d_reconstruction_tpu.ops.packing import (
    EMPTY_HI,
    mix2,
    pack_keys,
    unpack_keys,
)


class ShardedHashState(NamedTuple):
    """Map state pytree; leading axis S is sharded over mesh axis "space"."""

    key_hi: jnp.ndarray     # (S, C_local) uint32, EMPTY_HI = free
    key_lo: jnp.ndarray     # (S, C_local) uint32
    log_odds: jnp.ndarray   # (S, C_local)
    used: jnp.ndarray       # (S,) int32 occupied slots per shard
    poisoned: jnp.ndarray   # (S,) bool

    @property
    def keys(self) -> jnp.ndarray:
        """(S, C, 3) int32 unpacked view; empty slots read as EMPTY rows."""
        from sonar_3d_reconstruction_tpu.grid.hash import EMPTY

        k = unpack_keys(self.key_hi, self.key_lo)
        return jnp.where((self.key_hi == EMPTY_HI)[..., None], EMPTY, k)


def make_mesh(devices=None, axis_name: str = "space") -> Mesh:
    """1D device mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def init_sharded_hash_grid(
    mesh: Mesh, local_capacity: int = 1 << 17, dtype=jnp.float32
) -> ShardedHashState:
    assert local_capacity & (local_capacity - 1) == 0
    S = mesh.devices.size
    sh = NamedSharding(mesh, P("space"))
    return ShardedHashState(
        key_hi=jax.device_put(
            jnp.full((S, local_capacity), EMPTY_HI, jnp.uint32), sh
        ),
        key_lo=jax.device_put(
            jnp.full((S, local_capacity), EMPTY_HI, jnp.uint32), sh
        ),
        log_odds=jax.device_put(jnp.zeros((S, local_capacity), dtype), sh),
        used=jax.device_put(jnp.zeros((S,), jnp.int32), sh),
        poisoned=jax.device_put(jnp.zeros((S,), bool), sh),
    )


def owner_shard(hi: jnp.ndarray, lo: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Packed codes -> owner shard in [0, n_shards). Uses mix2 with swapped
    words so owner bits are independent of the in-shard bucket bits."""
    return (mix2(lo, hi) % jnp.uint32(n_shards)).astype(jnp.int32)


def _local_update(
    state_blk, hi, lo, occ, valid, range_fail, *, cfg, axis_name, unique_budget
):
    """Per-shard body: dedup the candidates this shard owns, update the
    local sub-table.  state_blk leaves have leading length-1 shard axis;
    candidates arrive fully replicated."""
    my = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)
    active = valid & (owner_shard(hi, lo, n_shards) == my)

    rec = dedup_frame(hi, lo, occ, active, unique_budget)
    dtype = state_blk.log_odds.dtype
    zero3 = jnp.zeros((3,), dtype)
    local = HashGridState(
        key_hi=state_blk.key_hi[0],
        key_lo=state_blk.key_lo[0],
        log_odds=state_blk.log_odds[0],
        min_bounds=zero3,
        max_bounds=zero3,
        used=state_blk.used[0],
        poisoned=state_blk.poisoned[0],
    )
    applied, stats, overflowed = apply_unique_records(local, rec, cfg)

    my_failed = overflowed | range_fail | state_blk.poisoned[0]
    # frame atomicity: one psum decides accept/reject for every shard
    any_failed = jax.lax.psum(my_failed.astype(jnp.int32), axis_name) > 0

    applied_blk = ShardedHashState(
        key_hi=applied.key_hi[None],
        key_lo=applied.key_lo[None],
        log_odds=applied.log_odds[None],
        used=applied.used[None],
        poisoned=state_blk.poisoned,
    )
    rejected = state_blk._replace(poisoned=jnp.ones((1,), bool))
    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(any_failed, a, b), rejected, applied_blk
    )

    zero = jnp.zeros((), jnp.int32)
    out_stats = {
        "num_occupied": jax.lax.psum(
            jnp.where(any_failed, zero, stats["num_occupied"]), axis_name
        ),
        "num_free": jax.lax.psum(
            jnp.where(any_failed, zero, stats["num_free"]), axis_name
        ),
        "num_candidates": jax.lax.psum(
            jnp.where(any_failed, zero, jnp.sum(active).astype(jnp.int32)),
            axis_name,
        ),
        "overflowed": any_failed,
        "unique_overflow": jax.lax.psum(
            rec.overflowed.astype(jnp.int32), axis_name
        ) > 0,
        "range_fail": range_fail,
    }
    return new_state, out_stats


def _state_specs(axis_name: str) -> ShardedHashState:
    return ShardedHashState(
        P(axis_name), P(axis_name), P(axis_name), P(axis_name), P(axis_name)
    )


def make_sharded_ping_step(
    mesh: Mesh,
    tables: FanTables,
    cfg: MapperConfig,
    dtype=jnp.float32,
    axis_name: str = "space",
    unique_budget: int = None,
):
    """Build the jitted sharded single-ping step:
    (state, image, T, frame_active) -> (state, stats)."""
    if unique_budget is None:
        from sonar_3d_reconstruction_tpu.grid.hash import default_unique_budget

        unique_budget = default_unique_budget(
            tables.candidates_per_ping(cfg.occupied_window)
        )

    update = shard_map(
        partial(
            _local_update,
            cfg=cfg,
            axis_name=axis_name,
            unique_budget=unique_budget,
        ),
        mesh=mesh,
        in_specs=(_state_specs(axis_name), P(), P(), P(), P(), P()),
        out_specs=(
            _state_specs(axis_name),
            {
                "num_occupied": P(),
                "num_free": P(),
                "num_candidates": P(),
                "overflowed": P(),
                "unique_overflow": P(),
                "range_fail": P(),
            },
        ),
        check_vma=False,
    )

    @jax.jit
    def step(state: ShardedHashState, image, T, frame_active):
        cand = backproject_ping(image, T, tables, cfg, dtype=dtype)
        # within-ping data parallelism: GSPMD splits the candidate tensor
        # over the mesh; the shard_map boundary all-gathers the packed
        # stream for ownership filtering (one all-gather per ping over ICI).
        pts = jax.lax.with_sharding_constraint(
            cand["points"], NamedSharding(mesh, P(axis_name))
        )
        keys = voxel_keys(pts, cfg.voxel_resolution)
        hi, lo, in_range = pack_keys(keys)
        valid = cand["valid"] & frame_active
        range_fail = jnp.any(valid & ~in_range)
        valid = valid & in_range
        return update(state, hi, lo, cand["is_occupied"], valid, range_fail)

    return step


def sharded_ping_step(
    state: ShardedHashState,
    image: jnp.ndarray,
    T: jnp.ndarray,
    mesh: Mesh,
    tables: FanTables,
    cfg: MapperConfig,
    dtype=jnp.float32,
):
    """One-shot convenience wrapper (builds + calls the jitted step)."""
    step = make_sharded_ping_step(mesh, tables, cfg, dtype)
    return step(state, image, T, jnp.asarray(True))


def make_scan_pings_sharded(
    mesh: Mesh,
    tables: FanTables,
    cfg: MapperConfig,
    dtype=jnp.float32,
    axis_name: str = "space",
    unique_budget: int = None,
):
    """Build the sharded sequence runner:
    (state, images (P,R,B), transforms (P,4,4), start) -> (state, stats).
    Frames with index < start are no-ops (growth replay, see pipeline.py).

    Host-driven step chain (see the design note in pipeline.py)."""
    step = make_sharded_ping_step(
        mesh, tables, cfg, dtype, axis_name, unique_budget
    )

    @jax.jit
    def indexed_step(state, images, transforms, idx, start):
        image = jax.lax.dynamic_index_in_dim(images, idx, 0, keepdims=False)
        T = jax.lax.dynamic_index_in_dim(transforms, idx, 0, keepdims=False)
        return step(state, image, T, idx >= start)

    def run(state, images, transforms, start):
        P_ = images.shape[0]
        images = jnp.asarray(images)
        transforms = jnp.asarray(transforms, dtype)
        start = jnp.asarray(start, jnp.int32)
        per_step = []
        for i in range(P_):
            state, stats = indexed_step(
                state, images, transforms, jnp.int32(i), start
            )
            per_step.append(stats)
        stacked = {
            k: jnp.stack([s[k] for s in per_step])
            for k in (per_step[0] if per_step else {})
        }
        return state, stacked

    return run


def scan_pings_sharded(state, images, transforms, mesh, tables, cfg,
                       dtype=jnp.float32):
    """One-shot convenience wrapper over make_scan_pings_sharded."""
    scan = make_scan_pings_sharded(mesh, tables, cfg, dtype)
    return scan(state, images, transforms, jnp.int32(0))


def rehash_sharded(
    state: ShardedHashState, mesh: Mesh, new_local_capacity: int,
    axis_name: str = "space",
) -> ShardedHashState:
    """Host-triggered grow of every per-shard sub-table (the sharded
    equivalent of grid/hash.rehash): re-bucket each shard's entries into a
    larger local table — ownership is a function of the key, so entries
    never move between shards — and clear ``poisoned`` so the failed frame
    can be replayed.  Doubles again until every bucket fits."""
    from sonar_3d_reconstruction_tpu.grid.hash import bucket_lookup, insert_unique

    while True:
        def grow_block(blk):
            hi, lo, lod = blk.key_hi[0], blk.key_lo[0], blk.log_odds[0]
            occupied = hi != EMPTY_HI
            fresh_hi = jnp.full((new_local_capacity,), EMPTY_HI, jnp.uint32)
            fresh_lo = jnp.full((new_local_capacity,), EMPTY_HI, jnp.uint32)
            bucket, found, _, fill = bucket_lookup(fresh_hi, fresh_lo, hi, lo)
            nhi, nlo, slots, overflowed, n_ins = insert_unique(
                fresh_hi, fresh_lo, hi, lo, occupied & ~found, bucket, fill
            )
            nlod = jnp.zeros((new_local_capacity,), lod.dtype).at[slots].set(
                lod, mode="drop"
            )
            any_ovf = jax.lax.psum(overflowed.astype(jnp.int32), axis_name) > 0
            return (
                ShardedHashState(
                    key_hi=nhi[None],
                    key_lo=nlo[None],
                    log_odds=nlod[None],
                    used=n_ins[None],
                    poisoned=jnp.zeros((1,), bool),
                ),
                any_ovf,
            )

        grown, overflowed = jax.jit(
            shard_map(
                grow_block,
                mesh=mesh,
                in_specs=(_state_specs(axis_name),),
                out_specs=(_state_specs(axis_name), P()),
                check_vma=False,
            )
        )(state)
        if not bool(overflowed):
            return grown
        new_local_capacity *= 2


def gather_sharded_state(state: ShardedHashState):
    """Pull the sharded table to host as flat (keys (S*C,3), log_odds (S*C,))
    for extraction / checkpointing."""
    keys = np.asarray(state.keys).reshape(-1, 3)
    lo = np.asarray(state.log_odds).reshape(-1)
    return keys, lo
