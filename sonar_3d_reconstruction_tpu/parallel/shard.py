"""Multi-chip spatial sharding of the hashed voxel map (shard_map over ICI).

Design (SURVEY.md section 5.8; a design choice, not a port — the reference is
a single Python process over DDS with zero parallelism):

  * Mesh axis ``"space"``: the hash table is split into S independent
    open-addressing sub-tables, one per device.  A voxel key's OWNER shard is
    a second spatial hash mod S (independent of the in-shard slot hash), so
    linear probing never crosses a shard boundary.
  * Within-ping data parallelism: backprojection of the candidate tensor is an
    ordinary jit region — GSPMD partitions it over the same mesh; the
    candidate set is then all-gathered (XLA inserts the collective, riding
    ICI) so each shard can filter candidates it owns and scatter them into
    its local table block.
  * Per-frame update semantics are identical to the single-chip path
    (grid/hash.py): ownership partitions the candidate set, every per-voxel
    aggregate (sum / count / occupied-priority) is computed entirely on the
    owner shard, so sharded and single-chip maps hold identical log-odds.
  * Frame atomicity: if ANY shard overflows its probe budget the frame is
    rejected on EVERY shard (one psum over ICI decides before any write), so
    the host can grow all sub-tables and replay exactly as single-chip.

Frame ordering (the adaptive update reads pre-frame state, so pings are a
strict sequential scan) is preserved: the scan is over pings, parallelism is
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
from sonar_3d_reconstruction_tpu.grid.dense import voxel_keys
from sonar_3d_reconstruction_tpu.grid.hash import EMPTY, find_or_insert
from sonar_3d_reconstruction_tpu.ops.backproject import (
    FanTables,
    backproject_ping,
)
from sonar_3d_reconstruction_tpu.ops.logodds import finalize_voxel_updates

# Owner-shard hash primes — deliberately different from the in-shard slot
# primes (grid/hash.py) so owner and slot bits are uncorrelated.
_Q1, _Q2, _Q3 = np.uint32(2654435761), np.uint32(805459861), np.uint32(3674653429)


class ShardedHashState(NamedTuple):
    """Map state pytree; leading axis S is sharded over mesh axis "space"."""

    keys: jnp.ndarray       # (S, C_local, 3) int32, EMPTY rows free
    log_odds: jnp.ndarray   # (S, C_local)
    used: jnp.ndarray       # (S,) int32 occupied slots per shard
    poisoned: jnp.ndarray   # (S,) bool


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
        keys=jax.device_put(jnp.full((S, local_capacity, 3), EMPTY, jnp.int32), sh),
        log_odds=jax.device_put(jnp.zeros((S, local_capacity), dtype), sh),
        used=jax.device_put(jnp.zeros((S,), jnp.int32), sh),
        poisoned=jax.device_put(jnp.zeros((S,), bool), sh),
    )


def owner_shard(keys: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """(N, 3) int32 voxel keys -> (N,) int32 owner shard in [0, n_shards)."""
    k = keys.astype(jnp.uint32)
    h = (k[..., 0] * _Q1) ^ (k[..., 1] * _Q2) ^ (k[..., 2] * _Q3)
    return (h % jnp.uint32(n_shards)).astype(jnp.int32)


def _local_update(state_blk, cand_keys, lo, occ, valid, *, cfg, axis_name):
    """Per-shard body: filter owned candidates, update the local sub-table.

    state_blk leaves have leading length-1 shard axis (shard_map block);
    candidates arrive fully replicated (XLA all-gathers them over ICI).
    """
    keys_tbl = state_blk.keys[0]
    log_tbl = state_blk.log_odds[0]
    capacity = keys_tbl.shape[0]
    dtype = log_tbl.dtype

    my = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)
    active = valid & (owner_shard(cand_keys, n_shards) == my)

    new_table, slots, overflowed = find_or_insert(keys_tbl, cand_keys, active)
    my_failed = jnp.logical_or(overflowed, state_blk.poisoned[0])
    # frame atomicity: one psum decides accept/reject for every shard
    any_failed = jax.lax.psum(my_failed.astype(jnp.int32), axis_name) > 0

    dump = jnp.int32(capacity)
    lin = jnp.where(active, slots, dump)
    lo_sum = jnp.zeros((capacity,), dtype).at[lin].add(
        jnp.where(active, lo.astype(dtype), 0), mode="drop"
    )
    count = jnp.zeros((capacity,), dtype).at[lin].add(
        jnp.where(active, jnp.ones((), dtype), 0), mode="drop"
    )
    occ_vox = jnp.zeros((capacity,), jnp.int32).at[lin].max(
        (active & occ).astype(jnp.int32), mode="drop"
    )

    safe = jnp.minimum(lin, capacity - 1)
    new_val = finalize_voxel_updates(
        log_tbl[safe], lo_sum[safe], count[safe], occ_vox[safe] > 0, cfg
    )
    new_lo = log_tbl.at[lin].set(jnp.where(active, new_val, 0), mode="drop")
    used = jnp.sum(new_table[:, 0] != EMPTY).astype(jnp.int32)

    applied = ShardedHashState(
        keys=new_table[None],
        log_odds=new_lo[None],
        used=used[None],
        poisoned=state_blk.poisoned,
    )
    rejected = state_blk._replace(poisoned=jnp.ones((1,), bool))
    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(any_failed, a, b), rejected, applied
    )

    n_applied = jnp.where(any_failed, 0, jnp.sum(active).astype(jnp.int32))
    stats = {
        "num_candidates": jax.lax.psum(n_applied, axis_name),
        "overflowed": any_failed,
    }
    return new_state, stats


def _state_specs(axis_name: str) -> ShardedHashState:
    return ShardedHashState(
        P(axis_name), P(axis_name), P(axis_name), P(axis_name)
    )


def make_sharded_ping_step(
    mesh: Mesh,
    tables: FanTables,
    cfg: MapperConfig,
    dtype=jnp.float32,
    axis_name: str = "space",
):
    """Build the jitted sharded single-ping step:
    (state, image, T, frame_active) -> (state, stats)."""

    update = shard_map(
        partial(_local_update, cfg=cfg, axis_name=axis_name),
        mesh=mesh,
        in_specs=(_state_specs(axis_name), P(), P(), P(), P()),
        out_specs=(
            _state_specs(axis_name),
            {"num_candidates": P(), "overflowed": P()},
        ),
        check_vma=False,
    )

    @jax.jit
    def step(state: ShardedHashState, image, T, frame_active):
        cand = backproject_ping(image, T, tables, cfg, dtype=dtype)
        # within-ping data parallelism: GSPMD splits the candidate tensor over
        # the mesh; the shard_map boundary all-gathers it back for ownership
        # filtering (one all-gather per ping over ICI).
        pts = jax.lax.with_sharding_constraint(
            cand["points"], NamedSharding(mesh, P(axis_name))
        )
        cand_keys = voxel_keys(pts, cfg.voxel_resolution)
        valid = cand["valid"] & frame_active
        return update(state, cand_keys, cand["log_odds"], cand["is_occupied"], valid)

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
):
    """Build the jitted sharded sequence scan:
    (state, images (P,R,B), transforms (P,4,4), start) -> (state, stats).
    Frames with index < start are no-ops (growth replay, see pipeline.py)."""
    step = make_sharded_ping_step(mesh, tables, cfg, dtype, axis_name)

    @jax.jit
    def scan(state, images, transforms, start):
        def body(carry, inp):
            idx, image, T = inp
            return step(carry, image, T, idx >= start)

        idxs = jnp.arange(images.shape[0], dtype=jnp.int32)
        return jax.lax.scan(body, state, (idxs, images, transforms))

    return scan


def scan_pings_sharded(state, images, transforms, mesh, tables, cfg,
                       dtype=jnp.float32):
    """One-shot convenience wrapper over make_scan_pings_sharded."""
    scan = make_scan_pings_sharded(mesh, tables, cfg, dtype)
    return scan(state, images, transforms, jnp.int32(0))


def gather_sharded_state(state: ShardedHashState):
    """Pull the sharded table to host as flat (keys (S*C,3), log_odds (S*C,))
    for extraction / checkpointing."""
    keys = np.asarray(state.keys).reshape(-1, 3)
    lo = np.asarray(state.log_odds).reshape(-1)
    return keys, lo
