"""Map snapshot / restore (new capability vs the reference, SURVEY.md 5.4:
the reference map lives only in process memory).

Serializes the hash map state plus config to one ``.npz`` — cheap,
dependency-free, and enough for long bag replays to resume.  Keys are stored
UNPACKED ((N, 3) int32) so the snapshot format is independent of the
device-side table layout.
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.config import MapperConfig, config_from_dict
from sonar_3d_reconstruction_tpu.grid.hash import (
    HashGridState,
    bucket_lookup,
    init_hash_grid,
    insert_unique,
)
from sonar_3d_reconstruction_tpu.ops.packing import pack_keys

_FORMAT = "sonar3d-map-v1"


def save_map(path: str, state, cfg: MapperConfig) -> None:
    """Snapshot touched voxels + bounds + config to ``path`` (.npz).

    Accepts a HashGridState, a BrickGridState, or a sharded state
    (ShardedHashState / ShardedBrickState — shards hold disjoint voxels,
    so the gathered set is exact).  The snapshot stores UNPACKED voxel
    keys, so the format is identical across all of them and a map saved
    from any backend restores into any other (``load_map`` /
    ``load_map_brick``)."""
    from sonar_3d_reconstruction_tpu.grid.brick import (
        BrickGridState,
        touched_voxels_brick,
    )
    from sonar_3d_reconstruction_tpu.grid.hash import touched_voxels_hash
    from sonar_3d_reconstruction_tpu.parallel.shard import ShardedHashState
    from sonar_3d_reconstruction_tpu.parallel.shard_brick import (
        ShardedBrickState,
        gather_sharded_brick_state,
    )

    min_bounds = np.asarray(state.min_bounds)
    max_bounds = np.asarray(state.max_bounds)
    if isinstance(state, BrickGridState):
        keys, lo = touched_voxels_brick(state)
    elif isinstance(state, ShardedBrickState):
        keys, lo = gather_sharded_brick_state(state)
        min_bounds, max_bounds = min_bounds[0], max_bounds[0]  # replicated
    elif isinstance(state, ShardedHashState):
        # per-shard device compaction (shards hold disjoint voxels), so
        # only O(touched) crosses to the host instead of all S*C slots
        parts = [
            touched_voxels_hash(HashGridState(
                key_rows=state.key_rows[s], log_odds=state.log_odds[s],
                min_bounds=state.min_bounds[s],
                max_bounds=state.max_bounds[s],
                used=state.used[s], poisoned=state.poisoned[s],
            ))
            for s in range(state.key_rows.shape[0])
        ]
        keys = np.concatenate([p[0] for p in parts])
        lo = np.concatenate([p[1] for p in parts])
        min_bounds, max_bounds = min_bounds[0], max_bounds[0]
    else:
        keys, lo = touched_voxels_hash(state)
    np.savez_compressed(
        path,
        format=np.asarray(_FORMAT),
        keys=keys.astype(np.int32),
        log_odds=lo,
        min_bounds=min_bounds,
        max_bounds=max_bounds,
        config=np.asarray(json.dumps(cfg.to_dict())),
    )


def load_map(
    path: str, capacity: Optional[int] = None, dtype=None
) -> Tuple[HashGridState, MapperConfig]:
    """Restore a snapshot into a fresh hash grid (capacity auto-sized to
    keep load <= 0.25 unless given).  ``dtype`` defaults to the SNAPSHOT's
    value dtype, so a float64 map round-trips at float64 (the f64-parity
    invariant) instead of silently downcasting."""
    with np.load(path, allow_pickle=False) as z:
        assert str(z["format"]) == _FORMAT, f"unknown snapshot format in {path}"
        keys = z["keys"]
        lo = z["log_odds"]
        min_bounds = z["min_bounds"]
        max_bounds = z["max_bounds"]
        cfg = config_from_dict(json.loads(str(z["config"])))
    if dtype is None:
        dtype = lo.dtype  # numpy dtype is a valid jax dtype argument

    n = len(keys)
    if capacity is None:
        capacity = 1 << 10
        while capacity < 4 * max(1, n):
            capacity *= 2

    hi, lo_code, in_range = pack_keys(jnp.asarray(keys.reshape(-1, 3), jnp.int32))
    assert bool(jnp.all(in_range | (n == 0))), "snapshot keys out of packable range"
    while True:
        state = init_hash_grid(capacity, dtype)
        bucket, found, _, fill = bucket_lookup(state.key_rows, hi, lo_code)
        key_rows, slots, overflowed, n_inserted = insert_unique(
            state.key_rows, hi, lo_code,
            jnp.ones((n,), bool) & ~found, bucket, fill,
        )
        if not bool(overflowed):
            break
        capacity *= 2
    new_lo = state.log_odds.at[slots].set(jnp.asarray(lo, dtype), mode="drop")
    return (
        HashGridState(
            key_rows=key_rows,
            log_odds=new_lo,
            min_bounds=jnp.asarray(min_bounds, dtype),
            max_bounds=jnp.asarray(max_bounds, dtype),
            used=jnp.asarray(n_inserted, jnp.int32),
            poisoned=jnp.zeros((), bool),
        ),
        cfg,
    )


def load_map_brick(
    path: str,
    capacity: Optional[int] = None,
    dtype=None,
    brick_bits: Optional[int] = None,
):
    """Restore a snapshot into a fresh BRICK grid (grid/brick.py) — the
    snapshot format is backend-independent, so hash-saved maps load too.
    ``dtype`` defaults to the snapshot's value dtype (see ``load_map``).
    Returns (BrickGridState, MapperConfig)."""
    from sonar_3d_reconstruction_tpu.grid.brick import (
        DEFAULT_BRICK_BITS,
        load_voxels_brick,
    )

    with np.load(path, allow_pickle=False) as z:
        assert str(z["format"]) == _FORMAT, f"unknown snapshot format in {path}"
        keys = z["keys"]
        lo = z["log_odds"]
        min_bounds = z["min_bounds"]
        max_bounds = z["max_bounds"]
        cfg = config_from_dict(json.loads(str(z["config"])))
    if dtype is None:
        dtype = lo.dtype
    state = load_voxels_brick(
        keys, lo, capacity=capacity, dtype=dtype,
        brick_bits=brick_bits or DEFAULT_BRICK_BITS,
    )
    return (
        state._replace(
            min_bounds=jnp.asarray(min_bounds, dtype),
            max_bounds=jnp.asarray(max_bounds, dtype),
        ),
        cfg,
    )


def load_map_sharded_brick(
    path: str,
    mesh=None,
    local_capacity: Optional[int] = None,
    dtype=jnp.float32,
    brick_bits: Optional[int] = None,
    axis_name: str = "space",
):
    """Restore a snapshot into a SHARDED brick grid: each voxel is dealt
    to its brick's owner shard (ownership is a pure function of the brick
    code, parallel/shard_brick.owner_shard_brick), so a map saved from ANY
    backend — hash, brick, or either sharded engine — resumes multi-chip
    mapping.  Returns (ShardedBrickState, MapperConfig)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from sonar_3d_reconstruction_tpu.grid.brick import (
        DEFAULT_BRICK_BITS,
        load_voxels_brick,
    )
    from sonar_3d_reconstruction_tpu.ops.packing import pack_brick_keys
    from sonar_3d_reconstruction_tpu.parallel.shard import make_mesh
    from sonar_3d_reconstruction_tpu.parallel.shard_brick import (
        ShardedBrickState,
        owner_shard_brick,
    )

    bb = brick_bits or DEFAULT_BRICK_BITS
    with np.load(path, allow_pickle=False) as z:
        assert str(z["format"]) == _FORMAT, f"unknown snapshot format in {path}"
        keys = z["keys"].reshape(-1, 3).astype(np.int32)
        lo = z["log_odds"]
        min_bounds = z["min_bounds"]
        max_bounds = z["max_bounds"]
        cfg = config_from_dict(json.loads(str(z["config"])))

    mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
    S = int(mesh.devices.size)
    n = len(keys)
    if n:
        hi, lo_code, in_range = pack_brick_keys(jnp.asarray(keys), bb)
        assert bool(jnp.all(in_range)), "snapshot keys out of packable range"
        owner = np.asarray(owner_shard_brick(hi, lo_code, bb, S))
    else:
        owner = np.empty((0,), np.int32)
    per = [np.flatnonzero(owner == s) for s in range(S)]

    # uniform per-shard capacity: the auto-sized max over shards (pow2),
    # floored at the caller's local_capacity
    sized = [
        load_voxels_brick(keys[i], lo[i], dtype=dtype, brick_bits=bb)
        for i in per
    ]
    cap = max([s.capacity for s in sized] + [local_capacity or 0])
    assert cap & (cap - 1) == 0, "local_capacity must be a power of two"
    locals_ = [
        s if s.capacity == cap
        else load_voxels_brick(keys[i], lo[i], capacity=cap, dtype=dtype,
                               brick_bits=bb)
        for s, i in zip(sized, per)
    ]

    sh = NamedSharding(mesh, PartitionSpec(axis_name))

    def stack(f):
        return jax.device_put(jnp.stack([f(s) for s in locals_]), sh)

    bmin = jnp.asarray(min_bounds, dtype)
    return (
        ShardedBrickState(
            key_rows=stack(lambda s: s.key_rows),
            log_odds=stack(lambda s: s.log_odds),
            touched=stack(lambda s: s.touched),
            min_bounds=jax.device_put(
                jnp.broadcast_to(bmin[None], (S, 3)), sh
            ),
            max_bounds=jax.device_put(
                jnp.broadcast_to(
                    jnp.asarray(max_bounds, dtype)[None], (S, 3)
                ),
                sh,
            ),
            used=stack(lambda s: jnp.asarray(s.used, jnp.int32)),
            poisoned=stack(lambda s: jnp.zeros((), bool)),
        ),
        cfg,
    )
