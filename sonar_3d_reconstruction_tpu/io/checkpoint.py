"""Map snapshot / restore (new capability vs the reference, SURVEY.md 5.4:
the reference map lives only in process memory).

Serializes the hash or dense map state plus config to one ``.npz`` — cheap,
dependency-free, and enough for long bag replays to resume.  The sharded
multi-chip state round-trips through the single-chip layout (gather on save,
re-insert on load).
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.config import MapperConfig, config_from_dict
from sonar_3d_reconstruction_tpu.grid.hash import (
    EMPTY,
    HashGridState,
    init_hash_grid,
    find_or_insert,
)

_FORMAT = "sonar3d-map-v1"


def save_map(path: str, state: HashGridState, cfg: MapperConfig) -> None:
    """Snapshot occupied hash entries + bounds + config to ``path`` (.npz)."""
    keys = np.asarray(state.keys)
    lo = np.asarray(state.log_odds)
    mask = keys[:, 0] != EMPTY
    np.savez_compressed(
        path,
        format=np.asarray(_FORMAT),
        keys=keys[mask].astype(np.int32),
        log_odds=lo[mask],
        min_bounds=np.asarray(state.min_bounds),
        max_bounds=np.asarray(state.max_bounds),
        config=np.asarray(json.dumps(cfg.to_dict())),
    )


def load_map(
    path: str, capacity: Optional[int] = None, dtype=jnp.float32
) -> Tuple[HashGridState, MapperConfig]:
    """Restore a snapshot into a fresh hash grid (capacity auto-sized to
    keep load <= 0.25 unless given)."""
    with np.load(path, allow_pickle=False) as z:
        assert str(z["format"]) == _FORMAT, f"unknown snapshot format in {path}"
        keys = z["keys"]
        lo = z["log_odds"]
        min_bounds = z["min_bounds"]
        max_bounds = z["max_bounds"]
        cfg = config_from_dict(json.loads(str(z["config"])))

    n = len(keys)
    if capacity is None:
        capacity = 1 << 10
        while capacity < 4 * max(1, n):
            capacity *= 2
    state = init_hash_grid(capacity, dtype)
    while True:
        tbl, slots, overflowed = find_or_insert(
            state.keys, jnp.asarray(keys), jnp.ones((n,), bool)
        )
        if not bool(overflowed):
            break
        capacity *= 2
        state = init_hash_grid(capacity, dtype)
    new_lo = state.log_odds.at[slots].set(jnp.asarray(lo, dtype), mode="drop")
    return (
        HashGridState(
            keys=tbl,
            log_odds=new_lo,
            min_bounds=jnp.asarray(min_bounds, dtype),
            max_bounds=jnp.asarray(max_bounds, dtype),
            used=jnp.asarray(n, jnp.int32),
            poisoned=jnp.zeros((), bool),
        ),
        cfg,
    )
