"""Multi-host DCN decomposition: per-segment records + ordered apply must be
bit-identical to one-shot sequence mapping."""

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.grid.hash import init_hash_grid
from sonar_3d_reconstruction_tpu.parallel.multihost import (
    apply_record_segments,
    records_for_segment,
)
from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence

from conftest import circular_trajectory, synthetic_ping
from test_pipeline import hash_state_to_dict


def test_segmented_records_match_one_shot(small_cfg):
    cfg = small_cfg
    n = 9
    images = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=500 + i)
         for i in range(n)]
    )
    positions, quats = circular_trajectory(n, radius=0.7)

    one_shot, _ = map_ping_sequence(
        images, positions, quats, cfg, initial_capacity=1 << 16,
        dtype=jnp.float64,
    )

    # "three hosts" compute records for disjoint ordered segments
    cuts = [(0, 4), (4, 6), (6, 9)]
    segments = [
        records_for_segment(
            images[a:b], positions[a:b], quats[a:b], cfg, dtype=jnp.float64,
        )
        for a, b in cuts
    ]
    # an empty segment (uneven multi-host split) must be a clean no-op
    segments.insert(
        1,
        records_for_segment(
            images[:0], positions[:0], quats[:0], cfg, dtype=jnp.float64,
        ),
    )
    state = init_hash_grid(1 << 16, jnp.float64)
    state, stats = apply_record_segments(state, segments, cfg, window=3)
    assert len(stats) == n
    assert not any(bool(s["overflowed"]) for s in stats)

    a = hash_state_to_dict(state)
    b = hash_state_to_dict(one_shot)
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12
