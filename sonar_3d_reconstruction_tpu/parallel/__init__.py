"""Multi-chip parallelism: shard_map spatial sharding of the voxel map over a
jax Mesh, with within-ping ray/candidate data parallelism (SURVEY.md 5.8)."""

from sonar_3d_reconstruction_tpu.parallel.shard import (  # noqa: F401
    ShardedHashState,
    gather_sharded_state,
    init_sharded_hash_grid,
    make_mesh,
    rehash_sharded,
    scan_pings_sharded,
    sharded_ping_step,
)
from sonar_3d_reconstruction_tpu.parallel.shard_brick import (  # noqa: F401
    ShardedBrickState,
    gather_sharded_brick_state,
    init_sharded_brick_grid,
    local_brick_states,
    map_ping_sequence_sharded_brick,
    rehash_sharded_bricks,
)
from sonar_3d_reconstruction_tpu.parallel.shard_frames import (  # noqa: F401
    map_ping_sequence_sharded_frames,
)
from sonar_3d_reconstruction_tpu.parallel.multihost import (  # noqa: F401
    apply_record_segments,
    records_for_segment,
)
