"""Multi-chip parallelism: shard_map spatial sharding of the voxel map over a
jax Mesh, with within-ping ray/candidate data parallelism (SURVEY.md 5.8)."""

from sonar_3d_reconstruction_tpu.parallel.shard import (  # noqa: F401
    ShardedHashState,
    init_sharded_hash_grid,
    make_mesh,
    sharded_ping_step,
    scan_pings_sharded,
    gather_sharded_state,
)
