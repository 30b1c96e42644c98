"""Voxel map state: dense bounded grid and open-addressing hashed sparse grid."""

from sonar_3d_reconstruction_tpu.grid.dense import (  # noqa: F401
    DenseGridSpec,
    DenseGridState,
    init_dense_grid,
    update_dense_grid,
)
