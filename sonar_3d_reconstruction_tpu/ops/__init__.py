"""Device ops: fixed-shape backprojection, scatter-accumulate map updates."""

from sonar_3d_reconstruction_tpu.ops.backproject import (  # noqa: F401
    FanTables,
    backproject_ping,
    build_fan_tables,
)
