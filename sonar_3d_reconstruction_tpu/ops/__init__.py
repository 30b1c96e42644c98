"""Device ops: fixed-shape backprojection, key packing, sort-based frame
dedup, frame records, log-odds update math."""

from sonar_3d_reconstruction_tpu.ops.backproject import (  # noqa: F401
    FanTables,
    backproject_ping,
    build_fan_tables,
)
from sonar_3d_reconstruction_tpu.ops.dedup import (  # noqa: F401
    UniqueRecords,
    dedup_frame,
)
from sonar_3d_reconstruction_tpu.ops.logodds import (  # noqa: F401
    finalize_voxel_updates,
    probability_to_log_odds,
    sigmoid,
)
from sonar_3d_reconstruction_tpu.ops.packing import (  # noqa: F401
    EMPTY_HI,
    mix2,
    pack_keys,
    unpack_keys,
)
from sonar_3d_reconstruction_tpu.ops.records import (  # noqa: F401
    FrameAux,
    frame_records,
    frame_records_batch,
)
