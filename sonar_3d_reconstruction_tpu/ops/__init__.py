"""Device ops: fixed-shape backprojection, key packing, sort-based frame
dedup, frame records, log-odds update math."""

from sonar_3d_reconstruction_tpu.ops.backproject import (  # noqa: F401
    FanTables,
    backproject_ping,
    build_fan_tables,
    required_fan_cap,
    required_free_cap,
    required_window_cap,
)
from sonar_3d_reconstruction_tpu.ops.dedup import (  # noqa: F401
    CompactRecords,
    UniqueRecords,
    dedup_frame,
    dedup_frame_compact,
)
from sonar_3d_reconstruction_tpu.ops.logodds import (  # noqa: F401
    finalize_voxel_updates,
    probability_to_log_odds,
    sigmoid,
)
from sonar_3d_reconstruction_tpu.ops.packing import (  # noqa: F401
    EMPTY32,
    EMPTY_HI,
    compute_window_boxes,
    mix2,
    pack_box_keys,
    pack_keys,
    unpack_keys,
)
from sonar_3d_reconstruction_tpu.ops.records import (  # noqa: F401
    FrameAux,
    frame_records,
    frame_records_batch,
)
