"""Host-side I/O: image decode, PointCloud2/Marker serialization, approximate
time synchronization, rosbag2 reading, and map checkpointing."""

from sonar_3d_reconstruction_tpu.io.image import decode_image  # noqa: F401
from sonar_3d_reconstruction_tpu.io.pointcloud import (  # noqa: F401
    serialize_pointcloud2,
    parse_pointcloud2,
    classified_markers,
)
from sonar_3d_reconstruction_tpu.io.timesync import ApproximateTimeSync  # noqa: F401
from sonar_3d_reconstruction_tpu.io.checkpoint import (  # noqa: F401
    save_map,
    load_map,
    load_map_brick,
    load_map_sharded_brick,
)
