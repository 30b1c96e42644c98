"""The ROS2 node module must import cleanly WITHOUT rclpy (import-guarded),
and fail with a clear error only when actually instantiated."""

import pytest


def test_node_module_imports_without_ros2():
    import sonar_3d_reconstruction_tpu.node as node

    # this test environment has no ROS2
    assert node._ROS2 is False


def test_node_instantiation_requires_ros2():
    from sonar_3d_reconstruction_tpu.node import SonarMapperNode

    with pytest.raises(ImportError, match="rclpy"):
        SonarMapperNode()


def test_node_param_surface_covers_reference_names():
    """Parameter names must match the reference node's declared surface
    (scripts/3d_mapper_node.py:53-107)."""
    from sonar_3d_reconstruction_tpu.node import _NODE_PARAM_DEFAULTS as P

    for name in (
        "horizontal_fov", "vertical_aperture", "max_range", "min_range",
        "intensity_threshold", "sonar_position.x", "sonar_orientation.pitch",
        "voxel_resolution", "min_probability", "adaptive_update",
        "adaptive_threshold", "adaptive_max_ratio", "log_odds_occupied",
        "log_odds_free", "log_odds_min", "log_odds_max", "show_free_space",
        "sonar_frame_id", "base_frame_id", "map_frame_id", "publish_tf",
        "sonar_topic", "odometry_topic", "pointcloud_topic", "marker_topic",
    ):
        assert name in P, name
    # orientation is degrees at node level (node:67-69)
    assert P["sonar_orientation.pitch"] == 90.0
