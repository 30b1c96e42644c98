"""Config system: defaults, layering, units, presets."""

import math

import pytest

from sonar_3d_reconstruction_tpu.config import (
    PRESETS,
    MapperConfig,
    config_from_dict,
    load_config,
)


def test_library_defaults_match_reference():
    # reference scripts/3d_mapper.py:220-250, 269-270
    c = MapperConfig()
    assert c.horizontal_fov == 130.0
    assert c.vertical_aperture == 20.0
    assert c.max_range == 10.0
    assert c.min_range == 0.5
    assert c.intensity_threshold == 35
    assert c.image_width == 512
    assert c.image_height == 500
    assert c.sonar_position == (0.0, 0.0, -0.5)
    assert c.sonar_orientation == (0.0, 1.5708, 0.0)
    assert c.voxel_resolution == 0.05
    assert c.min_probability == 0.6
    assert c.dynamic_expansion is True
    assert c.z_filter_min == -5.0
    assert c.z_filter_enabled is False
    assert c.adaptive_update is True
    assert c.adaptive_threshold == 0.5
    assert c.adaptive_max_ratio == 0.3
    assert (c.log_odds_occupied, c.log_odds_free) == (1.5, -2.0)
    assert (c.log_odds_min, c.log_odds_max) == (-10.0, 10.0)


def test_unknown_keys_ignored_like_reference_update():
    # reference default_config.update(config) keeps unknown keys harmless
    c = config_from_dict({"voxel_resolution": 0.2, "not_a_param": 42})
    assert c.voxel_resolution == 0.2


def test_yaml_loading_and_override_priority(tmp_path):
    y = tmp_path / "m.yaml"
    y.write_text(
        """
sonar_3d_mapper:
  ros__parameters:
    horizontal_fov: 70.0
    intensity_threshold: 120
    sonar_orientation:
      roll: 0.0
      pitch: 60.0
      yaw: 0.0
    voxel_resolution: 0.15
"""
    )
    cfg, _ = load_config(str(y), overrides={"intensity_threshold": 85})
    assert cfg.horizontal_fov == 70.0
    assert cfg.intensity_threshold == 85  # override wins over YAML
    assert cfg.voxel_resolution == 0.15
    # degrees -> radians at the boundary (node:130-132)
    assert cfg.sonar_orientation[1] == pytest.approx(math.radians(60.0))


def test_presets_match_reference_field_configs():
    t60 = PRESETS["kiro_tilt60"]
    assert t60.intensity_threshold == 120
    assert t60.sonar_orientation[1] == pytest.approx(math.radians(60.0))
    assert t60.log_odds_max == 7.0
    t90 = PRESETS["kiro_tilt90"]
    assert t90.intensity_threshold == 85
    assert t90.min_probability == 0.8
    assert t90.log_odds_free == -0.3
    assert t90.z_filter_min == -6.5


def test_config_is_hashable_static_arg():
    assert hash(MapperConfig()) == hash(MapperConfig())
    assert MapperConfig() != MapperConfig(voxel_resolution=0.1)


def test_yaml_preset_files_match_code_presets():
    """The shipped config/*.yaml presets (reference config/3d_mapper.yaml and
    .bak90 schema) must resolve to the same MapperConfig as the in-code
    presets."""
    import os

    from sonar_3d_reconstruction_tpu.config import PRESETS, load_config

    root = os.path.join(os.path.dirname(__file__), "..")
    for name in ("kiro_tilt60", "kiro_tilt90"):
        cfg, stream = load_config(os.path.join(root, "config", f"{name}.yaml"))
        assert cfg == PRESETS[name], name
        assert stream.map_frame_id == "camera_init"
        assert stream.publish_tf is False
