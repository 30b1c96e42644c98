"""Flagship model surfaces."""

from sonar_3d_reconstruction_tpu.models.mapper import SonarMapper  # noqa: F401
