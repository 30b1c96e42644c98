"""Log-odds Bayesian update math (adaptive free-space protection, clamping).

Reproduces reference SimpleOctree.update_voxel (scripts/3d_mapper.py:83-110)
as a pure vectorized function over per-voxel aggregates, plus the probability
<-> log-odds conversions with the reference's extraction edge cases
(3d_mapper.py:140-145).

The reference applies updates per frame as the per-voxel MEAN of all candidate
emissions that landed in the voxel, with occupied-priority typing
(3d_mapper.py:553-567): occupied-typed voxels go through the adaptive path,
free-typed do not.  Because each voxel is written exactly once per frame, the
adaptive read-before-write is embarrassingly parallel within a frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.config import MapperConfig


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """p = 1 / (1 + exp(-log_odds))  (reference 3d_mapper.py:97, 125)."""
    return 1.0 / (1.0 + jnp.exp(-x))


def probability_to_log_odds(min_probability: float, cfg: MapperConfig) -> float:
    """Extraction threshold with the reference edge cases
    (3d_mapper.py:140-145): >=1.0 -> log_odds_max - 0.01, <=0.0 -> log_odds_min."""
    import math

    if min_probability >= 1.0:
        return cfg.log_odds_max - 0.01
    if min_probability <= 0.0:
        return cfg.log_odds_min
    return math.log(min_probability / (1.0 - min_probability))


def finalize_voxel_updates(
    current: jnp.ndarray,
    lo_sum: jnp.ndarray,
    count: jnp.ndarray,
    occupied: jnp.ndarray,
    cfg: MapperConfig,
) -> jnp.ndarray:
    """Apply one frame's averaged updates to per-voxel log-odds.

    Args:
      current:  pre-frame log-odds per voxel.
      lo_sum:   per-frame sum of candidate log-odds per voxel.
      count:    per-frame candidate count per voxel (0 -> untouched).
      occupied: per-voxel occupied-priority flag (bool).

    Returns the post-frame log-odds; untouched voxels pass through unchanged.
    Semantics: avg = sum/count; occupied-typed positive updates into voxels
    with p <= adaptive_threshold are scaled by (p/threshold)*max_ratio
    (reference 3d_mapper.py:95-102 via :563-566); result clamped to
    [log_odds_min, log_odds_max] (:107-110).
    """
    dtype = current.dtype
    touched = count > 0
    avg = lo_sum / jnp.maximum(count, 1).astype(dtype)

    if cfg.adaptive_update:
        p = sigmoid(current)
        scale = jnp.where(
            p <= cfg.adaptive_threshold,
            (p / cfg.adaptive_threshold) * cfg.adaptive_max_ratio,
            jnp.ones_like(p),
        )
        use_adaptive = occupied & (avg > 0)
        update = jnp.where(use_adaptive, avg * scale, avg)
    else:
        update = avg

    new = jnp.clip(current + update, cfg.log_odds_min, cfg.log_odds_max)
    return jnp.where(touched, new, current)
