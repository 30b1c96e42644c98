"""SonarMapper(backend="brick-sharded"): the flagship stateful API driven
by the frame-parallel sharded engine on the 8-virtual-device CPU mesh.
Every surface (per-ping, batch, point cloud, classification, queries,
reset) must match the single-chip brick mapper bit-for-bit in float64 —
shards own disjoint bricks, so reads distribute exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from sonar_3d_reconstruction_tpu.models.mapper import SonarMapper

from test_shard_brick import make_seq


def _sorted_cloud(points, probs):
    order = np.lexsort(np.asarray(points).T)
    return np.asarray(points)[order], np.asarray(probs)[order]


@pytest.fixture()
def pair(small_cfg):
    """(sharded mapper, single-chip brick mapper) fed the same 10 pings."""
    images, positions, quats = make_seq(small_cfg, 10, seed=701)
    sh = SonarMapper(small_cfg, backend="brick-sharded", dtype=jnp.float64,
                     initial_capacity=1 << 17)
    ref = SonarMapper(small_cfg, backend="brick", dtype=jnp.float64,
                      initial_capacity=1 << 17)
    sh.map_sequence(images, positions, quats, window=4)
    ref.map_sequence(images, positions, quats, window=4)
    return sh, ref, (images, positions, quats)


def test_sharded_mapper_point_cloud_matches_brick(pair):
    sh, ref, _ = pair
    a = sh.get_point_cloud()
    b = ref.get_point_cloud()
    assert a["num_occupied"] == b["num_occupied"]
    assert a["num_voxels"] == b["num_voxels"]
    pa, qa = _sorted_cloud(a["points"], a["probabilities"])
    pb, qb = _sorted_cloud(b["points"], b["probabilities"])
    np.testing.assert_array_equal(pa, pb)
    np.testing.assert_array_equal(qa, qb)


def test_sharded_mapper_classified_and_bounds_match(pair):
    sh, ref, _ = pair
    a = sh.get_point_cloud(include_free=True)
    b = ref.get_point_cloud(include_free=True)
    for k in ("occupied", "free", "unknown"):
        pa, qa = _sorted_cloud(*a[k])
        pb, qb = _sorted_cloud(*b[k])
        np.testing.assert_array_equal(pa, pb, err_msg=k)
        np.testing.assert_array_equal(qa, qb, err_msg=k)
    np.testing.assert_array_equal(a["bounds"]["min"], b["bounds"]["min"])
    np.testing.assert_array_equal(a["bounds"]["max"], b["bounds"]["max"])


def test_sharded_mapper_queries_match(pair):
    sh, ref, _ = pair
    pts = ref.get_point_cloud()["points"]
    probe = np.concatenate(
        [pts[:50], pts[:5] + 50.0]  # hits + guaranteed misses
    )
    np.testing.assert_array_equal(
        sh.query_probabilities(probe), ref.query_probabilities(probe)
    )
    x, y, z = map(float, probe[0])
    assert sh.get_log_odds(x, y, z) == ref.get_log_odds(x, y, z)
    assert sh.get_probability(x, y, z) == ref.get_probability(x, y, z)
    assert sh.get_log_odds(99.0, 99.0, 99.0) == 0.0


def test_sharded_mapper_per_ping_stats_match(small_cfg):
    images, positions, quats = make_seq(small_cfg, 3, seed=702)
    sh = SonarMapper(small_cfg, backend="brick-sharded", dtype=jnp.float64)
    ref = SonarMapper(small_cfg, backend="brick", dtype=jnp.float64)
    for i in range(3):
        ra = sh.process_sonar_image(images[i], positions[i], quats[i])
        rb = ref.process_sonar_image(images[i], positions[i], quats[i])
        for k in ("frame_count", "processed_count", "num_occupied",
                  "num_free", "num_voxels"):
            assert ra[k] == rb[k], (i, k)


def test_sharded_mapper_reset(pair):
    sh, _, (images, positions, quats) = pair
    assert sh.num_voxels > 0
    sh.reset_map()
    assert sh.num_voxels == 0
    assert sh.get_point_cloud()["num_occupied"] == 0
    # usable after reset
    sh.map_sequence(images[:2], positions[:2], quats[:2], window=2)
    assert sh.num_voxels > 0
