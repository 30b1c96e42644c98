"""Backprojection kernel vs the golden oracle: identical candidate emissions."""

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.config import MapperConfig
from sonar_3d_reconstruction_tpu.geometry import (
    pose_matrix_from_quaternion,
    pose_matrix_from_rpy,
)
from sonar_3d_reconstruction_tpu.golden import GoldenMapper
from sonar_3d_reconstruction_tpu.ops.backproject import (
    backproject_ping,
    build_fan_tables,
)

from conftest import synthetic_ping


def golden_candidates(cfg: MapperConfig, image, position, quat):
    """All (point, log_odds, is_occ) emissions of the golden oracle for one ping."""
    g = GoldenMapper(cfg)
    T = (
        pose_matrix_from_quaternion(np.asarray(position), np.asarray(quat))
        @ g.T_sonar_to_base
    )
    out = []
    range_bins, bearing_bins = image.shape
    step = max(1, bearing_bins // cfg.max_rays)
    bearings = np.linspace(
        -cfg.horizontal_fov_rad / 2, cfg.horizontal_fov_rad / 2, bearing_bins
    )
    for b in range(0, bearing_bins, step):
        if abs(bearings[b]) > cfg.horizontal_fov_rad / 2:
            continue
        out.extend(g._emit_ray(bearings[b], image[:, b], T))
    return out


def device_candidates(cfg: MapperConfig, image, position, quat):
    tables = build_fan_tables(cfg, image.shape[0], image.shape[1])
    T_mount = pose_matrix_from_rpy(
        np.asarray(cfg.sonar_position), np.asarray(cfg.sonar_orientation)
    )
    T = pose_matrix_from_quaternion(np.asarray(position), np.asarray(quat)) @ T_mount
    out = backproject_ping(
        jnp.asarray(image), jnp.asarray(T), tables, cfg, dtype=jnp.float64
    )
    valid = np.asarray(out["valid"])
    return (
        np.asarray(out["points"])[valid],
        np.asarray(out["log_odds"])[valid],
        np.asarray(out["is_occupied"])[valid],
    )


def as_sorted_rows(points, lo, occ):
    rows = np.concatenate(
        [points, lo[:, None], occ[:, None].astype(np.float64)], axis=-1
    )
    # sort on rounded keys so ulp-level noise cannot flip tie-breaking between
    # near-identical rows; any rows swapped by a rounding tie are themselves
    # within the comparison tolerance
    order = np.lexsort(np.round(rows, 7).T[::-1])
    return rows[order]


def assert_same_emissions(cfg, image, position, quat):
    gold = golden_candidates(cfg, image, position, quat)
    g_pts = np.array([p for p, _, _ in gold]).reshape(-1, 3)
    g_lo = np.array([l for _, l, _ in gold])
    g_occ = np.array([o for _, _, o in gold])
    d_pts, d_lo, d_occ = device_candidates(cfg, image, position, quat)

    assert d_pts.shape[0] == g_pts.shape[0], (d_pts.shape, g_pts.shape)
    a = as_sorted_rows(g_pts, g_lo, g_occ)
    b = as_sorted_rows(d_pts, d_lo, d_occ)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_single_ping_identity_pose(small_cfg):
    image = synthetic_ping(small_cfg.image_height, small_cfg.image_width, seed=7)
    assert_same_emissions(small_cfg, image, [0, 0, 0], [0, 0, 0, 1])


def test_arbitrary_pose(small_cfg):
    rng = np.random.default_rng(11)
    image = synthetic_ping(small_cfg.image_height, small_cfg.image_width, seed=8)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    assert_same_emissions(small_cfg, image, rng.uniform(-2, 2, 3), q)


def test_no_hit_ray_all_free(small_cfg):
    image = np.zeros((small_cfg.image_height, small_cfg.image_width), np.uint8)
    assert_same_emissions(small_cfg, image, [0, 0, 0], [0, 0, 0, 1])
    _, d_lo, d_occ = device_candidates(small_cfg, image, [0, 0, 0], [0, 0, 0, 1])
    assert not d_occ.any()
    assert (d_lo == small_cfg.log_odds_free).all()


def test_all_hit_first_bin(small_cfg):
    # saturated image: first hit at bin 0, occupied window only (min_range gates)
    image = np.full((small_cfg.image_height, small_cfg.image_width), 255, np.uint8)
    assert_same_emissions(small_cfg, image, [0, 0, 0], [0, 0, 0, 1])


def test_z_filter(small_cfg):
    cfg = small_cfg.replace(z_filter_enabled=True, z_filter_min=-1.2)
    image = synthetic_ping(cfg.image_height, cfg.image_width, seed=9)
    assert_same_emissions(cfg, image, [0, 0, 0.5], [0, 0, 0, 1])
    pts, _, _ = device_candidates(cfg, image, [0, 0, 0.5], [0, 0, 0, 1])
    assert (pts[:, 2] >= cfg.z_filter_min).all()


def test_bearing_subsampling_cap():
    # 512 bearings -> step 2 -> 256 rays (reference 3d_mapper.py:527-528)
    cfg = MapperConfig(image_width=512, image_height=60, max_range=3.0)
    tables = build_fan_tables(cfg, 60, 512)
    assert tables.n_rays == 256
    # odd width not divisible: 300 // 256 = 1 -> every bearing
    tables = build_fan_tables(cfg, 60, 300)
    assert tables.n_rays == 300


def test_narrow_fov_prod_config():
    from sonar_3d_reconstruction_tpu.config import PRESETS

    cfg = PRESETS["kiro_tilt60"].replace(image_width=96, image_height=80)
    image = synthetic_ping(80, 96, seed=12, density=0.05)
    # prod threshold is 120 so raise blob intensity
    image = np.where(image > 60, 200, image).astype(np.uint8)
    assert_same_emissions(cfg, image, [0.3, -0.2, 0.1], [0, 0, 0, 1])


def test_required_fan_cap_and_capped_tables_equivalence(small_cfg):
    """Tables capped by the host gate (required_fan_cap) emit EXACTLY the
    same candidates as the max_range-sized worst case for the images the
    cap was computed from (the perf knob must be invisible to the map)."""
    import jax.numpy as jnp

    from sonar_3d_reconstruction_tpu.ops.backproject import required_fan_cap
    from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence

    cfg = small_cfg
    images = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=80 + i)
         for i in range(5)]
    )
    positions = np.cumsum(np.full((5, 3), 0.08), axis=0)
    quats = np.tile([0.0, 0.0, 0.0, 1.0], (5, 1))

    cap = required_fan_cap(images, cfg, cfg.image_height)
    t_full = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    t_cap = build_fan_tables(
        cfg, cfg.image_height, cfg.image_width, fan_cap=cap
    )
    assert 2 <= t_cap.nvo_cap <= t_full.nvo_max
    assert t_cap.candidates_per_ping(cfg.occupied_window) <= \
        t_full.candidates_per_ping(cfg.occupied_window)

    st_a, stats_a = map_ping_sequence(
        images, positions, quats, cfg, dtype=jnp.float64, fan_cap=None,
        initial_capacity=1 << 14,
    )
    st_b, stats_b = map_ping_sequence(
        images, positions, quats, cfg, dtype=jnp.float64, fan_cap="auto",
        initial_capacity=1 << 14,
    )
    for k in ("num_occupied", "num_free", "num_candidates"):
        np.testing.assert_array_equal(
            np.asarray(stats_a[k]), np.asarray(stats_b[k]), err_msg=k
        )
    assert int(st_a.used) == int(st_b.used)
    np.testing.assert_array_equal(
        np.sort(np.asarray(st_a.log_odds)), np.sort(np.asarray(st_b.log_odds))
    )


def test_required_fan_cap_edge_cases(small_cfg):
    from sonar_3d_reconstruction_tpu.ops.backproject import required_fan_cap

    cfg = small_cfg
    R, B = cfg.image_height, cfg.image_width
    # no hits anywhere -> minimum fan
    assert required_fan_cap(np.zeros((3, R, B), np.uint8), cfg, R) == 2
    # a hit in the LAST bin -> the exact worst case of the table builder
    img = np.zeros((R, B), np.uint8)
    img[R - 1, 0] = 255
    t_full = build_fan_tables(cfg, R, B)
    cap = required_fan_cap(img[None], cfg, R)
    assert cap == int(t_full.occ_nv[R - 1])
    assert cap <= t_full.nvo_max


def test_required_window_cap_and_capped_tables_equivalence(small_cfg):
    """Tables whose occupied-window depth is capped by the host gate
    (required_window_cap) produce EXACTLY the same map as the config's
    full-window worst case for the images the cap was computed from —
    like the fan cap, the knob must be invisible to the map."""
    import jax.numpy as jnp

    from sonar_3d_reconstruction_tpu.ops.backproject import (
        required_window_cap,
    )
    from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence

    cfg = small_cfg
    images = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=90 + i)
         for i in range(5)]
    )
    positions = np.cumsum(np.full((5, 3), 0.08), axis=0)
    quats = np.tile([0.0, 0.0, 0.0, 1.0], (5, 1))

    wcap = required_window_cap(images, cfg, cfg.image_height)
    full_w = min(cfg.occupied_window, cfg.image_height)
    assert 1 <= wcap <= full_w
    # the synthetic blobs are at most ~10 bins thick, so the gate must bite
    assert wcap < full_w
    t_full = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    t_cap = build_fan_tables(
        cfg, cfg.image_height, cfg.image_width, window_cap=wcap
    )
    assert t_cap.effective_window(cfg.occupied_window) == wcap
    assert t_cap.candidates_per_ping(cfg.occupied_window) < \
        t_full.candidates_per_ping(cfg.occupied_window)

    st_a, stats_a = map_ping_sequence(
        images, positions, quats, cfg, dtype=jnp.float64, window_cap=None,
        initial_capacity=1 << 14,
    )
    st_b, stats_b = map_ping_sequence(
        images, positions, quats, cfg, dtype=jnp.float64, window_cap="auto",
        initial_capacity=1 << 14,
    )
    for k in ("num_occupied", "num_free", "num_candidates"):
        np.testing.assert_array_equal(
            np.asarray(stats_a[k]), np.asarray(stats_b[k]), err_msg=k
        )
    assert int(st_a.used) == int(st_b.used)
    np.testing.assert_array_equal(
        np.sort(np.asarray(st_a.log_odds)), np.sort(np.asarray(st_b.log_odds))
    )


def test_required_window_cap_edge_cases(small_cfg):
    from sonar_3d_reconstruction_tpu.ops.backproject import (
        required_window_cap,
    )

    cfg = small_cfg
    R, B = cfg.image_height, cfg.image_width
    W = min(cfg.occupied_window, R)
    # no hits anywhere -> minimal 1-bin window
    assert required_window_cap(np.zeros((3, R, B), np.uint8), cfg, R) == 1
    # a contiguous slab of k bins after the first hit -> exactly k
    img = np.zeros((R, B), np.uint8)
    img[10:22, :] = 255
    assert required_window_cap(img[None], cfg, R) == 12
    # a hit BEYOND the window of its column's first hit is never emitted
    # by the reference walk, so it must not widen the cap
    img2 = np.zeros((R, B), np.uint8)
    img2[5, :] = 255
    img2[5 + W + 3, 0] = 255
    assert required_window_cap(img2[None], cfg, R) == 1
    # 2D (single image) input accepted
    assert required_window_cap(img, cfg, R) == 12
    # slab thicker than the window saturates at W
    img3 = np.zeros((R, B), np.uint8)
    img3[0:R, 0] = 255
    assert required_window_cap(img3[None], cfg, R) == W


def test_required_free_cap_and_capped_tables_equivalence(small_cfg):
    """Tables whose free-lattice depth is capped by the host gate
    (required_free_cap) produce EXACTLY the same map as the full-depth
    worst case for the images the cap was computed from."""
    import jax.numpy as jnp

    from sonar_3d_reconstruction_tpu.ops.backproject import required_free_cap
    from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence
    from test_pipeline import hash_state_to_dict

    cfg = small_cfg
    R, B = cfg.image_height, cfg.image_width
    rng = np.random.default_rng(5)
    # EVERY column returns (a continuous band) so the gate can bite
    images = np.zeros((4, R, B), np.uint8)
    for i in range(4):
        images[i, 40 + i : 52 + i, :] = rng.integers(
            80, 200, size=(12, B)
        ).astype(np.uint8)
    positions = np.cumsum(np.full((4, 3), 0.05), axis=0)
    quats = np.tile([0.0, 0.0, 0.0, 1.0], (4, 1))

    fcap = required_free_cap(images, cfg, R)
    assert 1 <= fcap < R  # bites: deepest first hit well above bottom
    t_full = build_fan_tables(cfg, R, B)
    t_cap = build_fan_tables(cfg, R, B, free_cap=fcap)
    assert t_cap.free_idx.shape[0] < t_full.free_idx.shape[0]

    st_a, _ = map_ping_sequence(
        images, positions, quats, cfg, dtype=jnp.float64, free_cap=None,
        initial_capacity=1 << 14,
    )
    st_b, _ = map_ping_sequence(
        images, positions, quats, cfg, dtype=jnp.float64, free_cap="auto",
        initial_capacity=1 << 14,
    )
    a, b = hash_state_to_dict(st_a), hash_state_to_dict(st_b)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k


def test_required_free_cap_edge_cases(small_cfg):
    """A column with no return forces the full free depth; all-dark images
    force the full depth; first hit at bin 0 yields the floor cap 1."""
    from sonar_3d_reconstruction_tpu.ops.backproject import required_free_cap

    cfg = small_cfg
    R, B = cfg.image_height, cfg.image_width
    img = np.zeros((R, B), np.uint8)
    img[30:40, : B - 1] = 200  # last column never returns
    assert required_free_cap(img, cfg, R) == R
    assert required_free_cap(np.zeros((R, B), np.uint8), cfg, R) == R
    img2 = np.zeros((R, B), np.uint8)
    img2[0, :] = 200
    assert required_free_cap(img2, cfg, R) == 1
    img3 = np.zeros((R, B), np.uint8)
    img3[25, :] = 200
    assert required_free_cap(img3, cfg, R) == 25
