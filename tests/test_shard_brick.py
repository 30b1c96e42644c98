"""Sharded BRICK map on the 8-virtual-device CPU mesh vs single-chip brick."""

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.parallel.shard import make_mesh
from sonar_3d_reconstruction_tpu.parallel.shard_brick import (
    gather_sharded_brick_state,
    init_sharded_brick_grid,
    map_ping_sequence_sharded_brick,
    owner_shard_brick,
    sharded_brick_bounds,
)
from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence

from conftest import circular_trajectory, synthetic_ping
from test_brick_grid import brick_state_to_dict


def make_seq(cfg, n, seed=0):
    images = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=seed + i)
         for i in range(n)]
    )
    positions, quats = circular_trajectory(n, radius=0.8)
    return images, positions, quats


def sharded_brick_to_dict(state):
    keys, lo = gather_sharded_brick_state(state)
    return {tuple(k): v for k, v in zip(keys, lo)}


def test_owner_shard_brick_groups_whole_bricks():
    """Every voxel of a brick gets the same owner; distribution is roughly
    uniform over shards."""
    from sonar_3d_reconstruction_tpu.ops.packing import pack_brick_keys

    rng = np.random.default_rng(3)
    bricks = rng.integers(-40, 40, size=(500, 3)).astype(np.int32) * 4
    offs = rng.integers(0, 4, size=(500, 3)).astype(np.int32)
    hi_a, lo_a, _ = pack_brick_keys(jnp.asarray(bricks), 2)
    hi_b, lo_b, _ = pack_brick_keys(jnp.asarray(bricks + offs), 2)
    oa = np.asarray(owner_shard_brick(hi_a, lo_a, 2, 8))
    ob = np.asarray(owner_shard_brick(hi_b, lo_b, 2, 8))
    np.testing.assert_array_equal(oa, ob)  # offset never changes the owner
    counts = np.bincount(oa, minlength=8)
    assert counts.max() < 250


def test_sharded_brick_matches_single_chip(small_cfg):
    """Window-engine sharded brick map == single-chip brick map bit-for-bit
    in float64 (same voxels, log-odds, bounds, per-ping stats)."""
    cfg = small_cfg
    images, positions, quats = make_seq(cfg, 6, seed=910)
    mesh = make_mesh()

    sh, sstats = map_ping_sequence_sharded_brick(
        images, positions, quats, cfg, mesh=mesh, dtype=jnp.float64,
        window=3, local_capacity=1 << 10,
    )
    single, dstats = map_ping_sequence(
        images, positions, quats, cfg, backend="brick", dtype=jnp.float64,
        window=3,
    )
    a = sharded_brick_to_dict(sh)
    b = brick_state_to_dict(single)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k
    smin, smax = sharded_brick_bounds(sh)
    np.testing.assert_array_equal(smin, np.asarray(single.min_bounds))
    np.testing.assert_array_equal(smax, np.asarray(single.max_bounds))
    for k in ("num_occupied", "num_free", "num_candidates"):
        np.testing.assert_array_equal(
            np.asarray(sstats[k]), np.asarray(dstats[k]), err_msg=k
        )
    assert int(np.asarray(sh.used).sum()) == len(a)


def test_sharded_brick_growth_and_replay(small_cfg):
    """Tiny initial budgets/capacity converge through every growth cause
    (unique budget, brick budget, capacity rehash) to the same map."""
    cfg = small_cfg
    images, positions, quats = make_seq(cfg, 5, seed=920)
    mesh = make_mesh()

    big, _ = map_ping_sequence_sharded_brick(
        images, positions, quats, cfg, mesh=mesh, dtype=jnp.float64,
        window=2, local_capacity=1 << 10,
    )
    small, sstats = map_ping_sequence_sharded_brick(
        images, positions, quats, cfg, mesh=mesh, dtype=jnp.float64,
        window=2, local_capacity=1 << 7,  # forces rehash growth
        unique_budget=512,                # forces unique growth
        brick_budget=64,                  # forces brick-budget growth
    )
    assert not np.asarray(sstats["overflowed"]).any()
    a, b = sharded_brick_to_dict(big), sharded_brick_to_dict(small)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k


def test_sharded_brick_snug_budgets_and_insert_schedule(small_cfg):
    """The reported per-shard maxima size a snug cold/warm configuration
    that reproduces the default-run map exactly."""
    cfg = small_cfg
    images, positions, quats = make_seq(cfg, 6, seed=930)
    mesh = make_mesh()

    ref, stats = map_ping_sequence_sharded_brick(
        images, positions, quats, cfg, mesh=mesh, dtype=jnp.float64,
        window=3, local_capacity=1 << 10,
    )
    bmax = int(np.asarray(stats["batch_n_bricks_max"]).max())
    lmax = int(np.asarray(stats["batch_n_lanes_max"]).max())
    need = np.asarray(stats["batch_n_need_max"]).reshape(-1, 3).max(axis=1)
    cold = int(need[0]) + 8
    warm = max(int(need[1:].max()) + 8, 8) if len(need) > 1 else cold
    assert warm <= cold
    snug, snstats = map_ping_sequence_sharded_brick(
        images, positions, quats, cfg, mesh=mesh, dtype=jnp.float64,
        window=3, local_capacity=1 << 10,
        brick_budget=bmax + 8, lane_budget=lmax + 8,
        insert_budget=[cold, warm],
    )
    assert not np.asarray(snstats["overflowed"]).any()
    a, b = sharded_brick_to_dict(ref), sharded_brick_to_dict(snug)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k


def test_sharded_brick_replay_start_skips_frames(small_cfg):
    """Frames before ``start`` are no-ops: mapping [0..n) in two halves
    through the same scan equals one full pass."""
    from sonar_3d_reconstruction_tpu.ops.backproject import build_fan_tables
    from sonar_3d_reconstruction_tpu.parallel.shard_brick import (
        make_window_scan_sharded_brick,
    )
    from sonar_3d_reconstruction_tpu.pipeline import batched_sonar_to_world

    cfg = small_cfg
    images, positions, quats = make_seq(cfg, 4, seed=940)
    mesh = make_mesh()
    tables = build_fan_tables(cfg, cfg.image_height, cfg.image_width)
    T = batched_sonar_to_world(positions, quats, cfg)

    scan = make_window_scan_sharded_brick(
        mesh, tables, cfg, jnp.float64, "space", 4096, 2,
    )
    full = init_sharded_brick_grid(mesh, 1 << 10, jnp.float64)
    full, _ = scan(full, images, T, 0)

    # second run: windows dispatched from scratch but frames < 2 masked off
    half = init_sharded_brick_grid(mesh, 1 << 10, jnp.float64)
    half, _ = scan(half, images[:2], T[:2], 0)
    # replay the tail with start=2 over the full stack
    half, _ = scan(half, images, T, 2)
    a, b = sharded_brick_to_dict(full), sharded_brick_to_dict(half)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k


def test_sharded_brick_checkpoint_roundtrip(tmp_path, small_cfg):
    """A sharded-brick map snapshots through io/checkpoint and restores
    into a SINGLE-chip brick grid holding the identical voxel set."""
    from sonar_3d_reconstruction_tpu.io.checkpoint import (
        load_map_brick,
        save_map,
    )

    cfg = small_cfg
    images, positions, quats = make_seq(cfg, 4, seed=950)
    mesh = make_mesh()
    sh, _ = map_ping_sequence_sharded_brick(
        images, positions, quats, cfg, mesh=mesh, dtype=jnp.float64,
        window=2, local_capacity=1 << 10,
    )
    path = str(tmp_path / "sharded.npz")
    save_map(path, sh, cfg)
    restored, rcfg = load_map_brick(path, dtype=jnp.float64)
    assert rcfg.voxel_resolution == cfg.voxel_resolution
    a = sharded_brick_to_dict(sh)
    b = brick_state_to_dict(restored)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k
    smin, smax = sharded_brick_bounds(sh)
    np.testing.assert_array_equal(smin, np.asarray(restored.min_bounds))
    np.testing.assert_array_equal(smax, np.asarray(restored.max_bounds))


def test_sharded_restore_empty_map(tmp_path, small_cfg):
    """An empty snapshot restores into an empty sharded grid."""
    from sonar_3d_reconstruction_tpu.io.checkpoint import (
        load_map_sharded_brick,
        save_map,
    )
    from sonar_3d_reconstruction_tpu.grid.brick import init_brick_grid

    path = str(tmp_path / "empty.npz")
    save_map(path, init_brick_grid(1 << 8, jnp.float64), small_cfg)
    restored, _ = load_map_sharded_brick(path, mesh=make_mesh(),
                                         dtype=jnp.float64)
    assert int(np.asarray(restored.used).sum()) == 0
    assert sharded_brick_to_dict(restored) == {}


def test_sharded_frames_submesh_sizes(small_cfg):
    """The frame-parallel engine is exact on meshes smaller than the
    device count (S=2 and S=4 of the 8 virtual devices)."""
    import jax
    from jax.sharding import Mesh

    from sonar_3d_reconstruction_tpu.parallel.shard_frames import (
        map_ping_sequence_sharded_frames,
    )
    from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence

    cfg = small_cfg
    images, positions, quats = make_seq(cfg, 4, seed=970)
    single, _ = map_ping_sequence(
        images, positions, quats, cfg, backend="brick", dtype=jnp.float64,
        window=4,
    )
    want = brick_state_to_dict(single)
    for S in (2, 4):
        mesh = Mesh(np.asarray(jax.devices()[:S]), ("space",))
        sh, _ = map_ping_sequence_sharded_frames(
            images, positions, quats, cfg, mesh=mesh, dtype=jnp.float64,
            window=4, local_capacity=1 << 10,
        )
        got = sharded_brick_to_dict(sh)
        assert got.keys() == want.keys(), S
        for k in got:
            assert got[k] == want[k], (S, k)


def test_sharded_restore_resumes_multichip_exactly(tmp_path, small_cfg):
    """load_map_sharded_brick deals a snapshot's voxels to their owner
    shards; resuming the remaining pings on the restored state must match
    the uninterrupted sharded run bit-for-bit — including when the
    snapshot was saved from the single-chip HASH backend."""
    from sonar_3d_reconstruction_tpu.io.checkpoint import (
        load_map_sharded_brick,
        save_map,
    )
    from sonar_3d_reconstruction_tpu.parallel.shard_frames import (
        map_ping_sequence_sharded_frames,
    )

    cfg = small_cfg
    images, positions, quats = make_seq(cfg, 6, seed=955)
    mesh = make_mesh()

    full, _ = map_ping_sequence_sharded_frames(
        images, positions, quats, cfg, mesh=mesh, dtype=jnp.float64,
        window=3, local_capacity=1 << 10,
    )
    want = sharded_brick_to_dict(full)

    # interrupt after 3 pings, snapshot, restore sharded, resume
    half, _ = map_ping_sequence_sharded_frames(
        images[:3], positions[:3], quats[:3], cfg, mesh=mesh,
        dtype=jnp.float64, window=3, local_capacity=1 << 10,
    )
    path = str(tmp_path / "resume.npz")
    save_map(path, half, cfg)
    restored, rcfg = load_map_sharded_brick(path, mesh=mesh, dtype=jnp.float64)
    assert rcfg.voxel_resolution == cfg.voxel_resolution
    assert int(np.asarray(restored.used).sum()) == len(
        sharded_brick_to_dict(half)
    )
    resumed, _ = map_ping_sequence_sharded_frames(
        images[3:], positions[3:], quats[3:], cfg, mesh=mesh,
        state=restored, dtype=jnp.float64, window=3,
    )
    got = sharded_brick_to_dict(resumed)
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == want[k], k

    # cross-backend: a hash-saved snapshot restores into the sharded grid
    from sonar_3d_reconstruction_tpu.pipeline import map_ping_sequence

    hstate, _ = map_ping_sequence(
        images[:3], positions[:3], quats[:3], cfg, backend="hash",
        dtype=jnp.float64, window=3,
    )
    hpath = str(tmp_path / "hash.npz")
    save_map(hpath, hstate, cfg)
    hrestored, _ = load_map_sharded_brick(hpath, mesh=mesh, dtype=jnp.float64)
    hr = sharded_brick_to_dict(hrestored)
    hh = sharded_brick_to_dict(restored)
    assert hr.keys() == hh.keys()
    for k in hr:
        assert hr[k] == hh[k]
