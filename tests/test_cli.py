"""CLI end-to-end: make-bag -> map-bag (streaming + offline) in-process.

Mirrors the user commands from README Quick start; runs a small geometry
so the CPU programs compile in seconds.  Streaming (windowed chunks) and
the offline batch path must agree on the final cloud.
"""

import json

import numpy as np

from sonar_3d_reconstruction_tpu.cli import main
from sonar_3d_reconstruction_tpu.io.checkpoint import load_map


def run(capsys, *argv):
    rc = main(list(argv))
    out = capsys.readouterr().out
    assert rc == 0, (argv, out)
    return out


def test_cli_make_map_roundtrip(tmp_path, capsys):
    bag = str(tmp_path / "survey.db3")
    run(capsys, "make-bag", bag, "--pings", "6", "--range-bins", "60",
        "--bearing-bins", "48")

    common = [
        "--param", "max_range=5.0",
        "--param", "voxel_resolution=0.1",
    ]
    cloud_s = str(tmp_path / "stream.pc2")
    map_s = str(tmp_path / "stream.npz")
    out = run(capsys, "map-bag", bag, *common, "--chunk", "4",
              "--window", "2", "--save-cloud", cloud_s, "--save-map", map_s)
    stats = json.loads(out.splitlines()[-1])
    assert stats["frames_mapped"] == 6

    cloud_o = str(tmp_path / "offline.pc2")
    out = run(capsys, "map-bag", bag, *common, "--offline", "--window", "2",
              "--save-cloud", cloud_o)
    stats_o = json.loads(out.splitlines()[-1])
    assert stats_o["pairs"] == 6

    # streaming and offline replay the same frame set -> identical clouds
    a = np.fromfile(cloud_s, np.float32).reshape(-1, 4)
    b = np.fromfile(cloud_o, np.float32).reshape(-1, 4)
    a = a[np.lexsort(a.T)]
    b = b[np.lexsort(b.T)]
    assert a.shape == b.shape and a.shape[0] > 0
    np.testing.assert_array_equal(a, b)

    # the saved checkpoint restores to the same number of voxels
    state, meta = load_map(map_s)
    assert int(np.asarray(state.used)) > 0


def test_cli_offline_brick_sharded_matches_brick(tmp_path, capsys):
    """--backend brick-sharded runs the frame-parallel engine on the CPU
    mesh in BOTH modes (--offline batch and streaming chunks) and must
    produce the identical cloud/snapshot as the single-chip brick
    backend."""
    bag = str(tmp_path / "sh.db3")
    run(capsys, "make-bag", bag, "--pings", "5", "--range-bins", "60",
        "--bearing-bins", "48")
    common = ["--param", "max_range=5.0", "--param", "voxel_resolution=0.1",
              "--offline", "--window", "2"]

    cloud_b = str(tmp_path / "brick.pc2")
    out_b = run(capsys, "map-bag", bag, *common, "--backend", "brick",
                "--save-cloud", cloud_b)
    cloud_s = str(tmp_path / "sharded.pc2")
    map_s = str(tmp_path / "sharded.npz")
    out_s = run(capsys, "map-bag", bag, *common, "--backend", "brick-sharded",
                "--save-cloud", cloud_s, "--save-map", map_s)

    sb = json.loads(out_b.splitlines()[-1])
    ss = json.loads(out_s.splitlines()[-1])
    assert ss["pairs"] == sb["pairs"] == 5
    assert ss["num_voxels"] == sb["num_voxels"]
    a = np.fromfile(cloud_b, np.float32).reshape(-1, 4)
    b = np.fromfile(cloud_s, np.float32).reshape(-1, 4)
    np.testing.assert_array_equal(a[np.lexsort(a.T)], b[np.lexsort(b.T)])

    # layout-independent snapshot restores with the full voxel count
    state, _ = load_map(map_s)
    assert int(np.asarray(state.used).sum()) == ss["num_voxels"]

    # the STREAMING runtime runs the same multi-chip backend (host-gated
    # capped tables, padded final chunk masked via stop) — same cloud
    cloud_st = str(tmp_path / "sharded_stream.pc2")
    out_st = run(capsys, "map-bag", bag, "--param", "max_range=5.0",
                 "--param", "voxel_resolution=0.1", "--chunk", "4",
                 "--window", "2", "--backend", "brick-sharded",
                 "--save-cloud", cloud_st)
    st = json.loads(out_st.splitlines()[-1])
    assert st["frames_mapped"] == 5
    c = np.fromfile(cloud_st, np.float32).reshape(-1, 4)
    np.testing.assert_array_equal(a[np.lexsort(a.T)], c[np.lexsort(c.T)])


def test_cli_query_saved_map(tmp_path, capsys):
    bag = str(tmp_path / "q.db3")
    run(capsys, "make-bag", bag, "--pings", "4", "--range-bins", "60",
        "--bearing-bins", "48")
    map_p = str(tmp_path / "q.npz")
    run(capsys, "map-bag", bag, "--param", "max_range=5.0",
        "--param", "voxel_resolution=0.1", "--offline", "--save-map", map_p)

    state, cfg = load_map(map_p)
    from sonar_3d_reconstruction_tpu.grid.hash import extract_occupied_hash
    pts, probs = extract_occupied_hash(state, cfg)
    x, y, z = pts[0]
    out = run(capsys, "query", map_p, f"{x},{y},{z}", "99.0,99.0,99.0")
    rows = [json.loads(l) for l in out.splitlines()]
    assert abs(rows[0]["probability"] - probs[0]) < 1e-6
    assert rows[1]["probability"] == 0.5
