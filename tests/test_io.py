"""I/O stack: image decode, PointCloud2 bytes, time sync, bag roundtrip,
map checkpointing."""

import struct

import numpy as np
import pytest

from sonar_3d_reconstruction_tpu.io.bag import (
    BagReader,
    ImageMsg,
    OdometryMsg,
    decode_image_msg,
    decode_odometry_msg,
    encode_image_msg,
    encode_odometry_msg,
    write_synthetic_bag,
)
from sonar_3d_reconstruction_tpu.io.image import UnsupportedEncoding, decode_image
from sonar_3d_reconstruction_tpu.io.pointcloud import (
    classified_markers,
    parse_pointcloud2,
    serialize_pointcloud2,
)
from sonar_3d_reconstruction_tpu.io.timesync import ApproximateTimeSync, pair_streams

from conftest import synthetic_ping


# ---------------------------------------------------------------------------
# image decode (reference node:302-316)
# ---------------------------------------------------------------------------

def test_decode_mono8():
    img = synthetic_ping(20, 16, seed=1)
    out = decode_image(img.tobytes(), 20, 16, "mono8")
    np.testing.assert_array_equal(out, img)


def test_decode_mono16_scales_to_uint8():
    img16 = (synthetic_ping(10, 8, seed=2).astype(np.uint16)) * 256 + 7
    out = decode_image(img16.astype("<u2").tobytes(), 10, 8, "mono16")
    np.testing.assert_array_equal(out, (img16 / 256).astype(np.uint8))


def test_decode_row_padding():
    img = synthetic_ping(6, 5, seed=3)
    padded = np.zeros((6, 8), np.uint8)
    padded[:, :5] = img
    out = decode_image(padded.tobytes(), 6, 5, "mono8", step=8)
    np.testing.assert_array_equal(out, img)


def test_decode_rejects_unknown_encoding():
    with pytest.raises(UnsupportedEncoding):
        decode_image(b"\x00" * 12, 2, 2, "rgb8")


# ---------------------------------------------------------------------------
# PointCloud2 bytes (reference node:406-443 layout)
# ---------------------------------------------------------------------------

def test_pointcloud2_byte_layout_matches_struct_pack():
    pts = np.array([[1.0, -2.0, 3.5], [0.25, 0.5, -0.125]])
    probs = np.array([0.7, 0.9])
    msg = serialize_pointcloud2(pts, probs)
    # the reference packs each point with struct.pack('ffff', ...) (node:437-442)
    expect = b"".join(
        struct.pack("<ffff", *p, i) for p, i in zip(pts, probs)
    )
    assert msg["data"] == expect
    assert msg["point_step"] == 16
    assert msg["width"] == 2 and msg["height"] == 1
    assert [f["name"] for f in msg["fields"]] == ["x", "y", "z", "intensity"]
    rp, ri = parse_pointcloud2(msg)
    np.testing.assert_allclose(rp, pts, rtol=1e-6)
    np.testing.assert_allclose(ri, probs, rtol=1e-6)


def test_pointcloud2_empty():
    msg = serialize_pointcloud2(np.empty((0, 3)), np.empty(0))
    assert msg["width"] == 0 and msg["data"] == b""


def test_classified_markers_styles():
    classified = {
        "occupied": (np.array([[1.0, 2.0, 3.0]]), np.array([0.9])),
        "free": (np.empty((0, 3)), np.empty(0)),
        "unknown": (np.array([[0.0, 0.0, 0.0]]), np.array([0.5])),
    }
    markers = classified_markers(classified, 0.15)
    assert len(markers) == 3
    occ = markers[0]
    assert occ["color"] == {"r": 1.0, "g": 0.0, "b": 0.0, "a": 0.8}
    assert occ["scale"]["x"] == 0.15
    assert occ["type"] == 6  # CUBE_LIST
    assert markers[1]["points"].shape == (0, 3)


# ---------------------------------------------------------------------------
# approximate time sync (reference node:191-212 semantics)
# ---------------------------------------------------------------------------

def test_timesync_pairs_within_slop():
    pairs = []
    s = ApproximateTimeSync(lambda a, b: pairs.append((a, b)), slop=0.1)
    for i in range(5):
        s.add_ping(f"ping{i}", i * 1.0)
        s.add_pose(f"pose{i}", i * 1.0 + 0.03)
    s.flush()
    assert pairs == [(f"ping{i}", f"pose{i}") for i in range(5)]


def test_timesync_drops_beyond_slop():
    pairs = []
    s = ApproximateTimeSync(lambda a, b: pairs.append((a, b)), slop=0.1)
    s.add_ping("p0", 0.0)
    s.add_pose("q_far", 0.5)   # 0.5s away: never pairable
    s.add_ping("p1", 0.52)
    s.add_pose("q1", 0.55)
    s.flush()
    assert ("p0", "q_far") not in pairs
    assert ("p1", "q1") in pairs or ("p1", "q_far") in pairs


def test_timesync_queue_bound():
    pairs = []
    s = ApproximateTimeSync(lambda a, b: pairs.append((a, b)), queue_size=3, slop=0.01)
    for i in range(10):
        s.add_ping(i, float(i))  # no poses at all
    assert len(s.queues[0]) <= 3
    assert s.dropped >= 7


def test_pair_streams_offline():
    ping_t = np.array([0.0, 1.0, 2.0, 3.0])
    pose_t = np.array([0.02, 1.5, 2.95, 3.04])
    pairs = pair_streams(ping_t, pose_t, slop=0.1)
    assert (0, 0) in pairs
    # faithful ATS: ping 3.0 fires on arrival with the already-queued pose
    # at 2.95 (delta 0.05) — the closer pose at 3.04 has not arrived yet
    assert (3, 2) in pairs
    got_pings = [i for i, _ in pairs]
    assert 1 not in got_pings  # nothing within 0.1 of t=1.0


# -- adversarial ATS boundary cases (message_filters parity) ---------------

def test_timesync_exact_slop_never_fires():
    """Spread exactly == slop survives the candidate scan but fails the
    strict < slop spread check (message_filters behavior)."""
    pairs = []
    s = ApproximateTimeSync(lambda a, b: pairs.append((a, b)), slop=0.5)
    s.add_ping("p", 1.0)
    s.add_pose("q", 1.5)   # |delta| == slop exactly (both representable)
    assert pairs == []
    s.add_pose("q2", 1.25)  # strictly inside -> fires with the queued ping
    assert pairs == [("p", "q2")]


def test_timesync_out_of_order_arrivals():
    """A late-arriving earlier-stamped pose still pairs with a queued ping
    (no head dropping — messages only leave by pairing or eviction)."""
    pairs = []
    s = ApproximateTimeSync(lambda a, b: pairs.append((a, b)), slop=0.1)
    s.add_ping("p0", 10.0)
    s.add_pose("q_future", 10.5)   # out of slop; stays queued
    s.add_pose("q_late", 9.95)     # arrives late, stamped before p0
    assert pairs == [("p0", "q_late")]
    # the far pose is still queued and can pair with a matching ping later
    s.add_ping("p1", 10.48)
    assert pairs[-1] == ("p1", "q_future")


def test_timesync_eviction_removes_smallest_stamp():
    """queue_size eviction removes the MINIMUM stamp, not the oldest
    arrival (message_filters deletes min(queue))."""
    pairs = []
    s = ApproximateTimeSync(
        lambda a, b: pairs.append((a, b)), queue_size=2, slop=0.05
    )
    s.add_ping("p_mid", 5.0)
    s.add_ping("p_old", 1.0)   # arrives later but stamped earliest
    s.add_ping("p_new", 9.0)   # exceeds queue_size -> evicts stamp 1.0
    assert sorted(s.queues[0]) == [5.0, 9.0]
    s.add_pose("q", 1.0)       # would only match the evicted ping
    assert pairs == []


def test_timesync_equal_stamp_overwrites():
    """A message with an identical stamp replaces the queued one (the
    upstream queue is a stamp-keyed dict)."""
    pairs = []
    s = ApproximateTimeSync(lambda a, b: pairs.append((a, b)), slop=0.1)
    s.add_ping("first", 2.0)
    s.add_ping("second", 2.0)
    s.add_pose("q", 2.01)
    assert pairs == [("second", "q")]


def test_timesync_nearest_candidate_wins():
    """On arrival the minimum-|delta| queued partner is chosen, not the
    oldest one."""
    pairs = []
    s = ApproximateTimeSync(lambda a, b: pairs.append((a, b)), slop=0.1)
    s.add_pose("q_far", 3.00)
    s.add_pose("q_near", 3.06)
    s.add_ping("p", 3.08)
    assert pairs == [("p", "q_near")]
    # q_far remains queued
    assert 3.00 in s.queues[1]


# ---------------------------------------------------------------------------
# CDR + rosbag2 roundtrip
# ---------------------------------------------------------------------------

def test_image_msg_cdr_roundtrip():
    img = synthetic_ping(30, 24, seed=4)
    m = ImageMsg(
        stamp=1700000000.125,
        frame_id="sonar_link",
        height=30,
        width=24,
        encoding="mono8",
        is_bigendian=False,
        step=24,
        data=img.tobytes(),
    )
    out = decode_image_msg(encode_image_msg(m))
    assert out.height == 30 and out.width == 24
    assert out.encoding == "mono8"
    assert out.frame_id == "sonar_link"
    assert abs(out.stamp - m.stamp) < 1e-6
    np.testing.assert_array_equal(
        np.frombuffer(out.data, np.uint8).reshape(30, 24), img
    )


def test_odometry_msg_cdr_roundtrip():
    m = OdometryMsg(
        stamp=1700000001.5,
        frame_id="camera_init",
        child_frame_id="body",
        position=np.array([1.5, -2.25, 0.75]),
        orientation=np.array([0.0, 0.0, 0.7071, 0.7071]),
    )
    out = decode_odometry_msg(encode_odometry_msg(m))
    assert out.child_frame_id == "body"
    np.testing.assert_allclose(out.position, m.position)
    np.testing.assert_allclose(out.orientation, m.orientation)
    assert abs(out.stamp - m.stamp) < 1e-6


def test_synthetic_bag_roundtrip(tmp_path):
    n = 6
    images = np.stack([synthetic_ping(40, 32, seed=10 + i) for i in range(n)])
    positions = np.cumsum(np.full((n, 3), 0.1), axis=0)
    quats = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))
    path = str(tmp_path / "synthetic.db3")
    write_synthetic_bag(path, images, positions, quats)

    with BagReader(path) as bag:
        names = bag.topic_names()
        assert "/sensor/sonar/oculus/m750d/image" in names
        assert "/fast_lio/odometry" in names
        imgs, odoms = [], []
        for topic, ts, msg in bag.messages():
            (imgs if isinstance(msg, ImageMsg) else odoms).append(msg)
    assert len(imgs) == n and len(odoms) == n
    np.testing.assert_array_equal(
        np.frombuffer(imgs[2].data, np.uint8).reshape(40, 32), images[2]
    )
    np.testing.assert_allclose(odoms[3].position, positions[3])


# ---------------------------------------------------------------------------
# checkpoint
# ---------------------------------------------------------------------------

def test_map_checkpoint_roundtrip(tmp_path, small_cfg):
    import jax.numpy as jnp

    from sonar_3d_reconstruction_tpu.grid.hash import EMPTY
    from sonar_3d_reconstruction_tpu.io.checkpoint import load_map, save_map
    from sonar_3d_reconstruction_tpu.models import SonarMapper

    m = SonarMapper(small_cfg, initial_capacity=1 << 12, dtype=jnp.float64)
    img = synthetic_ping(small_cfg.image_height, small_cfg.image_width, seed=42)
    m.process_sonar_image(img, [0, 0, 0], [0, 0, 0, 1])

    path = str(tmp_path / "map.npz")
    save_map(path, m.state, m.cfg)
    state, cfg = load_map(path, dtype=jnp.float64)
    assert cfg.voxel_resolution == small_cfg.voxel_resolution

    def to_dict(st):
        keys = np.asarray(st.keys)
        lo = np.asarray(st.log_odds)
        mask = keys[:, 0] != EMPTY
        return {tuple(k): v for k, v in zip(keys[mask], lo[mask])}

    a, b = to_dict(m.state), to_dict(state)
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


# ---------------------------------------------------------------------------
# debug visualization (reference show_opencv_visualization, node:249-292)
# ---------------------------------------------------------------------------

def test_threshold_overlay(small_cfg):
    from sonar_3d_reconstruction_tpu.io.debugviz import threshold_overlay

    img = np.zeros((10, 6), np.uint8)
    img[4, 2] = 200  # single bright return in column 2
    rgb = threshold_overlay(img, small_cfg)
    assert rgb.shape == (10, 6, 3)
    assert tuple(rgb[4, 2]) == (0, 255, 0)  # first hit marked green
    assert (rgb[:, 0] == 0).all()  # empty column untouched


def test_load_bag_sequence(tmp_path):
    """Offline loader (native when available, python fallback) pairs and
    decodes the whole bag into dense arrays."""
    from sonar_3d_reconstruction_tpu.io.bag import load_bag_sequence

    n = 5
    images = np.stack([synthetic_ping(30, 20, seed=20 + i) for i in range(n)])
    positions = np.cumsum(np.full((n, 3), 0.2), axis=0)
    quats = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))
    path = str(tmp_path / "seq.db3")
    write_synthetic_bag(path, images, positions, quats, odom_jitter=0.05)

    for use_native in (True, False):
        imgs, pos, qs, stamps = load_bag_sequence(path, use_native=use_native)
        assert len(imgs) == n
        np.testing.assert_array_equal(imgs, images)
        np.testing.assert_allclose(pos, positions)
        np.testing.assert_allclose(qs, quats)
        assert (np.diff(stamps) > 0).all()


# ---------------------------------------------------------------------------
# mcap container
# ---------------------------------------------------------------------------

def test_mcap_roundtrip(tmp_path):
    from sonar_3d_reconstruction_tpu.io.bag import IMAGE_TYPE, ODOMETRY_TYPE
    from sonar_3d_reconstruction_tpu.io.mcap import McapReader, McapWriter, open_bag

    n = 4
    images = np.stack([synthetic_ping(20, 16, seed=30 + i) for i in range(n)])
    path = str(tmp_path / "rec.mcap")
    with McapWriter(path) as w:
        w.add_topic("/sensor/sonar/oculus/m750d/image", IMAGE_TYPE)
        w.add_topic("/fast_lio/odometry", ODOMETRY_TYPE)
        for i in range(n):
            t = 500.0 + i
            w.write(
                "/sensor/sonar/oculus/m750d/image", t,
                ImageMsg(t, "sonar_link", 20, 16, "mono8", False, 16,
                         images[i].tobytes()),
            )
            w.write(
                "/fast_lio/odometry", t,
                OdometryMsg(t, "camera_init", "body",
                            np.array([i * 0.1, 0.0, 0.0]),
                            np.array([0.0, 0.0, 0.0, 1.0])),
            )

    with McapReader(path) as r:
        names = r.topic_names()
        assert names["/fast_lio/odometry"] == ODOMETRY_TYPE
        imgs, odoms = [], []
        for topic, ts, msg in r.messages():
            (imgs if isinstance(msg, ImageMsg) else odoms).append(msg)
    assert len(imgs) == n and len(odoms) == n
    np.testing.assert_array_equal(
        np.frombuffer(imgs[1].data, np.uint8).reshape(20, 16), images[1]
    )
    # open_bag sniffs the container
    assert isinstance(open_bag(path), McapReader)


@pytest.mark.parametrize("compression", ["zstd", "lz4"])
def test_mcap_compressed_chunk_roundtrip(tmp_path, compression):
    """Compressed-chunk mcap files (rosbag2's default is zstd) roundtrip
    through the native codecs (VERDICT r1 item 8)."""
    from sonar_3d_reconstruction_tpu.io import native
    from sonar_3d_reconstruction_tpu.io.bag import IMAGE_TYPE, ODOMETRY_TYPE
    from sonar_3d_reconstruction_tpu.io.mcap import McapReader, McapWriter

    if not (native.available() and native.codec_available(compression)):
        pytest.skip(f"native {compression} codec unavailable")

    n = 5
    images = np.stack([synthetic_ping(20, 16, seed=60 + i) for i in range(n)])
    path = str(tmp_path / f"rec_{compression}.mcap")
    # small chunk_size so the file exercises multiple chunk records
    with McapWriter(path, chunk_compression=compression, chunk_size=512) as w:
        w.add_topic("/sensor/sonar/oculus/m750d/image", IMAGE_TYPE)
        w.add_topic("/fast_lio/odometry", ODOMETRY_TYPE)
        for i in range(n):
            t = 900.0 + i
            w.write(
                "/sensor/sonar/oculus/m750d/image", t,
                ImageMsg(t, "sonar_link", 20, 16, "mono8", False, 16,
                         images[i].tobytes()),
            )
            w.write(
                "/fast_lio/odometry", t,
                OdometryMsg(t, "camera_init", "body",
                            np.array([i * 0.1, 0.0, 0.0]),
                            np.array([0.0, 0.0, 0.0, 1.0])),
            )
    # structurally: all messages live inside chunk records, none at top level
    from sonar_3d_reconstruction_tpu.io.mcap import (
        MAGIC, OP_CHUNK, OP_MESSAGE, _records,
    )

    raw = open(path, "rb").read()
    top_ops = [op for op, _ in _records(memoryview(raw)[len(MAGIC):])]
    assert top_ops.count(OP_CHUNK) >= 2  # chunk_size=512 forces several
    assert OP_MESSAGE not in top_ops

    with McapReader(path) as r:
        assert r.topic_names()["/fast_lio/odometry"] == ODOMETRY_TYPE
        imgs, odoms = [], []
        for topic, ts, msg in r.messages():
            (imgs if isinstance(msg, ImageMsg) else odoms).append(msg)
    assert len(imgs) == n and len(odoms) == n
    for i in range(n):
        np.testing.assert_array_equal(
            np.frombuffer(imgs[i].data, np.uint8).reshape(20, 16), images[i]
        )
    np.testing.assert_allclose(odoms[3].position, [0.3, 0.0, 0.0])


def test_mcap_corrupt_compressed_chunk_rejected(tmp_path):
    """A zstd chunk whose body is garbage must raise, not silently drop."""
    from sonar_3d_reconstruction_tpu.io import native
    from sonar_3d_reconstruction_tpu.io.bag import IMAGE_TYPE
    from sonar_3d_reconstruction_tpu.io.mcap import McapReader, McapWriter

    if not (native.available() and native.codec_available("zstd")):
        pytest.skip("native zstd codec unavailable")

    path = str(tmp_path / "corrupt.mcap")
    with McapWriter(path, chunk_compression="zstd") as w:
        w.add_topic("/sensor/sonar/oculus/m750d/image", IMAGE_TYPE)
        img = synthetic_ping(20, 16, seed=77)
        w.write(
            "/sensor/sonar/oculus/m750d/image", 1000.0,
            ImageMsg(1000.0, "s", 20, 16, "mono8", False, 16, img.tobytes()),
        )
    raw = bytearray(open(path, "rb").read())
    # flip bytes in the zstd frame body (skip the 4-byte zstd magic after the
    # chunk header fields + "zstd" string + u64 length)
    zmagic = raw.find(b"\x28\xb5\x2f\xfd")
    assert zmagic > 0
    for k in range(zmagic + 8, min(zmagic + 24, len(raw))):
        raw[k] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises((ValueError, NotImplementedError)):
        with McapReader(path) as r:
            list(r.messages())


def test_mcap_stream_and_offline_paths(tmp_path, small_cfg):
    """An mcap recording maps identically through the streaming stack and
    the offline loader."""
    import jax.numpy as jnp

    from sonar_3d_reconstruction_tpu.io.bag import (
        IMAGE_TYPE, ODOMETRY_TYPE, load_bag_sequence,
    )
    from sonar_3d_reconstruction_tpu.io.mcap import McapWriter
    from sonar_3d_reconstruction_tpu.stream import StreamingMapper

    cfg = small_cfg
    n = 4
    images = np.stack(
        [synthetic_ping(cfg.image_height, cfg.image_width, seed=40 + i)
         for i in range(n)]
    )
    positions = np.cumsum(np.full((n, 3), 0.1), axis=0)
    quats = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))
    path = str(tmp_path / "rec.mcap")
    with McapWriter(path) as w:
        w.add_topic("/sensor/sonar/oculus/m750d/image", IMAGE_TYPE)
        w.add_topic("/fast_lio/odometry", ODOMETRY_TYPE)
        for i in range(n):
            t = 700.0 + i
            w.write(
                "/sensor/sonar/oculus/m750d/image", t,
                ImageMsg(t, "s", cfg.image_height, cfg.image_width, "mono8",
                         False, cfg.image_width, images[i].tobytes()),
            )
            w.write(
                "/fast_lio/odometry", t,
                OdometryMsg(t, "camera_init", "body", positions[i], quats[i]),
            )

    sm = StreamingMapper(cfg, chunk_size=4, initial_capacity=1 << 13,
                         dtype=jnp.float64)
    stats = sm.run_bag(path)
    assert stats.pairs == n

    imgs, pos, qs, stamps = load_bag_sequence(path)
    np.testing.assert_array_equal(imgs, images)
    np.testing.assert_allclose(pos, positions)


def test_pair_streams_unsorted_inputs():
    """Both pairing backends must handle unsorted stamp streams (mcap file
    order) identically to the sorted case."""
    rng = np.random.default_rng(5)
    ping_t = rng.uniform(0, 50, 60)      # deliberately unsorted
    pose_t = rng.uniform(0, 50, 55)
    a = pair_streams(ping_t, pose_t, slop=0.3)
    # equivalent to pairing the sorted streams then mapping indices back
    ps, qs = np.argsort(ping_t), np.argsort(pose_t)
    b_sorted = pair_streams(ping_t[ps], pose_t[qs], slop=0.3)
    b = sorted((int(ps[i]), int(qs[j])) for i, j in b_sorted)
    assert sorted(a) == b
