"""Native C++ I/O runtime vs the pure-Python implementations."""

import numpy as np
import pytest

from sonar_3d_reconstruction_tpu.io import native
from sonar_3d_reconstruction_tpu.io.bag import (
    ImageMsg,
    OdometryMsg,
    encode_image_msg,
    encode_odometry_msg,
)
from sonar_3d_reconstruction_tpu.io.pointcloud import serialize_pointcloud2
from sonar_3d_reconstruction_tpu.io.timesync import pair_streams as py_pair

from conftest import synthetic_ping


@pytest.fixture(scope="module", autouse=True)
def built():
    native.build()
    assert native.available()


def test_odometry_decode_batch_matches_python():
    rng = np.random.default_rng(0)
    msgs = [
        OdometryMsg(
            stamp=1700000000.0 + i * 0.5 + 1e-3,
            frame_id="camera_init",
            child_frame_id="body",
            position=rng.normal(size=3),
            orientation=rng.normal(size=4),
        )
        for i in range(20)
    ]
    blobs = [encode_odometry_msg(m) for m in msgs]
    stamps, positions, quats = native.odometry_decode_batch(blobs)
    for i, m in enumerate(msgs):
        assert abs(stamps[i] - m.stamp) < 1e-6
        np.testing.assert_allclose(positions[i], m.position)
        np.testing.assert_allclose(quats[i], m.orientation)


def test_image_decode_batch_mono8():
    imgs = np.stack([synthetic_ping(25, 18, seed=i) for i in range(7)])
    blobs = [
        encode_image_msg(
            ImageMsg(
                stamp=10.0 + i,
                frame_id="sonar_link",
                height=25,
                width=18,
                encoding="mono8",
                is_bigendian=False,
                step=18,
                data=imgs[i].tobytes(),
            )
        )
        for i in range(7)
    ]
    stamps, out = native.image_decode_batch(blobs, 25, 18)
    np.testing.assert_array_equal(out, imgs)
    np.testing.assert_allclose(stamps, 10.0 + np.arange(7), atol=1e-6)


def test_image_decode_batch_mono16_scaling():
    img16 = (synthetic_ping(12, 10, seed=3).astype(np.uint16)) * 256 + 13
    blob = encode_image_msg(
        ImageMsg(
            stamp=5.25,
            frame_id="s",
            height=12,
            width=10,
            encoding="mono16",
            is_bigendian=False,
            step=20,
            data=img16.astype("<u2").tobytes(),
        )
    )
    _, out = native.image_decode_batch([blob], 12, 10)
    np.testing.assert_array_equal(out[0], (img16 / 256).astype(np.uint8))


def test_image_decode_rejects_wrong_geometry():
    blob = encode_image_msg(
        ImageMsg(2.0, "s", 4, 4, "mono8", False, 4, bytes(16))
    )
    with pytest.raises(ValueError):
        native.image_decode_batch([blob], 8, 8)


def test_pair_streams_matches_python():
    rng = np.random.default_rng(1)
    ping_t = np.sort(rng.uniform(0, 100, 200))
    pose_t = np.sort(rng.uniform(0, 100, 180))
    a = py_pair(ping_t, pose_t, slop=0.25)
    b = native.pair_streams(ping_t, pose_t, slop=0.25)
    assert a == b


def test_pack_xyzi_matches_python():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(100, 3))
    intens = rng.uniform(size=100)
    msg = serialize_pointcloud2(pts, intens)
    assert native.pack_xyzi(pts, intens) == msg["data"]


def test_native_pair_streams_unsorted_matches_python():
    rng = np.random.default_rng(9)
    ping_t = rng.uniform(0, 80, 120)
    pose_t = rng.uniform(0, 80, 110)
    assert sorted(native.pair_streams(ping_t, pose_t, 0.2)) == sorted(
        py_pair(ping_t, pose_t, 0.2)
    )
