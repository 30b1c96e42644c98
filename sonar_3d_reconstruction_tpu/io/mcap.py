"""Minimal mcap container support (read/write) for bag replay.

rosbag2 records either sqlite3 (io/bag.py) or mcap; this reads the subset
the mapper needs — CDR-encoded ``sensor_msgs/msg/Image`` and
``nav_msgs/msg/Odometry`` messages — from the public mcap format
(magic + [opcode u8][length u64][payload] records; strings are u32-length
prefixed; Message payload = channel_id u16, sequence u32, log_time u64,
publish_time u64, data).

Uncompressed files and uncompressed chunks are fully supported;
lz4/zstd-compressed chunks are decompressed when the optional codecs are
importable and rejected with a clear error otherwise (this image ships
neither).  The writer emits chunkless uncompressed files — used as the
synthetic-fixture generator and for interop tests.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from sonar_3d_reconstruction_tpu.io.bag import (
    IMAGE_TYPE,
    ODOMETRY_TYPE,
    ImageMsg,
    OdometryMsg,
    decode_image_msg,
    decode_odometry_msg,
    encode_image_msg,
    encode_odometry_msg,
)

MAGIC = b"\x89MCAP0\r\n"

OP_HEADER = 0x01
OP_FOOTER = 0x02
OP_SCHEMA = 0x03
OP_CHANNEL = 0x04
OP_MESSAGE = 0x05
OP_CHUNK = 0x06
OP_DATA_END = 0x0F


def _read_str(buf: memoryview, pos: int) -> Tuple[str, int]:
    (n,) = struct.unpack_from("<I", buf, pos)
    s = bytes(buf[pos + 4 : pos + 4 + n]).decode("utf-8")
    return s, pos + 4 + n


def _records(buf: memoryview) -> Iterator[Tuple[int, memoryview]]:
    pos = 0
    end = len(buf)
    while pos + 9 <= end:
        op = buf[pos]
        (length,) = struct.unpack_from("<Q", buf, pos + 1)
        if pos + 9 + length > end:
            # a silently clamped record would present a truncated bag as a
            # successfully (but partially) mapped one
            raise ValueError(
                f"truncated mcap record: op=0x{op:02x} at byte {pos} claims "
                f"{length} payload bytes but only {end - pos - 9} remain"
            )
        payload = buf[pos + 9 : pos + 9 + length]
        yield op, payload
        if op == OP_FOOTER:
            return
        pos += 9 + length


class McapReader:
    """Reads Image / Odometry messages from an mcap file."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            data = f.read()
        assert data[: len(MAGIC)] == MAGIC, f"{path} is not an mcap file"
        self._buf = memoryview(data)[len(MAGIC):]
        self._schemas: Dict[int, str] = {}          # schema_id -> type name
        self._channels: Dict[int, Tuple[str, int]] = {}  # chan -> (topic, schema)

    def _handle_meta(self, op: int, payload: memoryview) -> None:
        if op == OP_SCHEMA:
            (sid,) = struct.unpack_from("<H", payload, 0)
            name, _ = _read_str(payload, 2)
            self._schemas[sid] = name
        elif op == OP_CHANNEL:
            (cid, sid) = struct.unpack_from("<HH", payload, 0)
            topic, _ = _read_str(payload, 4)
            self._channels[cid] = (topic, sid)

    def _iter_messages(
        self, buf: memoryview
    ) -> Iterator[Tuple[int, float, bytes]]:
        """Yields (channel_id, log_time_sec, cdr_blob) handling chunks."""
        for op, payload in _records(buf):
            if op in (OP_SCHEMA, OP_CHANNEL):
                self._handle_meta(op, payload)
            elif op == OP_MESSAGE:
                (cid,) = struct.unpack_from("<H", payload, 0)
                (log_time,) = struct.unpack_from("<Q", payload, 6)
                yield cid, log_time * 1e-9, bytes(payload[22:])
            elif op == OP_CHUNK:
                pos = 8 + 8 + 8  # start/end times, uncompressed_size
                (_crc,) = struct.unpack_from("<I", payload, pos)
                pos += 4
                compression, pos = _read_str(payload, pos)
                (rec_len,) = struct.unpack_from("<Q", payload, pos)
                pos += 8
                records = payload[pos : pos + rec_len]
                if compression == "":
                    inner = records
                elif compression == "lz4":
                    try:
                        import lz4.frame  # type: ignore
                    except ImportError as e:
                        raise NotImplementedError(
                            "lz4-compressed mcap chunk; lz4 codec unavailable"
                        ) from e
                    inner = memoryview(lz4.frame.decompress(bytes(records)))
                elif compression == "zstd":
                    try:
                        import zstandard  # type: ignore
                    except ImportError as e:
                        raise NotImplementedError(
                            "zstd-compressed mcap chunk; zstandard unavailable"
                        ) from e
                    inner = memoryview(
                        zstandard.ZstdDecompressor().decompress(bytes(records))
                    )
                else:
                    raise NotImplementedError(
                        f"mcap chunk compression {compression!r}"
                    )
                yield from self._iter_messages(inner)
            elif op == OP_DATA_END:
                return

    def topic_names(self) -> Dict[str, str]:
        # metadata records may appear at top level or inside uncompressed
        # chunks; walk both without decoding message payloads
        def walk(buf: memoryview) -> None:
            for op, payload in _records(buf):
                if op in (OP_SCHEMA, OP_CHANNEL):
                    self._handle_meta(op, payload)
                elif op == OP_CHUNK:
                    pos = 8 + 8 + 8 + 4
                    compression, pos = _read_str(payload, pos)
                    (rec_len,) = struct.unpack_from("<Q", payload, pos)
                    if compression == "":
                        walk(payload[pos + 8 : pos + 8 + rec_len])

        walk(self._buf)
        return {
            topic: self._schemas.get(sid, "?")
            for topic, sid in self._channels.values()
        }

    def raw_messages(
        self, topic_names: Optional[List[str]] = None
    ) -> Iterator[Tuple[str, str, float, bytes]]:
        """Yield (topic, type, log_time_sec, cdr_blob) in file order."""
        for cid, ts, blob in self._iter_messages(self._buf):
            chan = self._channels.get(cid)
            if chan is None:
                continue
            topic, sid = chan
            if topic_names is not None and topic not in topic_names:
                continue
            yield topic, self._schemas.get(sid, "?"), ts, blob

    def messages(
        self, topic_names: Optional[List[str]] = None
    ) -> Iterator[Tuple[str, float, object]]:
        """Yield (topic, log_time_sec, decoded_msg) in file order, decoding
        Image/Odometry only."""
        for topic, typ, ts, blob in self.raw_messages(topic_names):
            if typ == IMAGE_TYPE:
                yield topic, ts, decode_image_msg(blob)
            elif typ == ODOMETRY_TYPE:
                yield topic, ts, decode_odometry_msg(blob)

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class McapWriter:
    """Writes a chunkless uncompressed mcap file (fixtures / interop)."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._f.write(MAGIC)
        self._write(OP_HEADER, self._str("ros2") + self._str("sonar3d-tpu"))
        self._schema_ids: Dict[str, int] = {}
        self._channel_ids: Dict[str, int] = {}

    @staticmethod
    def _str(s: str) -> bytes:
        b = s.encode("utf-8")
        return struct.pack("<I", len(b)) + b

    def _write(self, op: int, payload: bytes) -> None:
        self._f.write(struct.pack("<BQ", op, len(payload)) + payload)

    def add_topic(self, name: str, typ: str) -> int:
        if typ not in self._schema_ids:
            sid = len(self._schema_ids) + 1
            self._schema_ids[typ] = sid
            self._write(
                OP_SCHEMA,
                struct.pack("<H", sid) + self._str(typ) + self._str("ros2msg")
                + struct.pack("<I", 0),
            )
        cid = len(self._channel_ids) + 1
        self._channel_ids[name] = cid
        self._write(
            OP_CHANNEL,
            struct.pack("<HH", cid, self._schema_ids[typ])
            + self._str(name) + self._str("cdr") + struct.pack("<I", 0),
        )
        return cid

    def write(self, topic: str, stamp_sec: float, msg) -> None:
        blob = (
            encode_image_msg(msg)
            if isinstance(msg, ImageMsg)
            else encode_odometry_msg(msg)
        )
        t_ns = int(round(stamp_sec * 1e9))
        self._write(
            OP_MESSAGE,
            struct.pack(
                "<HIQQ", self._channel_ids[topic], 0, t_ns, t_ns
            ) + blob,
        )

    def close(self) -> None:
        self._write(OP_DATA_END, struct.pack("<I", 0))
        # minimal footer: no summary section
        self._write(OP_FOOTER, struct.pack("<QQI", 0, 0, 0))
        self._f.write(MAGIC)
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_bag(path: str):
    """BagReader for .db3/sqlite or McapReader for .mcap (sniffed by magic)."""
    with open(path, "rb") as f:
        head = f.read(len(MAGIC))
    if head == MAGIC:
        return McapReader(path)
    from sonar_3d_reconstruction_tpu.io.bag import BagReader

    return BagReader(path)
