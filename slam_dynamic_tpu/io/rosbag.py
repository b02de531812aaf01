"""Self-contained ROS1 bag (v2.0) reader/writer for offline interop.

The reference ships ROS nodes that consume live image topics
(/root/reference/Examples/ROS/ORB_SLAM2/src/ros_rgbd.cc: synchronized
/camera/rgb/image_raw + /camera/depth_registered/image_raw subscribers,
ros_stereo.cc for stereo pairs). On a displayless TPU host without a ROS
installation, the equivalent workflow is offline: users record those
topics with `rosbag record` and replay the bag here. This module parses
the documented rosbag 2.0 container (http://wiki.ros.org/Bags/Format/2.0)
and the sensor_msgs/Image wire format with no ROS dependency —
uncompressed and bz2 chunks (what `rosbag record` emits by default and
with `--bz2`).

`RosbagRGBD` adapts a bag to the datasets.FramePacket iterator (same
shape as TumRGBD: camera-native uint8 gray / uint16 depth, nearest-
timestamp association), so `io/run.py --dataset rosbag` drives the full
system from a recorded bag.
"""
from __future__ import annotations

import bz2
import os
import struct
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

_OP_MSG = 0x02
_OP_BAGHDR = 0x03
_OP_INDEX = 0x04
_OP_CHUNK = 0x05
_OP_CHUNKINFO = 0x06
_OP_CONN = 0x07

MAGIC = b"#ROSBAG V2.0\n"


def _parse_header(buf: bytes) -> Dict[bytes, bytes]:
    fields = {}
    o = 0
    while o < len(buf):
        (flen,) = struct.unpack_from("<I", buf, o)
        o += 4
        fld = buf[o:o + flen]
        o += flen
        eq = fld.index(b"=")
        fields[fld[:eq]] = fld[eq + 1:]
    return fields


def _emit_header(fields: Dict[bytes, bytes]) -> bytes:
    out = b""
    for k, v in fields.items():
        fld = k + b"=" + v
        out += struct.pack("<I", len(fld)) + fld
    return out


def _read_record(buf: bytes, o: int) -> Tuple[Dict[bytes, bytes], bytes, int]:
    (hlen,) = struct.unpack_from("<I", buf, o)
    hdr = _parse_header(buf[o + 4:o + 4 + hlen])
    o += 4 + hlen
    (dlen,) = struct.unpack_from("<I", buf, o)
    data = buf[o + 4:o + 4 + dlen]
    return hdr, data, o + 4 + dlen


@dataclass
class ImageMsg:
    stamp: float          # header stamp (seconds)
    height: int
    width: int
    encoding: str
    data: np.ndarray      # decoded per encoding (see decode)


def decode_image(raw: bytes) -> ImageMsg:
    """Deserialize a sensor_msgs/Image message body."""
    o = 0
    _seq, secs, nsecs = struct.unpack_from("<III", raw, o)
    o += 12
    (fl,) = struct.unpack_from("<I", raw, o)
    o += 4 + fl                                   # frame_id
    h, w = struct.unpack_from("<II", raw, o)
    o += 8
    (el,) = struct.unpack_from("<I", raw, o)
    o += 4
    enc = raw[o:o + el].decode()
    o += el
    big = raw[o]
    o += 1
    (step,) = struct.unpack_from("<I", raw, o)
    o += 4
    (dl,) = struct.unpack_from("<I", raw, o)
    o += 4
    body = raw[o:o + dl]
    if enc == "mono8":
        img = np.frombuffer(body, np.uint8).reshape(h, step)[:, :w]
    elif enc in ("16UC1", "mono16"):
        dt = ">u2" if big else "<u2"
        img = np.frombuffer(body, dt).reshape(h, step // 2)[:, :w]
        img = img.astype(np.uint16)
    elif enc == "32FC1":
        dt = ">f4" if big else "<f4"
        img = np.frombuffer(body, dt).reshape(h, step // 4)[:, :w]
        img = img.astype(np.float32)
    elif enc in ("rgb8", "bgr8"):
        img = np.frombuffer(body, np.uint8).reshape(h, step)[:, :3 * w]
        img = img.reshape(h, w, 3)
        # luma conversion (both channel orders: weights on G dominate)
        wts = (np.array([0.299, 0.587, 0.114]) if enc == "rgb8"
               else np.array([0.114, 0.587, 0.299]))
        img = np.clip(img @ wts, 0, 255).astype(np.uint8)
    else:
        raise ValueError(f"unsupported image encoding {enc!r}")
    return ImageMsg(secs + nsecs * 1e-9, h, w, enc, img)


class BagReader:
    """Sequential rosbag 2.0 reader: connections + messages, descending
    into none/bz2 chunks (index records are skipped — a full scan is the
    right access pattern for SLAM replay)."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            raw = f.read()
        if not raw.startswith(MAGIC):
            raise ValueError(f"{path}: not a ROS bag v2.0")
        self._raw = raw
        self.connections: Dict[int, Dict[str, str]] = {}
        # pre-scan connections so topics() works before iteration
        for hdr, data, _inside in self._records():
            op = hdr.get(b"op", b"\x00")[0]
            if op == _OP_CONN:
                (cid,) = struct.unpack("<I", hdr[b"conn"])
                ch = _parse_header(data)
                self.connections[cid] = {
                    "topic": ch.get(b"topic", hdr.get(b"topic", b"")).decode(),
                    "type": ch.get(b"type", b"").decode()}

    def _records(self):
        """Yield (header, data, inside_chunk) for every record, chunks
        expanded."""
        o = len(MAGIC)
        raw = self._raw
        while o < len(raw):
            hdr, data, o = _read_record(raw, o)
            op = hdr.get(b"op", b"\x00")[0]
            if op == _OP_CHUNK:
                comp = hdr.get(b"compression", b"none")
                if comp == b"bz2":
                    data = bz2.decompress(data)
                elif comp != b"none":
                    raise ValueError(f"unsupported chunk compression "
                                     f"{comp!r}")
                co = 0
                while co < len(data):
                    chdr, cdata, co = _read_record(data, co)
                    yield chdr, cdata, True
            else:
                yield hdr, data, False

    def topics(self) -> Dict[str, str]:
        return {c["topic"]: c["type"] for c in self.connections.values()}

    def messages(self, topics: Optional[List[str]] = None
                 ) -> Iterator[Tuple[str, float, bytes]]:
        """Yield (topic, record_time_sec, raw_message) in file order."""
        want = set(topics) if topics else None
        for hdr, data, _ in self._records():
            op = hdr.get(b"op", b"\x00")[0]
            if op != _OP_MSG:
                continue
            (cid,) = struct.unpack("<I", hdr[b"conn"])
            conn = self.connections.get(cid)
            if conn is None:
                continue
            topic = conn["topic"]
            if want is not None and topic not in want:
                continue
            secs, nsecs = struct.unpack("<II", hdr[b"time"])
            yield topic, secs + nsecs * 1e-9, data


class BagWriter:
    """Minimal writer (one uncompressed chunk) — enough for tests, for
    converting datasets to bags, and for round-tripping BagReader."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._f.write(MAGIC)
        # bag header record, padded to 4096 (format requirement)
        hdr = _emit_header({b"op": bytes([_OP_BAGHDR]),
                            b"index_pos": struct.pack("<Q", 0),
                            b"conn_count": struct.pack("<I", 0),
                            b"chunk_count": struct.pack("<I", 1)})
        pad = 4096 - len(hdr)
        self._f.write(struct.pack("<I", len(hdr)) + hdr)
        self._f.write(struct.pack("<I", pad) + b" " * pad)
        self._chunk = b""
        self._conns: Dict[str, int] = {}

    def _record(self, fields, data: bytes) -> bytes:
        hdr = _emit_header(fields)
        return (struct.pack("<I", len(hdr)) + hdr
                + struct.pack("<I", len(data)) + data)

    def connection(self, topic: str, msgtype: str) -> int:
        if topic in self._conns:
            return self._conns[topic]
        cid = len(self._conns)
        self._conns[topic] = cid
        conn_hdr = _emit_header({b"topic": topic.encode(),
                                 b"type": msgtype.encode(),
                                 b"md5sum": b"*",
                                 b"message_definition": b""})
        self._chunk += self._record(
            {b"op": bytes([_OP_CONN]),
             b"conn": struct.pack("<I", cid),
             b"topic": topic.encode()}, conn_hdr)
        return cid

    def write_image(self, topic: str, stamp: float, img: np.ndarray):
        img = np.ascontiguousarray(img)
        if img.dtype == np.uint8 and img.ndim == 2:
            enc, step = b"mono8", img.shape[1]
        elif img.dtype == np.uint16 and img.ndim == 2:
            enc, step = b"16UC1", img.shape[1] * 2
        else:
            raise ValueError("write_image supports mono8 / 16UC1")
        cid = self.connection(topic, "sensor_msgs/Image")
        secs = int(stamp)
        nsecs = int(round((stamp - secs) * 1e9))
        body = img.tobytes()
        msg = (struct.pack("<III", 0, secs, nsecs)
               + struct.pack("<I", 0)                       # frame_id ""
               + struct.pack("<II", img.shape[0], img.shape[1])
               + struct.pack("<I", len(enc)) + enc
               + b"\x00" + struct.pack("<I", step)
               + struct.pack("<I", len(body)) + body)
        self._chunk += self._record(
            {b"op": bytes([_OP_MSG]),
             b"conn": struct.pack("<I", cid),
             b"time": struct.pack("<II", secs, nsecs)}, msg)

    def close(self):
        self._f.write(self._record(
            {b"op": bytes([_OP_CHUNK]), b"compression": b"none",
             b"size": struct.pack("<I", len(self._chunk))}, self._chunk))
        self._f.close()


class RosbagRGBD:
    """FramePacket iterator over a recorded RGB-D bag (the offline analog
    of the reference's ros_rgbd.cc ApproximateTime-synchronized
    subscribers): nearest-timestamp association of the gray/rgb topic
    with the depth topic, camera-native dtypes passed through."""

    def __init__(self, path: str,
                 rgb_topic: str = "/camera/rgb/image_raw",
                 depth_topic: str = "/camera/depth_registered/image_raw",
                 max_dt: float = 0.02):
        self.reader = BagReader(path)
        grays, depths = [], []
        for topic, t, raw in self.reader.messages([rgb_topic, depth_topic]):
            msg = decode_image(raw)
            ts = msg.stamp if msg.stamp > 0 else t
            (grays if topic == rgb_topic else depths).append((ts, msg.data))
        self.pairs = []
        dts = np.array([d[0] for d in depths]) if depths else np.zeros(0)
        for ts, g in grays:
            if not len(dts):
                break
            j = int(np.argmin(np.abs(dts - ts)))
            if abs(dts[j] - ts) <= max_dt:
                self.pairs.append((ts, g, depths[j][1]))

    def __len__(self):
        return len(self.pairs)

    def __iter__(self):
        from .datasets import FramePacket
        for i, (ts, g, d) in enumerate(self.pairs):
            yield FramePacket(i, ts, g, depth=d)


class RosbagStereo:
    """FramePacket iterator over a recorded stereo bag (the offline
    analog of ros_stereo.cc's left/right ApproximateTime subscribers,
    /root/reference/Examples/ROS/ORB_SLAM2/src/ros_stereo.cc): nearest-
    timestamp association of the left topic with the right topic.
    Rectification, when needed, belongs to the camera yaml (io/datasets
    EuRoC shows the pattern); bags recorded from pre-rectified pipelines
    (the common case for ORB-SLAM deployments) pass straight through."""

    def __init__(self, path: str,
                 left_topic: str = "/camera/left/image_raw",
                 right_topic: str = "/camera/right/image_raw",
                 max_dt: float = 0.02):
        self.reader = BagReader(path)
        lefts, rights = [], []
        for topic, t, raw in self.reader.messages([left_topic,
                                                   right_topic]):
            msg = decode_image(raw)
            ts = msg.stamp if msg.stamp > 0 else t
            (lefts if topic == left_topic else rights).append(
                (ts, msg.data))
        self.pairs = []
        rts = np.array([r[0] for r in rights]) if rights else np.zeros(0)
        for ts, g in lefts:
            if not len(rts):
                break
            j = int(np.argmin(np.abs(rts - ts)))
            if abs(rts[j] - ts) <= max_dt:
                self.pairs.append((ts, g, rights[j][1]))

    def __len__(self):
        return len(self.pairs)

    def __iter__(self):
        from .datasets import FramePacket
        for i, (ts, g, r) in enumerate(self.pairs):
            yield FramePacket(i, ts, g, right=r)


class RosbagMono:
    """FramePacket iterator over a single image topic (the offline analog
    of ros_mono.cc, /root/reference/Examples/ROS/ORB_SLAM2/src/
    ros_mono.cc)."""

    def __init__(self, path: str,
                 topic: str = "/camera/image_raw"):
        self.reader = BagReader(path)
        self.frames = []
        for _topic, t, raw in self.reader.messages([topic]):
            msg = decode_image(raw)
            ts = msg.stamp if msg.stamp > 0 else t
            self.frames.append((ts, msg.data))

    def __len__(self):
        return len(self.frames)

    def __iter__(self):
        from .datasets import FramePacket
        for i, (ts, g) in enumerate(self.frames):
            yield FramePacket(i, ts, g)
