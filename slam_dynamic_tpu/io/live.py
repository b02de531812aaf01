"""Live streaming driver: the ROS-node analog for displayless TPU hosts.

The reference's ROS entries (Examples/ROS/ORB_SLAM2/src/ros_{mono,rgbd,
stereo}.cc) subscribe to image topics with queue size 1 (latest-wins) and
approximate-time pairing of the two streams (message_filters, ros_rgbd.cc
:68-72). Here the transport is a plain length-prefixed TCP stream — no
middleware dependency — with the same semantics:

  - two logical channels (gray + depth / left + right) multiplexed over
    one socket, paired by nearest timestamp within a tolerance;
  - a 1-deep latest-wins inbox: if the tracker is still busy when a new
    pair completes, the old pair is DROPPED (the reference's queue-1
    subscriber behavior — live tracking must never fall behind);
  - frames travel in CAMERA-NATIVE dtypes (uint8 gray, uint16 raw
    depth), cast/scaled on device like every other driver.

Wire format per message (little-endian):
  u32 magic 0x534c414d ("SLAM") | u8 kind (0 gray, 1 depth, 2 right)
  | f64 timestamp | u16 height | u16 width | u8 dtype (0 u8, 1 u16,
  2 f32) | u32 payload bytes | payload

Run:  python -m slam_dynamic_tpu.io.live --port 7700 --sensor rgbd \
          --yaml configs/TUM3.yaml --trajectory out/traj.txt
Feed: `send_frame(sock, KIND_GRAY, ts, gray)` (this module) from any
process, or anything that speaks the 22-byte header above.
"""
from __future__ import annotations

import socket
import struct
import threading
from typing import Optional

import numpy as np

MAGIC = 0x534C414D
KIND_GRAY = 0
KIND_DEPTH = 1
KIND_RIGHT = 2
_DTYPES = {0: np.uint8, 1: np.uint16, 2: np.float32}
_DTYPE_CODE = {np.dtype(np.uint8): 0, np.dtype(np.uint16): 1,
               np.dtype(np.float32): 2}
_HDR = struct.Struct("<IBdHHBI")


def send_frame(sock: socket.socket, kind: int, timestamp: float,
               image: np.ndarray):
    """Client helper: publish one image on the stream."""
    image = np.ascontiguousarray(image)
    code = _DTYPE_CODE[image.dtype]
    h, w = image.shape
    payload = image.tobytes()
    sock.sendall(_HDR.pack(MAGIC, kind, timestamp, h, w, code,
                           len(payload)) + payload)


def _recv_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return bytes(buf)


def recv_frame(sock: socket.socket):
    """Returns (kind, timestamp, image) or None at end of stream."""
    hdr = _recv_exact(sock, _HDR.size)
    if hdr is None:
        return None
    magic, kind, ts, h, w, code, nbytes = _HDR.unpack(hdr)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic:#x}")
    payload = _recv_exact(sock, nbytes)
    if payload is None:
        return None
    img = np.frombuffer(payload, _DTYPES[code]).reshape(h, w)
    return kind, ts, img


class FramePairer:
    """Approximate-time pairing of the primary (gray/left) and secondary
    (depth/right) channels — message_filters::ApproximateTime analog
    (ros_rgbd.cc:70-72). Keeps a small window per channel; emits the
    closest-timestamp pair within `tol` seconds."""

    def __init__(self, tol: float = 0.02, window: int = 8):
        self.tol = tol
        self.window = window
        self._a = []            # [(ts, img)] primary
        self._b = []            # secondary

    def push(self, kind: int, ts: float, img: np.ndarray):
        q = self._a if kind == KIND_GRAY else self._b
        q.append((ts, img))
        del q[:-self.window]
        return self._try_pair()

    def _try_pair(self):
        if not self._a or not self._b:
            return None
        ta, ia = self._a[0]
        # nearest secondary to the oldest primary
        j = min(range(len(self._b)), key=lambda k: abs(self._b[k][0] - ta))
        tb, ib = self._b[j]
        if abs(tb - ta) <= self.tol:
            self._a.pop(0)
            del self._b[:j + 1]
            return ta, ia, ib
        if tb > ta + self.tol:      # no secondary will ever match: drop
            self._a.pop(0)
        return None


#: returned by LatestWins.get when the wait timed out but the stream is
#: still open (distinct from None = stream closed and drained)
TIMEOUT = object()


class LatestWins:
    """1-deep inbox: publishing replaces any undelivered item (the ROS
    queue_size=1 drop policy). Thread-safe."""

    def __init__(self):
        self._item = None
        self._cv = threading.Condition()
        self._closed = False
        self.dropped = 0

    def put(self, item):
        with self._cv:
            if self._item is not None:
                self.dropped += 1
            self._item = item
            self._cv.notify()

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify()

    def get(self, timeout=None):
        """Next item; None once the stream is closed AND drained; the
        TIMEOUT sentinel if `timeout` elapsed with the stream still open."""
        with self._cv:
            if not self._cv.wait_for(
                    lambda: self._item is not None or self._closed,
                    timeout=timeout):
                return TIMEOUT
            item, self._item = self._item, None
            return item


class LiveTracker:
    """Socket server driving a System from a live stream."""

    def __init__(self, system, sensor: str, port: int = 0,
                 host: str = "127.0.0.1", pair_tol: float = 0.02):
        self.system = system
        self.sensor = sensor
        self.inbox = LatestWins()
        self.pairer = FramePairer(tol=pair_tol)
        self.n_tracked = 0
        self.stats = []
        self._srv = socket.create_server((host, port))
        self.port = self._srv.getsockname()[1]
        self._rx = threading.Thread(target=self._recv_loop, daemon=True)

    def _recv_loop(self):
        try:
            conn, _ = self._srv.accept()
            with conn:
                while True:
                    msg = recv_frame(conn)
                    if msg is None:
                        break
                    kind, ts, img = msg
                    if self.sensor == "mono":
                        self.inbox.put((ts, img, None))
                        continue
                    pair = self.pairer.push(kind, ts, img)
                    if pair is not None:
                        self.inbox.put(pair)
        finally:
            self.inbox.close()

    def run(self, max_frames: Optional[int] = None,
            idle_timeout: Optional[float] = None):
        """Track until the stream CLOSES (or max_frames). Frames that
        arrive while the tracker is busy are dropped latest-wins. Like a
        ROS node, the server waits indefinitely through quiet spells
        (slow sensor, operator not connected yet); `idle_timeout` is an
        optional watchdog that gives up after that many seconds without
        any frame."""
        self._rx.start()
        while True:
            item = self.inbox.get(timeout=idle_timeout)
            if item is TIMEOUT:
                break                    # explicit watchdog expired
            if item is None:
                break                    # stream closed and drained
            ts, primary, secondary = item
            if self.sensor == "rgbd":
                st = self.system.track_rgbd(primary, secondary, ts)
            elif self.sensor == "stereo":
                st = self.system.track_stereo(primary, secondary, ts)
            else:
                st = self.system.track_mono(primary, ts)
            self.n_tracked += 1
            self.stats.append(st)
            if max_frames is not None and self.n_tracked >= max_frames:
                break
        self._srv.close()
        return self.n_tracked


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="live streaming SLAM server (ROS-node analog)")
    ap.add_argument("--port", type=int, default=7700)
    ap.add_argument("--sensor", default="rgbd",
                    choices=("mono", "stereo", "rgbd"))
    ap.add_argument("--yaml", default=None)
    ap.add_argument("--dataset", default="synthetic")  # config source only
    ap.add_argument("--dynamic", action="store_true")
    ap.add_argument("--trajectory", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--localization", action="store_true",
                    help="track-only against a preloaded map")
    ap.add_argument("--load-map", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from .run import build_config             # reuse the CLI wiring
    from ..system import System
    system = System(build_config(args))
    if args.load_map:
        system.load_map(args.load_map)
    if args.localization:
        system.activate_localization_mode()
    lt = LiveTracker(system, args.sensor, port=args.port)
    print(f"[live] listening on :{lt.port} ({args.sensor})", flush=True)
    n = lt.run()
    print(f"[live] stream ended: {n} frames tracked, "
          f"{lt.inbox.dropped} dropped", flush=True)
    if args.trajectory:
        system.save_trajectory_tum(args.trajectory)
        print(f"[live] trajectory -> {args.trajectory}", flush=True)


if __name__ == "__main__":
    main()
