"""Live streaming driver (io/live.py) — the ROS-node analog.

Covers: wire roundtrip, approximate-time pairing, latest-wins dropping,
and a full live RGB-D session over a real socket (server thread + client
feeding the synthetic sequence).
"""
import socket
import threading

import numpy as np
import pytest

from slam_dynamic_tpu.io.live import (FramePairer, LatestWins, LiveTracker,
                                      KIND_DEPTH, KIND_GRAY, send_frame,
                                      recv_frame)


def test_wire_roundtrip():
    a, b = socket.socketpair()
    img = (np.arange(12, dtype=np.uint16) * 7).reshape(3, 4)
    send_frame(a, KIND_DEPTH, 1.25, img)
    kind, ts, out = recv_frame(b)
    assert kind == KIND_DEPTH and ts == 1.25
    np.testing.assert_array_equal(out, img)
    a.close()
    assert recv_frame(b) is None            # clean end-of-stream
    b.close()


def test_pairer_approximate_time():
    p = FramePairer(tol=0.02)
    g = np.zeros((2, 2), np.uint8)
    d = np.ones((2, 2), np.uint16)
    assert p.push(KIND_GRAY, 1.000, g) is None
    out = p.push(KIND_DEPTH, 1.009, d)      # within tol -> paired
    assert out is not None and out[0] == 1.000
    # unmatched primary gets dropped once the secondary stream passes it
    assert p.push(KIND_GRAY, 2.000, g) is None
    assert p.push(KIND_DEPTH, 2.5, d) is None     # too far: drops primary
    assert p.push(KIND_GRAY, 2.501, g)[0] == 2.501


def test_latest_wins_drops():
    q = LatestWins()
    q.put(1)
    q.put(2)                                 # replaces undelivered 1
    assert q.get(timeout=1) == 2
    assert q.dropped == 1
    q.close()
    assert q.get(timeout=1) is None


@pytest.mark.slow
def test_live_rgbd_session():
    """Full live run: server thread tracks while a client streams the
    synthetic sequence in native dtypes over TCP."""
    from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
    from slam_dynamic_tpu.io.evo import ate_rmse
    from tests.test_e2e_slam import make_system

    scfg = SynthConfig(n_frames=16, width=256, height=192, fx=210.0,
                       fy=210.0, cx=127.5, cy=95.5)
    seq = generate(scfg)
    system = make_system(scfg)
    lt = LiveTracker(system, "rgbd", port=0)

    def client():
        import time
        with socket.create_connection(("127.0.0.1", lt.port)) as s:
            for i in range(seq.gray.shape[0]):
                ts = float(seq.timestamps[i])
                target = lt.n_tracked + 1
                send_frame(s, KIND_GRAY, ts,
                           seq.gray[i].astype(np.uint8))
                # raw uint16 depth at TUM factor, like a real camera topic
                send_frame(s, KIND_DEPTH, ts,
                           (seq.depth[i] * 5000).astype(np.uint16))
                # live-camera pacing: wait for the tracker to consume
                # (first frames compile; flooding would latest-wins-drop)
                for _ in range(1200):
                    if lt.n_tracked >= target:
                        break
                    time.sleep(0.05)

    th = threading.Thread(target=client)
    th.start()
    n = lt.run(idle_timeout=60.0)
    th.join()
    assert n == seq.gray.shape[0]
    est = np.stack([-R.T @ t for _, R, t in system.trajectory])
    # compare against the ground truth of the frames actually tracked
    idx = [np.argmin(np.abs(seq.timestamps - ts))
           for ts, _, _ in system.trajectory]
    ate = ate_rmse(est, seq.t_wc[idx], align=False)
    assert ate < 0.06, ate
