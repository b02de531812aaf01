"""ROS1 bag (v2.0) reader: round-trip, bz2 chunks, and a full SLAM run
driven from a recorded bag (the offline analog of the reference's ROS
nodes, /root/reference/Examples/ROS/ORB_SLAM2/src/ros_rgbd.cc)."""
import bz2
import struct

import numpy as np
import pytest

from slam_dynamic_tpu.io import rosbag as rb


def _write_pair_bag(path, n=5, h=24, w=32, t0=100.0):
    wtr = rb.BagWriter(str(path))
    rng = np.random.RandomState(0)
    for i in range(n):
        g = rng.randint(0, 255, (h, w), dtype=np.uint8)
        d = rng.randint(500, 5000, (h, w)).astype(np.uint16)
        ts = t0 + i / 30.0
        wtr.write_image("/camera/rgb/image_raw", ts, g)
        wtr.write_image("/camera/depth_registered/image_raw", ts + 0.003, d)
    wtr.close()


def test_bag_roundtrip(tmp_path):
    p = tmp_path / "t.bag"
    _write_pair_bag(p, n=4)
    r = rb.BagReader(str(p))
    assert r.topics() == {
        "/camera/rgb/image_raw": "sensor_msgs/Image",
        "/camera/depth_registered/image_raw": "sensor_msgs/Image"}
    msgs = list(r.messages(["/camera/rgb/image_raw"]))
    assert len(msgs) == 4
    topic, t, raw = msgs[0]
    img = rb.decode_image(raw)
    assert img.encoding == "mono8" and img.data.shape == (24, 32)
    assert abs(img.stamp - 100.0) < 1e-6
    # depth decodes as uint16
    _, _, raw_d = next(iter(r.messages(
        ["/camera/depth_registered/image_raw"])))
    d = rb.decode_image(raw_d)
    assert d.encoding == "16UC1" and d.data.dtype == np.uint16


def test_bag_bz2_chunk(tmp_path):
    """Real `rosbag record --bz2` output compresses chunk payloads;
    rewrite the writer's none-chunk as bz2 and re-read."""
    p = tmp_path / "t.bag"
    _write_pair_bag(p, n=3)
    raw = open(p, "rb").read()
    # locate the single chunk record after magic + bag header record
    o = len(rb.MAGIC)
    hdr, data, o2 = rb._read_record(raw, o)          # bag header
    chdr, cdata, _ = rb._read_record(raw, o2)        # the chunk
    assert chdr[b"op"][0] == 0x05
    comp = bz2.compress(cdata)
    new_hdr = rb._emit_header({b"op": b"\x05", b"compression": b"bz2",
                               b"size": struct.pack("<I", len(cdata))})
    out = (raw[:o2] + struct.pack("<I", len(new_hdr)) + new_hdr
           + struct.pack("<I", len(comp)) + comp)
    p2 = tmp_path / "t2.bag"
    open(p2, "wb").write(out)
    r = rb.BagReader(str(p2))
    msgs = list(r.messages())
    assert len(msgs) == 6
    assert rb.decode_image(msgs[0][2]).data.shape == (24, 32)


def test_rosbag_rgbd_association(tmp_path):
    p = tmp_path / "t.bag"
    _write_pair_bag(p, n=6)
    ds = rb.RosbagRGBD(str(p))
    assert len(ds) == 6
    pk = next(iter(ds))
    assert pk.gray.dtype == np.uint8 and pk.depth.dtype == np.uint16
    assert abs(pk.timestamp - 100.0) < 1e-6


@pytest.mark.slow
def test_full_slam_from_bag(tmp_path):
    """Record the synthetic RGB-D world into a bag, then drive the full
    system from it via the CLI path — trajectory accuracy must match the
    direct-array path."""
    import jax
    from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
    from slam_dynamic_tpu.io.evo import ate_rmse
    from tests.test_e2e_slam import make_system

    scfg = SynthConfig(n_frames=20, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5)
    seq = generate(scfg)
    p = tmp_path / "synth.bag"
    w = rb.BagWriter(str(p))
    for i in range(scfg.n_frames):
        g = np.clip(seq.gray[i], 0, 255).astype(np.uint8)
        d = np.clip(seq.depth[i] * 1000.0, 0, 65535).astype(np.uint16)
        ts = float(seq.timestamps[i])
        w.write_image("/camera/rgb/image_raw", ts, g)
        w.write_image("/camera/depth_registered/image_raw", ts, d)
    w.close()

    ds = rb.RosbagRGBD(str(p))
    assert len(ds) == scfg.n_frames
    sys_ = make_system(scfg)
    # bag depth is raw uint16 millimetres -> device-side scaling needs the
    # TUM-style factor
    import dataclasses
    cam = dataclasses.replace(sys_.cfg.camera, depth_map_factor=1000.0)
    sys_.cfg = sys_.cfg.replace(camera=cam)
    sys_.tracker.cfg = sys_.cfg
    for pk in ds:
        sys_.track_rgbd(pk.gray, pk.depth, pk.timestamp)
    est = np.stack([-R.T @ t for _, R, t in sys_.trajectory])
    ate = ate_rmse(est, seq.t_wc[:len(est)])
    assert ate < 0.02, ate


def test_rosbag_stereo_and_mono_adapters(tmp_path):
    """RosbagStereo / RosbagMono: the offline analogs of ros_stereo.cc /
    ros_mono.cc complete the ROS-node surface for recorded bags."""
    p = tmp_path / "s.bag"
    wtr = rb.BagWriter(str(p))
    rng = np.random.RandomState(1)
    for i in range(4):
        ts = 50.0 + i / 10.0
        L = rng.randint(0, 255, (20, 30), dtype=np.uint8)
        R = rng.randint(0, 255, (20, 30), dtype=np.uint8)
        wtr.write_image("/camera/left/image_raw", ts, L)
        wtr.write_image("/camera/right/image_raw", ts + 0.002, R)
    wtr.close()
    st = rb.RosbagStereo(str(p))
    assert len(st) == 4
    pkts = list(st)
    assert pkts[0].right is not None and pkts[0].right.shape == (20, 30)
    assert pkts[0].depth is None
    assert abs(pkts[1].timestamp - 50.1) < 1e-6

    mono = rb.RosbagMono(str(p), topic="/camera/left/image_raw")
    assert len(mono) == 4
    mp = list(mono)
    assert mp[2].gray.shape == (20, 30)
    assert mp[2].right is None and mp[2].depth is None

    # association tolerance: a right frame >20ms away is dropped
    p2 = tmp_path / "s2.bag"
    wtr = rb.BagWriter(str(p2))
    wtr.write_image("/camera/left/image_raw", 1.0,
                    np.zeros((8, 8), np.uint8))
    wtr.write_image("/camera/right/image_raw", 1.5,
                    np.zeros((8, 8), np.uint8))
    wtr.close()
    assert len(rb.RosbagStereo(str(p2))) == 0
