"""Dense mapping, OBB, headless viz, and map checkpointing."""
import numpy as np
import jax.numpy as jnp

from slam_dynamic_tpu.config import SystemConfig, PointCloudConfig
from slam_dynamic_tpu.utils.camera import Intrinsics
from slam_dynamic_tpu.ops import pointcloud as pc
from slam_dynamic_tpu.io.synthetic import SynthConfig, generate


CAM = Intrinsics.create(fx=260.0, fy=260.0, cx=159.5, cy=119.5,
                        width=320, height=240)


def test_backproject_matches_gt_depth():
    scfg = SynthConfig(n_frames=1, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5)
    seq = generate(scfg)
    pts, inten, ok = pc.backproject_dense(
        CAM, jnp.asarray(seq.gray[0]), jnp.asarray(seq.depth[0]),
        jnp.eye(3), jnp.zeros(3), jnp.zeros((240, 320), bool),
        stride=4, max_depth=20.0)
    okn = np.asarray(ok)
    assert okn.sum() > 3000
    # points reproject to consistent depths
    z = np.asarray(pts)[okn][:, 2]
    assert z.min() > 0.5 and z.max() < 15


def test_voxel_downsample_dedups(rng):
    # many duplicate points in few voxels
    base = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    pts = np.repeat(base, 20, axis=0)
    out_p, out_i, ok = pc.voxel_downsample(
        jnp.asarray(pts), jnp.zeros(len(pts)), jnp.ones(len(pts), bool),
        resolution=0.5, max_out=256)
    n = int(np.asarray(ok).sum())
    assert n <= 2 ** 3 * 4      # at most the occupied 0.5-voxels in unit box
    assert n >= 4


def test_obb_axis_aligned_box(rng):
    pts = rng.uniform([-1, -2, -0.5], [1, 2, 0.5], (500, 3)).astype(
        np.float32)
    obb = pc.obb_from_points(jnp.asarray(pts), jnp.ones(500, bool))
    ext = np.sort(np.asarray(obb.extents))
    np.testing.assert_allclose(ext, [0.5, 1.0, 2.0], atol=0.1)
    np.testing.assert_allclose(np.asarray(obb.center), 0, atol=0.1)


def test_dense_mapper_and_ply(tmp_path):
    from slam_dynamic_tpu.backend.dense_map import DenseMapper
    scfg = SynthConfig(n_frames=2, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5, dynamic_object=True,
                       obj_x0=0.0, obj_depth=3.0)
    seq = generate(scfg)
    cfg = SystemConfig(pointcloud=PointCloudConfig(
        enabled=True, max_depth=20.0))
    dm = DenseMapper(cfg, CAM)
    for i in range(2):
        R = seq.R_wc[i].T
        t = -R @ seq.t_wc[i]
        boxes = seq.boxes[i][seq.box_valid[i]]
        dm.insert_keyframe(seq.gray[i], seq.depth[i], R, t,
                           dyn_mask=seq.masks[i], boxes=boxes,
                           box_ids=np.array([0]),
                           box_dynamic=np.array([True]))
    pts, inten = dm.global_cloud()
    assert len(pts) > 2000
    # dynamic object (at ~(0,y,3.x) world) excluded from cloud
    near_obj = np.linalg.norm(pts - np.array([0, 0, 3.3]), axis=1) < 0.4
    assert near_obj.sum() < 20
    # OBB computed for the dynamic box
    assert 0 in dm.obbs
    ext = np.sort(np.asarray(dm.obbs[0].extents))
    assert ext[2] < 1.5  # object ~1m quad
    n = dm.save_ply(str(tmp_path / "map.ply"))
    assert n == len(pts)
    assert (tmp_path / "map.ply").read_text().startswith("ply")


def test_png_and_overlay(tmp_path, rng):
    from slam_dynamic_tpu.viz import headless as hv
    gray = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    xy = rng.uniform([0, 0], [160, 120], (50, 2)).astype(np.float32)
    rgb = hv.draw_frame(gray, xy, np.ones(50, bool),
                        tracked_mask=np.arange(50) < 25,
                        boxes=np.array([[10, 10, 60, 60]]),
                        box_status=np.array([2]))
    assert rgb.shape == (120, 160, 3)
    p = tmp_path / "frame.png"
    hv.write_png(str(p), rgb)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 1000


def test_map_checkpoint_roundtrip(tmp_path):
    from slam_dynamic_tpu.worldmap.checkpoint import save_map, load_map
    from slam_dynamic_tpu.worldmap.state import empty_map, insert_keyframe
    from slam_dynamic_tpu.config import CapacityConfig
    cap = CapacityConfig(max_keyframes=8, max_landmarks=64, max_keypoints=16)
    m = empty_map(cap)
    N = 16
    m = insert_keyframe(
        m, jnp.eye(3), jnp.ones(3), 0, 0.0, jnp.zeros((N, 2)),
        jnp.zeros(N, jnp.int32), jnp.zeros(N), jnp.zeros((N, 8), jnp.uint32),
        jnp.ones(N, bool), jnp.full(N, -1.0), jnp.full(N, -1.0),
        jnp.full(N, -1, jnp.int32))
    p = str(tmp_path / "map.npz")
    save_map(p, m)
    m2 = load_map(p)
    assert int(m2.n_kf) == 1
    np.testing.assert_allclose(np.asarray(m2.kf_t[0]), 1.0)
    for f in m._fields:
        np.testing.assert_array_equal(np.asarray(getattr(m, f)),
                                      np.asarray(getattr(m2, f)))


def test_checkpoint_resume_continues_tracking():
    """Save the map mid-sequence, rebuild a fresh System from the
    checkpoint, and keep tracking (the reference's SaveMap/LoadMap is an
    unimplemented TODO — System.h:122-124)."""
    import tempfile, os
    from slam_dynamic_tpu.io.synthetic import SynthConfig as SC, generate
    from slam_dynamic_tpu.io.evo import ate_rmse
    from tests.test_e2e_slam import make_system

    scfg = SC(n_frames=20, width=320, height=240, fx=260.0, fy=260.0,
              cx=159.5, cy=119.5)
    seq = generate(scfg)
    sys_ = make_system(scfg)
    for i in range(10):
        sys_.track_rgbd(seq.gray[i], seq.depth[i], float(seq.timestamps[i]))
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "map.npz")
        sys_.save_map(p)

        sys2 = make_system(scfg)
        sys2.load_map(p)
        assert sys2.tracker.state == "LOST"
        assert sys2.tracker.n_kf_host == sys_.tracker.n_kf_host
        states = []
        for i in range(10, 20):
            st = sys2.track_rgbd(seq.gray[i], seq.depth[i],
                                 float(seq.timestamps[i]))
            states.append(st.state)
    assert states.count("OK") >= 8, states
    est = np.stack([-R.T @ t for _, R, t in sys2.trajectory])
    idx0 = 20 - len(est)
    ate = ate_rmse(est, seq.t_wc[idx0:20])
    assert ate < 0.05, ate


def test_system_owned_dense_map(tmp_path):
    """System owns the dense mapper when pointcloud.enabled (ref System
    owns PointCloudMapping, System.cc:84-85) and exports via save_pcd
    (ref System::SavePCD :430) -- including in pipelined mode."""
    import dataclasses
    from slam_dynamic_tpu.config import (CameraConfig, ORBConfig,
                                         DetectorConfig, CapacityConfig)
    from slam_dynamic_tpu.system import System
    scfg = SynthConfig(n_frames=10, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5)
    seq = generate(scfg)
    cfg = SystemConfig(
        camera=CameraConfig(fx=scfg.fx, fy=scfg.fy, cx=scfg.cx, cy=scfg.cy,
                            bf=scfg.fx * scfg.baseline, width=scfg.width,
                            height=scfg.height, th_depth=120.0),
        orb=ORBConfig(n_features=600),
        detector=DetectorConfig(mode="off"),
        capacity=CapacityConfig(max_keyframes=32, max_landmarks=8192,
                                max_keypoints=1024, local_ba_keyframes=8,
                                local_ba_landmarks=2048),
        pointcloud=PointCloudConfig(enabled=True, max_depth=20.0),
        sensor="rgbd")
    cfg = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, pipeline_depth=1, max_frames_between_kf=4))
    sys_ = System(cfg)
    assert sys_.dense is not None
    for i in range(10):
        sys_.track_rgbd(seq.gray[i], seq.depth[i], float(seq.timestamps[i]))
    n = sys_.save_pcd(str(tmp_path / "map.pcd"))
    assert n > 2000
    head = (tmp_path / "map.pcd").read_text().splitlines()[0]
    assert head.startswith("#") or head.startswith("VERSION"), head
    n2 = sys_.save_dense_ply(str(tmp_path / "map.ply"))
    assert n2 == n
    # mono/stereo or disabled -> clean error
    import pytest as _pytest
    sys2 = System(cfg.replace(pointcloud=PointCloudConfig(enabled=False)))
    with _pytest.raises(RuntimeError, match="pointcloud"):
        sys2.save_pcd(str(tmp_path / "x.pcd"))
