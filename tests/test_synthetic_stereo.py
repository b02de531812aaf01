"""Synthetic renderer sanity + stereo depth association vs ground truth."""
import numpy as np
import jax.numpy as jnp

from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
from slam_dynamic_tpu.config import ORBConfig
from slam_dynamic_tpu.frontend.extractor import extract_np
from slam_dynamic_tpu.ops.stereo import match_stereo, depth_from_rgbd


def test_renderer_geometry():
    cfg = SynthConfig(n_frames=3, width=320, height=240, fx=260, fy=260,
                      cx=159.5, cy=119.5)
    seq = generate(cfg)
    assert seq.gray.shape == (3, 240, 320)
    # center pixel looks at back wall ~9m ahead at frame 0 (camera at z~0)
    assert 7.5 < seq.depth[0, 120, 160] < 9.5
    assert seq.gray.std() > 30  # textured


def test_renderer_dynamic_object_box():
    cfg = SynthConfig(n_frames=5, width=320, height=240, fx=260, fy=260,
                      cx=159.5, cy=119.5, dynamic_object=True)
    seq = generate(cfg)
    assert seq.box_valid.any()
    t = np.nonzero(seq.box_valid[:, 0])[0][0]
    x0, y0, x1, y1 = seq.boxes[t, 0]
    assert x1 > x0 and y1 > y0
    # mask consistent with box
    ys, xs = np.nonzero(seq.masks[t])
    assert abs(xs.min() - x0) < 2 and abs(xs.max() - x1) < 2
    # object depth ~ obj_depth
    assert abs(np.median(seq.depth[t][seq.masks[t]]) - cfg.obj_depth) < 1.0


def test_stereo_matching_recovers_depth():
    cfg = SynthConfig(n_frames=1, stereo=True, baseline=0.3)
    seq = generate(cfg)
    orb_cfg = ORBConfig(n_features=800)
    kL = extract_np(seq.gray[0], orb_cfg)
    kR = extract_np(seq.right[0], orb_cfg)
    bf = cfg.baseline * cfg.fx
    sf = 1.2 ** np.asarray(kL.level)
    sfr = 1.2 ** np.asarray(kR.level)
    sm = match_stereo(jnp.asarray(seq.gray[0]), jnp.asarray(seq.right[0]),
                      kL, kR, bf, 0.3, jnp.asarray(sf), jnp.asarray(sfr))
    ok = np.asarray(sm.valid)
    assert ok.sum() > 150, ok.sum()
    xy = np.asarray(kL.xy)[ok]
    est = np.asarray(sm.depth)[ok]
    gt = seq.depth[0][np.clip(xy[:, 1].astype(int), 0, 479),
                      np.clip(xy[:, 0].astype(int), 0, 639)]
    rel = np.abs(est - gt) / gt
    assert np.median(rel) < 0.03, np.median(rel)
    assert (rel < 0.1).mean() > 0.8


def test_depth_from_rgbd():
    cfg = SynthConfig(n_frames=1)
    seq = generate(cfg)
    k = extract_np(seq.gray[0], ORBConfig(n_features=300))
    sm = depth_from_rgbd(jnp.asarray(seq.depth[0]), k.xy, k.valid,
                         bf=40.0)
    ok = np.asarray(sm.valid)
    assert ok.sum() > 250
    xy = np.asarray(k.xy)[ok]
    est = np.asarray(sm.depth)[ok]
    gt = seq.depth[0][np.clip(np.round(xy[:, 1]).astype(int), 0, 479),
                      np.clip(np.round(xy[:, 0]).astype(int), 0, 639)]
    np.testing.assert_allclose(est, gt, rtol=1e-5)
    # virtual right coord consistent: u - ur = bf / d
    ur = np.asarray(sm.u_right)[ok]
    np.testing.assert_allclose(xy[:, 0] - ur, 40.0 / gt, rtol=1e-4)
