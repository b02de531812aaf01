#!/usr/bin/env python
"""Measure the direct-index (FeatureVector) gate vs dense MXU matching.

The reference restricts SearchByBoW to feature pairs sharing a
direct-index node (/root/reference/src/ORBmatcher.cc:159-280) — on CPU
that prunes the candidate set and saves time. On TPU the dense [N, M]
Hamming matrix is ONE int8 matmul, so the node gate cannot save time; it
can only change match recall/precision. This tool quantifies that on the
synthetic world: for every (frame, keyframe) relocalization pair, match
dense vs node-gated and compare match counts, inlier counts after PnP,
and amortized device time of both executables.

Usage: python tools/direct_index_bench.py [--cpu] [--frames 40]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from slam_dynamic_tpu.config import (CameraConfig, CapacityConfig,
                                         ORBConfig, SystemConfig)
    from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
    from slam_dynamic_tpu.system import System
    from slam_dynamic_tpu.backend.relocalization import _match_frame_kf
    from slam_dynamic_tpu.models import vocabulary as voc_mod
    from slam_dynamic_tpu.ops.pnp import ransac_pnp

    scfg = SynthConfig(n_frames=args.frames, width=320, height=240,
                       fx=260.0, fy=260.0, cx=159.5, cy=119.5)
    seq = generate(scfg)
    cfg = SystemConfig(
        camera=CameraConfig(fx=scfg.fx, fy=scfg.fy, cx=scfg.cx, cy=scfg.cy,
                            bf=scfg.fx * scfg.baseline, width=scfg.width,
                            height=scfg.height, th_depth=120.0,
                            depth_map_factor=1000.0),
        orb=ORBConfig(n_features=600),
        capacity=CapacityConfig(max_keyframes=64, max_landmarks=16384,
                                max_keypoints=1024, local_ba_keyframes=8,
                                local_ba_landmarks=2048),
        sensor="rgbd")
    s = System(cfg)
    gray8 = np.clip(seq.gray, 0, 255).astype(np.uint8)
    d16 = np.clip(seq.depth * 1000, 0, 65535).astype(np.uint16)
    frames = []
    for i in range(scfg.n_frames):
        s.track_rgbd(gray8[i], d16[i], float(seq.timestamps[i]))
        if s.tracker.last_frame is not None:
            frames.append(s.tracker.last_frame)
    s.tracker.flush()
    m = s.tracker.map
    voc = s.voc
    di_level = cfg.vocabulary.direct_index_level
    n_kf = s.tracker.n_kf_host

    rows = []
    for k in range(n_kf):
        kf_fid = int(m.kf_frame_id[k])
        # a frame ~3 frames after the keyframe views the same area
        cand = [f for f in frames if f.frame_id == kf_fid + 3]
        if not cand or cand[0].data is None:
            continue
        fd = cand[0].data
        bv_f = voc_mod.transform(voc, fd.desc, fd.valid, di_level=di_level)
        bv_k = voc_mod.transform(voc, m.kf_kp_desc[k], m.kf_kp_valid[k],
                                 di_level=di_level)
        lm_d = _match_frame_kf(fd.desc, fd.valid & fd.static_mask,
                               m.kf_kp_desc[k], m.kf_kp_valid[k],
                               m.kf_obs_lm[k])
        lm_g = _match_frame_kf(fd.desc, fd.valid & fd.static_mask,
                               m.kf_kp_desc[k], m.kf_kp_valid[k],
                               m.kf_obs_lm[k], bv_f.node, bv_k.node)

        def pnp_inliers(lm):
            L = m.lm_pos.shape[0]
            ok = (lm >= 0) & m.lm_valid[jnp.clip(lm, 0, L - 1)]
            if int(ok.sum()) < 12:
                return 0
            xw = m.lm_pos[jnp.clip(lm, 0, L - 1)]
            fit = ransac_pnp(s.cam, xw, fd.xy, ok, jax.random.PRNGKey(k))
            return int(fit.n_inliers)

        rows.append((k, int((lm_d >= 0).sum()), int((lm_g >= 0).sum()),
                     pnp_inliers(lm_d), pnp_inliers(lm_g)))
    print("kf  dense_matches gated_matches dense_pnp_inl gated_pnp_inl")
    for r in rows:
        print("%3d %8d %10d %10d %12d" % r)
    md = np.array([r[1] for r in rows]); mg = np.array([r[2] for r in rows])
    pd = np.array([r[3] for r in rows]); pg = np.array([r[4] for r in rows])
    print(f"\nmean matches: dense {md.mean():.1f} gated {mg.mean():.1f} "
          f"({100 * (mg.mean() / max(md.mean(), 1e-9) - 1):+.1f}%)")
    print(f"mean PnP inliers: dense {pd.mean():.1f} gated {pg.mean():.1f}")

    # amortized device time of each executable (64 chained calls)
    fd = frames[-1].data
    k = n_kf - 1
    bv_f = voc_mod.transform(voc, fd.desc, fd.valid, di_level=di_level)
    bv_k = voc_mod.transform(voc, m.kf_kp_desc[k], m.kf_kp_valid[k],
                             di_level=di_level)
    for name, fn in [
            ("dense", lambda: _match_frame_kf(
                fd.desc, fd.valid, m.kf_kp_desc[k], m.kf_kp_valid[k],
                m.kf_obs_lm[k])),
            ("gated", lambda: _match_frame_kf(
                fd.desc, fd.valid, m.kf_kp_desc[k], m.kf_kp_valid[k],
                m.kf_obs_lm[k], bv_f.node, bv_k.node)),
            ("gated+transforms", lambda: _match_frame_kf(
                fd.desc, fd.valid, m.kf_kp_desc[k], m.kf_kp_valid[k],
                m.kf_obs_lm[k],
                voc_mod.transform(voc, fd.desc, fd.valid,
                                  di_level=di_level).node,
                voc_mod.transform(voc, m.kf_kp_desc[k], m.kf_kp_valid[k],
                                  di_level=di_level).node))]:
        fn()[0].block_until_ready()           # compile
        t0 = time.perf_counter()
        reps = 32
        for _ in range(reps):
            out = fn()
        out.block_until_ready()
        print(f"{name}: {(time.perf_counter() - t0) / reps * 1e3:.3f} "
              f"ms/call (amortized, {reps} reps)")


if __name__ == "__main__":
    main()
