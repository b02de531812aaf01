"""CLI driver: run SLAM over a dataset and export artifacts.

Equivalent of the reference's Examples drivers (stereo_kitti.cc,
rgbd_my.cc, mono_tum.cc): per-frame loop, detector invocation (online or
precomputed), timing statistics (median/mean track time,
stereo_kitti.cc:161-170), trajectory export, optional evaluation.

Usage:
  python -m slam_dynamic_tpu.io.run --dataset synthetic --frames 60 \
      --sensor rgbd --dynamic --out /tmp/run1
  python -m slam_dynamic_tpu.io.run --dataset tum --path <dir> --yaml <cfg>
  python -m slam_dynamic_tpu.io.run --dataset kitti --path <seq_dir> \
      --yaml Examples/Stereo/KITTI04-12.yaml --sensor stereo
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_config(args):
    from ..config import (SystemConfig, CameraConfig, ORBConfig,
                          DetectorConfig, CapacityConfig, load_yaml)
    if args.yaml:
        cfg = load_yaml(args.yaml)
    elif args.dataset == "synthetic":
        from .synthetic import SynthConfig
        s = SynthConfig()
        cfg = SystemConfig(camera=CameraConfig(
            fx=s.fx, fy=s.fy, cx=s.cx, cy=s.cy, bf=s.fx * s.baseline,
            width=s.width, height=s.height, th_depth=120.0))
    else:
        cfg = SystemConfig()
    det_mode = "precomputed" if args.dynamic else "off"
    return cfg.replace(sensor=args.sensor,
                       detector=cfg.detector.__class__(mode=det_mode))


def make_dataset(args, cfg):
    from .datasets import (TumRGBD, KittiStereo, SyntheticDataset,
                           EurocDataset)
    if args.dataset == "tum":
        return TumRGBD(args.path, cfg.camera.depth_map_factor,
                       boxes_dir=args.boxes, masks_dir=args.masks)
    if args.dataset == "kitti":
        return KittiStereo(args.path, boxes_dir=args.boxes)
    if args.dataset == "euroc":
        return EurocDataset(args.path, stereo=(args.sensor == "stereo"),
                            yaml_path=args.yaml or None)
    if args.dataset == "rosbag":
        # sensor selects the ros node analog: rgbd = ros_rgbd.cc,
        # stereo = ros_stereo.cc, mono = ros_mono.cc
        from .rosbag import RosbagMono, RosbagRGBD, RosbagStereo
        if args.sensor == "stereo":
            return RosbagStereo(args.path, left_topic=args.left_topic,
                                right_topic=args.right_topic)
        if args.sensor == "mono":
            return RosbagMono(args.path, topic=args.rgb_topic)
        return RosbagRGBD(args.path, rgb_topic=args.rgb_topic,
                          depth_topic=args.depth_topic)
    from .synthetic import SynthConfig, generate
    s = SynthConfig(n_frames=args.frames,
                    dynamic_object=args.dynamic,
                    stereo=(args.sensor == "stereo"),
                    trajectory=args.trajectory)
    seq = generate(s)
    return SyntheticDataset(seq, use_boxes=args.dynamic,
                            stereo=(args.sensor == "stereo"))


def _write_synth_groundtruth(path: str, seq):
    """TUM-format ground truth from the synthetic world's exact poses
    (R_wc/t_wc are already world-from-camera — no inversion)."""
    import jax.numpy as jnp
    from ..utils import se3
    with open(path, "w") as f:
        for i in range(len(seq.timestamps)):
            q = np.asarray(se3.quat_from_rot(jnp.asarray(seq.R_wc[i])))
            t = seq.t_wc[i]
            f.write(f"{float(seq.timestamps[i]):.6f} "
                    f"{t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset",
                    choices=["synthetic", "tum", "kitti", "euroc",
                             "rosbag"],
                    default="synthetic")
    ap.add_argument("--path", default="")
    ap.add_argument("--yaml", default="")
    ap.add_argument("--sensor", choices=["mono", "stereo", "rgbd"],
                    default="rgbd")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--dynamic", action="store_true")
    ap.add_argument("--trajectory", default="sweep")
    ap.add_argument("--rgb-topic", default="/camera/rgb/image_raw",
                    help="rosbag: gray/rgb image topic (ref ros_rgbd.cc)")
    ap.add_argument("--depth-topic",
                    default="/camera/depth_registered/image_raw",
                    help="rosbag: registered depth topic")
    ap.add_argument("--left-topic", default="/camera/left/image_raw",
                    help="rosbag stereo: left topic (ref ros_stereo.cc)")
    ap.add_argument("--right-topic", default="/camera/right/image_raw",
                    help="rosbag stereo: right topic")
    ap.add_argument("--boxes", default=None, help="precomputed boxes dir")
    ap.add_argument("--masks", default=None, help="precomputed masks dir")
    ap.add_argument("--out", default="/tmp/slam_run")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ply", action="store_true", help="export dense map")
    ap.add_argument("--save-map", default=None, metavar="NPZ",
                    help="write the sparse map checkpoint after the run")
    ap.add_argument("--load-map", default=None, metavar="NPZ",
                    help="resume from a map checkpoint (starts in "
                         "relocalization)")
    ap.add_argument("--skip", type=int, default=0,
                    help="skip the first N frames (pair with --load-map to "
                         "resume mid-sequence)")
    ap.add_argument("--log-frames", action="store_true",
                    help="write per-frame metrics (state, inliers, ms) to "
                         "<out>/frames.jsonl")
    ap.add_argument("--realtime", action="store_true",
                    help="pace frames to the dataset timestamps (the "
                         "reference drivers' usleep pacing, "
                         "Examples/Stereo/stereo_kitti.cc:147-154)")
    ap.add_argument("--ar", type=int, default=0, metavar="N",
                    help="AR demo (headless ViewerAR analog, ref Examples/"
                         "ROS/ORB_SLAM2/src/AR/): detect a dominant plane "
                         "from the map, anchor a virtual cube on it, and "
                         "write every Nth frame with the cube wireframe "
                         "rendered through the live pose to <out>/ar/")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ..system import System
    cfg = build_config(args)
    if args.ply and args.sensor == "rgbd":
        import dataclasses
        cfg = cfg.replace(pointcloud=dataclasses.replace(
            cfg.pointcloud, enabled=True))
    data = make_dataset(args, cfg)
    sys_ = System(cfg)
    if args.load_map:
        sys_.load_map(args.load_map)
        print(json.dumps({"loaded_map": args.load_map,
                          "keyframes": int(sys_.tracker.map.n_kf),
                          "state": sys_.tracker.state}))

    os.makedirs(args.out, exist_ok=True)
    frame_log = open(os.path.join(args.out, "frames.jsonl"), "w") \
        if args.log_frames else None
    ar_plane = None
    ar_verts = None
    n_ar = 0
    _ar_grays = {}
    if args.ar:
        os.makedirs(os.path.join(args.out, "ar"), exist_ok=True)
    times = []
    n_lost = 0
    prev_ts = None
    for i, pkt in enumerate(data):
        if i < args.skip:
            continue
        t0 = time.time()
        if args.realtime and prev_ts is not None and times:
            # sleep off the remainder of the inter-frame interval (the
            # reference pacing: track, then usleep(T - ttrack))
            budget = pkt.timestamp - prev_ts
            spare = budget - times[-1]
            if 0 < spare < 5.0:
                time.sleep(spare)
        prev_ts = pkt.timestamp
        if args.sensor == "rgbd":
            st = sys_.track_rgbd(pkt.gray, pkt.depth, pkt.timestamp,
                                 detections=pkt.detections, mask=pkt.mask)
        elif args.sensor == "stereo":
            st = sys_.track_stereo(pkt.gray, pkt.right, pkt.timestamp,
                                   detections=pkt.detections)
        else:
            st = sys_.track_mono(pkt.gray, pkt.timestamp)
        times.append(time.time() - t0)
        n_lost += st.state != "OK"
        if args.ar:
            # headless ViewerAR: insert the cube once a plane is found,
            # then re-render it through every frame's tracked pose. In
            # pipelined mode the finalized pose lags the input frame, so
            # frames are matched by st.frame_id against a small cache.
            _ar_grays[getattr(sys_, "frame_id", i) - 1] = pkt.gray
            while len(_ar_grays) > 8:
                _ar_grays.pop(next(iter(_ar_grays)))
            if st.state == "OK" and st.np_R is not None:
                from ..viz import ar as ar_mod
                from ..viz.headless import write_png
                if ar_plane is None and sys_.tracker.n_kf_host >= 2:
                    m = sys_.tracker.map
                    ar_plane = ar_mod.detect_plane(
                        np.asarray(m.lm_pos), np.asarray(m.lm_valid))
                    if ar_plane is not None:
                        ar_verts = ar_mod.cube_vertices(ar_plane)
                g = _ar_grays.get(st.frame_id)
                if ar_verts is not None and g is not None \
                        and st.frame_id % max(args.ar, 1) == 0:
                    cam = cfg.camera
                    rgb = ar_mod.render_cube(
                        g, st.np_R, st.np_t, cam.fx, cam.fy,
                        cam.cx, cam.cy, ar_verts)
                    write_png(os.path.join(args.out, "ar",
                                           f"{st.frame_id:06d}.png"), rgb)
                    n_ar += 1
        if frame_log is not None:
            # structured per-frame observability (the reference only has
            # ad-hoc cout prints, SURVEY 5.5)
            frame_log.write(json.dumps({
                "i": i, "t": pkt.timestamp, "state": st.state,
                "mm": st.n_inliers_mm, "map": st.n_inliers_map,
                "kf": bool(st.is_keyframe),
                "ms": round(times[-1] * 1e3, 2)}) + "\n")

    if frame_log is not None:
        frame_log.close()
    sys_.save_trajectory_tum(os.path.join(args.out, "FrameTrajectory.txt"))
    sys_.save_trajectory_kitti(os.path.join(args.out,
                                            "CameraTrajectory_kitti.txt"))
    sys_.save_keyframe_trajectory_tum(
        os.path.join(args.out, "KeyFrameTrajectory.txt"))
    if sys_.dense is not None:
        sys_.save_dense_ply(os.path.join(args.out, "map.ply"))
        sys_.save_pcd(os.path.join(args.out, "map.pcd"))
    if args.save_map:
        sys_.save_map(args.save_map)
    # timing stats as the reference drivers print (stereo_kitti.cc:161-170)
    ts = np.sort(np.asarray(times))
    summary = {
        "frames": len(times),
        "lost": n_lost,
        "median_track_s": float(np.median(ts)),
        "mean_track_s": float(ts.mean()),
        "fps": float(1.0 / max(ts.mean(), 1e-9)),
        "keyframes": int(sys_.tracker.map.n_kf),
        "landmarks": int(sys_.tracker.map.n_lm),
    }
    if args.ar:
        summary["ar_frames"] = n_ar
    if args.dataset == "synthetic":
        # the synthetic world has exact ground truth: export it in TUM
        # format so the full evo protocol (`io.evo ape tum est gt`) closes
        # end-to-end on a CLI run, and report ATE in the summary
        gt_path = os.path.join(args.out, "groundtruth.txt")
        _write_synth_groundtruth(gt_path, data.seq)
        try:
            from .evo import ate_rmse, associate, _load
            est_t, est_p, _ = _load(
                os.path.join(args.out, "FrameTrajectory.txt"), "tum")
            gt_t, gt_p, _ = _load(gt_path, "tum")
            ia, ib = associate(est_t, gt_t)
            if len(ia) >= 3:
                summary["ate_m"] = round(
                    float(ate_rmse(est_p[ia], gt_p[ib])), 5)
                summary["ate_unaligned_m"] = round(
                    float(ate_rmse(est_p[ia], gt_p[ib], align=False)), 5)
        except Exception as e:   # evaluation must never fail the run
            summary["ate_error"] = str(e)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
