#!/usr/bin/env python
"""Per-dispatch transport cost vs executable size through the tunnel.

The dynamic fused executable (~19 MB serialized) pays a per-dispatch
transport penalty the small static executable (~5 MB) does not
(RESULTS.md round-3: p50 40 vs 90-117 ms by time period). This probe
compiles the static step, the dyn step, and the classify stage ALONE,
then times each with DISTINCT inputs + full readback per call (the only
trustworthy methodology through the tunnel) to decide whether splitting
the dyn step into two smaller dispatches pays.

Usage: python tools/dispatch_probe.py [--cpu] [--reps 20]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from slam_dynamic_tpu.config import (CameraConfig, CapacityConfig,
                                         ORBConfig, SystemConfig)
    from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
    from slam_dynamic_tpu.system import System
    from slam_dynamic_tpu.frontend import dynamics_ops as dops
    from slam_dynamic_tpu.frontend.fused import build_frame_data

    scfg = SynthConfig(n_frames=args.reps + 6, dynamic_object=True,
                       obj_size=1.6, obj_depth=3.0, obj_speed=0.06)
    seq = generate(scfg)
    gray8 = np.clip(seq.gray, 0, 255).astype(np.uint8)
    d16 = np.clip(seq.depth * 1000.0, 0, 65535).astype(np.uint16)
    cfg = SystemConfig(
        camera=CameraConfig(fx=scfg.fx, fy=scfg.fy, cx=scfg.cx, cy=scfg.cy,
                            bf=scfg.fx * scfg.baseline, width=scfg.width,
                            height=scfg.height, th_depth=120.0,
                            fps=scfg.fps, depth_map_factor=1000.0),
        orb=ORBConfig(n_features=1000),
        capacity=CapacityConfig(max_keyframes=128, max_landmarks=32768,
                                max_keypoints=2048, local_ba_keyframes=8,
                                local_ba_landmarks=2048),
        sensor="rgbd")
    s = System(cfg)

    def run_mode(name, fn, warm=2):
        for i in range(warm):
            fn(i)
        times = []
        for i in range(warm, args.reps):
            t0 = time.perf_counter()
            fn(i)
            times.append(time.perf_counter() - t0)
        ms = np.sort(np.array(times)) * 1e3
        print(f"{name}: p50 {np.median(ms):.1f} ms  p90 "
              f"{ms[int(len(ms) * 0.9)]:.1f}  max {ms[-1]:.1f}  "
              f"({len(ms)} reps, distinct inputs + readback)",
              flush=True)

    # 1. static per-frame step (System.track_rgbd, pipeline off)
    import dataclasses
    s.cfg = s.cfg.replace(tracking=dataclasses.replace(
        s.cfg.tracking, pipeline_depth=0))
    s.tracker.cfg = s.cfg
    run_mode("static track_rgbd",
             lambda i: s.track_rgbd(gray8[i], d16[i],
                                    float(seq.timestamps[i])), warm=4)

    # 2. classify_boxes ALONE (fresh frame build + classify per call)
    cam = s.cam
    ocfg = cfg.orb
    H, W = scfg.height, scfg.width
    nslots = cfg.capacity.max_keypoints
    boxes = jnp.asarray(
        np.tile(seq.boxes[6][:1], (cfg.dynamic.max_boxes, 1)).astype(
            np.float32))
    act = jnp.asarray(np.arange(cfg.dynamic.max_boxes) < 1)

    # build_frame_data is a plain function (normally inlined INTO the
    # fused jits) — jit it here or this stage times eager op-by-op
    # dispatch through the tunnel (measured: 2.5 s/call of pure
    # per-op latency, a methodology artifact, not a dispatch cost)
    bfd = jax.jit(lambda im, ax, ds: build_frame_data(
        cam, im, ax, boxes, act, ocfg, H, W, cfg.orb.scale_factor,
        "rgbd", n_slots=nslots, depth_scale=ds))

    def fd_of(i):
        return bfd(jnp.asarray(gray8[i]), jnp.asarray(d16[i]),
                   jnp.float32(1e-3))
    ref_fd = fd_of(0)
    jax.block_until_ready(ref_fd)

    def classify_once(i):
        fd = fd_of(i)
        v = dops.classify_boxes(cam, ref_fd, fd, boxes, act, n_hyp=256,
                                seed=i)
        np.asarray(v.verdict)
    run_mode("frame_build+classify alone", classify_once, warm=2)

    # 3. full dyn step (System.track_rgbd with detections)
    s2 = System(cfg.replace(detector=cfg.detector.__class__(
        mode="precomputed")))
    s2.cfg = s2.cfg.replace(tracking=dataclasses.replace(
        s2.cfg.tracking, pipeline_depth=0))
    s2.tracker.cfg = s2.cfg

    def dyn_once(i):
        det = seq.boxes[i][seq.box_valid[i]] if seq.box_valid[i, 0] else None
        s2.track_rgbd(gray8[i], d16[i], float(seq.timestamps[i]),
                      detections=det)
    run_mode("dyn track_rgbd", dyn_once, warm=4)

    # executable sizes seen this process
    import glob, os
    blobs = sorted(glob.glob("/root/repo/.jax_cache/*fused_track*") +
                   glob.glob("/root/repo/.jax_cache/*classify*"),
                   key=os.path.getmtime)[-8:]
    for b in blobs:
        print(f"  {os.path.getsize(b) / 2 ** 20:6.1f} MB "
              f"{os.path.basename(b)[:60]}")


if __name__ == "__main__":
    main()
