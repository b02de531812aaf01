#!/usr/bin/env python
"""Isolate the chunked-dynamic overhead: dispatch+readback of the cached
fused_track_chunk vs fused_track_chunk_dyn executables with IDENTICAL
real arguments (map state from a warmed System), no host SLAM
bookkeeping in the loop. Decides whether the measured +620 ms/chunk of
`bench.py --dynamic --chunk 6` (756 vs 136 ms p50) is device/transport
(shows up here) or host-side finalize work (does not).

Usage: python tools/chunk_dyn_probe.py [--reps 10] [--cpu]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=6)
    ap.add_argument("--classify-every", type=int, default=2)
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
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from slam_dynamic_tpu.config import (CameraConfig, CapacityConfig,
                                         DetectorConfig, ORBConfig,
                                         SystemConfig)
    from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
    from slam_dynamic_tpu.system import System
    from slam_dynamic_tpu.frontend.fused import (fused_track_chunk,
                                                 fused_track_chunk_dyn)

    C = args.chunk
    scfg = SynthConfig(n_frames=2 * C * (args.reps + 3) + 12,
                       dynamic_object=True, obj_size=1.6, obj_depth=3.0,
                       obj_speed=0.06)
    seq = generate(scfg)
    gray8 = np.clip(seq.gray, 0, 255).astype(np.uint8)
    d16 = np.clip(seq.depth * 1000.0, 0, 65535).astype(np.uint16)
    cfg = SystemConfig(
        camera=CameraConfig(fx=scfg.fx, fy=scfg.fy, cx=scfg.cx, cy=scfg.cy,
                            bf=scfg.fx * scfg.baseline, width=scfg.width,
                            height=scfg.height, th_depth=120.0,
                            fps=scfg.fps, depth_map_factor=1000.0),
        orb=ORBConfig(n_features=1000),
        detector=DetectorConfig(mode="precomputed"),
        capacity=CapacityConfig(max_keyframes=128, max_landmarks=32768,
                                max_keypoints=2048, local_ba_keyframes=8,
                                local_ba_landmarks=2048),
        sensor="rgbd")
    s = System(cfg)
    # warm a real map + tracker state (per-frame, with boxes so the box
    # tracker and dynamics ref queue are live)
    for i in range(12):
        det = seq.boxes[i][seq.box_valid[i]] if seq.box_valid[i, 0] else None
        s.track_rgbd(gray8[i], d16[i], float(seq.timestamps[i]),
                     detections=det)
    s.tracker.flush()
    tr = s.tracker
    cam, bounds, cfg_t = tr.cam, tr.bounds, tr.cfg
    dc = tr._scalar_consts()
    dyn = s._dyn_args(float(seq.timestamps[12]))
    assert dyn is not None, "dynamics inactive after warm"
    H, W = gray8.shape[1:]
    common = dict(
        orb_cfg=cfg_t.orb, height=H, width=W,
        mm_radius=dc["mm_radius"], local_radius=dc["local_radius"],
        depth_th=dc["depth_th"], scale_factor=dc["sf"],
        min_inliers_track=dc["min_tr"], sensor="rgbd",
        max_kf=cfg_t.capacity.local_ba_keyframes,
        max_lm=cfg_t.capacity.local_ba_landmarks,
        n_levels=cfg_t.orb.n_levels,
        n_slots=cfg_t.capacity.max_keypoints,
        depth_stride=1, depth_scale=dc["depth_scale"], chunk=C)
    B = cfg_t.dynamic.max_boxes
    bx_stack = jnp.full((C, B, 4), -1.0, jnp.float32)
    ba_stack = jnp.zeros((C, B), bool)
    last_ids = tr.last_frame.obs_lm
    if last_ids is None:
        last_ids = dc["no_obs"]
    R_last, t_last = tr.last_frame.R, tr.last_frame.t
    m, rk = tr.map, tr._ref_kf_const()

    def stacks(i):
        g = jnp.asarray(np.stack(gray8[i:i + C]))
        a = jnp.asarray(np.stack(d16[i:i + C]))
        return g, a

    def run(name, fn):
        ts = []
        for r in range(args.reps + 2):
            g, a = stacks(12 + r * C)
            t0 = time.perf_counter()
            outs, packed = fn(g, a)
            np.asarray(packed)
            dt = time.perf_counter() - t0
            if r >= 2:
                ts.append(dt)
        ms = np.sort(np.array(ts)) * 1e3
        print(f"{name}: p50 {np.median(ms):.1f} ms  p90 "
              f"{ms[int(len(ms)*0.9)]:.1f}  max {ms[-1]:.1f} "
              f"({len(ms)} reps, distinct inputs + packet readback)",
              flush=True)

    run("static chunk  dispatch+readback",
        lambda g, a: fused_track_chunk(
            m, cam, bounds, g, a, bx_stack, ba_stack, last_ids,
            R_last, t_last, R_last, t_last, dc["vel0"], rk, **common))
    run("dyn    chunk  dispatch+readback",
        lambda g, a: fused_track_chunk_dyn(
            m, cam, bounds, g, a, bx_stack, ba_stack,
            dyn["box_status"], dyn["ref_fd"], dyn["have_ref"],
            last_ids, R_last, t_last, R_last, t_last, dc["vel0"], rk,
            seed=dyn["seed"], classify_every=args.classify_every,
            **common))


if __name__ == "__main__":
    main()
