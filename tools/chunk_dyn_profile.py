#!/usr/bin/env python
"""cProfile the bench's chunked-dynamic loop (System.track_chunk) to
locate the host-side cost that the dispatch+readback probe
(tools/chunk_dyn_probe.py) exonerates: on TPU the dyn chunk executable
costs static+11 ms, yet `bench.py --dynamic --chunk 6` records
756 ms/chunk vs 136 ms static."""
import cProfile
import pstats
import sys
import time

sys.path.insert(0, ".")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=48)
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
    import numpy as np
    from slam_dynamic_tpu.config import (CameraConfig, CapacityConfig,
                                         DetectorConfig, ORBConfig,
                                         SystemConfig)
    from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
    from slam_dynamic_tpu.system import System

    C = 6
    scfg = SynthConfig(n_frames=args.frames + 12, dynamic_object=True,
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
        detector=DetectorConfig(mode="precomputed"),
        capacity=CapacityConfig(max_keyframes=128, max_landmarks=32768,
                                max_keypoints=2048, local_ba_keyframes=8,
                                local_ba_landmarks=2048),
        sensor="rgbd")
    s = System(cfg)
    ts = [float(t) for t in seq.timestamps]

    def det(i):
        return (seq.boxes[i][seq.box_valid[i]]
                if seq.box_valid[i, 0] else None)

    i = 0
    while s.tracker.state != "OK" and i < 6:
        s.track_rgbd(gray8[i], d16[i], ts[i], detections=det(i))
        i += 1
    # warm chunks (compiles already cached; warms the jit dispatch path)
    for _ in range(2):
        s.track_chunk([gray8[i + j] for j in range(C)],
                      [d16[i + j] for j in range(C)],
                      [ts[i + j] for j in range(C)],
                      detections=[det(i + j) for j in range(C)])
        i += C

    pr = cProfile.Profile()
    n = 0
    t0 = time.perf_counter()
    pr.enable()
    while i + C <= args.frames + 6:
        s.track_chunk([gray8[i + j] for j in range(C)],
                      [d16[i + j] for j in range(C)],
                      [ts[i + j] for j in range(C)],
                      detections=[det(i + j) for j in range(C)])
        i += C
        n += 1
    pr.disable()
    dt = time.perf_counter() - t0
    print(f"{n} chunks, {dt / n * 1e3:.1f} ms/chunk")
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(28)


if __name__ == "__main__":
    main()
