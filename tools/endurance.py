"""KITTI-scale endurance run: thousands of frames, loops, bounded map.

The reference's longest benchmark sequences (KITTI 00: 4.5k stereo
frames, ORB-SLAM2 keeps >1k keyframes) exercise lifetime behavior that
short tests cannot: keyframe-capacity recycling (state.next_kf_slot),
repeated loop closures on the same graph executable, memory flatness,
and fps drift. This driver runs the orbit world for N frames (multiple
revolutions -> repeated loop closures), logging fps / RSS / map
occupancy per window and a final ATE.

Usage:
    python tools/endurance.py --frames 2000 --cpu
    python tools/endurance.py --frames 2000            # real TPU
"""
import argparse
import dataclasses
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--max-kf", type=int, default=256,
                    help="keyframe capacity; must span the revisit "
                         "period (~cadence*capacity frames) for loop "
                         "closure — a smaller budget exercises the "
                         "sliding-window eviction path instead")
    ap.add_argument("--window", type=int, default=200,
                    help="frames per stats window")
    ap.add_argument("--prewarm-recovery",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="compile the LOST->reloc path on a throwaway "
                         "System before the timed loop")
    ap.add_argument("--trace", type=int, nargs=2, default=None,
                    metavar=("FROM", "TO"),
                    help="log per-frame state/inliers for frames in "
                         "[FROM, TO) — failure-window diagnosis")
    ap.add_argument("--limit", type=int, default=0,
                    help="process only the first N frames of the generated "
                         "world (0 = all) — the world SHAPE depends on "
                         "--frames, so debugging an event at frame ~900 of "
                         "the 2000-frame world needs --frames 2000 "
                         "--limit 1000, not --frames 1000")
    ap.add_argument("--pipeline", type=int, default=1,
                    help="pipeline_depth (1 = overlap readback with next "
                         "dispatch, the bench per-frame default; 0 = sync)")
    ap.add_argument("--reloc-correction",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="A/B switch for the reloc-triggered drift "
                         "correction (loop.reloc_correction)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # count XLA compilations so the run can prove steady state: after the
    # first window every executable must be compiled — a nonzero count
    # later means a shape/dtype leak retracing the hot path
    import logging

    class _CompileCounter(logging.Handler):
        def __init__(self):
            super().__init__()
            self.count = 0

        def emit(self, record):
            if "Compiling" in record.getMessage():
                self.count += 1

    _cc = _CompileCounter()
    jax.config.update("jax_log_compiles", True)
    logging.getLogger("jax").addHandler(_cc)
    import numpy as np

    from slam_dynamic_tpu.config import (SystemConfig, CameraConfig,
                                         ORBConfig, CapacityConfig)
    from slam_dynamic_tpu.io.evo import ate_rmse
    from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
    from slam_dynamic_tpu.system import System

    # several revolutions over one scene: repeated revisits + closures
    turns = max(2.2, args.frames / 900.0)
    scfg = SynthConfig(n_frames=args.frames, width=args.width,
                       height=args.height, fx=260.0, fy=260.0,
                       cx=args.width / 2 - 0.5, cy=args.height / 2 - 0.5,
                       trajectory="orbit", orbit_turns=turns)
    t0 = time.time()
    seq = generate(scfg)
    print(f"[endurance] generated {args.frames} frames "
          f"({time.time() - t0:.0f}s), {turns:.1f} revolutions",
          file=sys.stderr)

    cfg = SystemConfig(
        camera=CameraConfig(fx=scfg.fx, fy=scfg.fy, cx=scfg.cx, cy=scfg.cy,
                            bf=scfg.fx * scfg.baseline, width=scfg.width,
                            height=scfg.height, th_depth=120.0,
                            fps=scfg.fps),
        orb=ORBConfig(n_features=600),
        capacity=CapacityConfig(max_keyframes=args.max_kf,
                                max_landmarks=16384, max_keypoints=1024,
                                local_ba_keyframes=8,
                                local_ba_landmarks=2048),
        sensor="rgbd")
    cfg = cfg.replace(
        tracking=dataclasses.replace(
            cfg.tracking, max_frames_between_kf=8,
            pipeline_depth=args.pipeline),
        loop=dataclasses.replace(
            cfg.loop, reloc_correction=args.reloc_correction))
    sys_ = System(cfg)

    gray8 = np.clip(seq.gray, 0, 255).astype(np.uint8)
    d16 = np.clip(seq.depth * 1000.0, 0, 65535).astype(np.uint16)

    if args.prewarm_recovery:
        # compile the LOST->relocalization path BEFORE the timed loop: a
        # long run's first loss otherwise pays multi-second first-hit
        # compiles mid-window (measured r5: 24 post-warmup compiles, fps
        # window dip 19.8 -> 3.8 at the first loss). A throwaway System
        # tracks a few real frames, then textureless frames force LOST +
        # reloc attempts, then real frames compile the recovery-success
        # path; shapes match the main run (same config/capacities).
        t0p = time.time()
        mode = os.environ.get("ENDURANCE_PREWARM_MODE", "full")
        s0 = System(cfg.replace(tracking=dataclasses.replace(
            cfg.tracking, max_frames_between_kf=3)))
        blank_g = np.zeros_like(gray8[0])
        blank_d = np.zeros_like(d16[0])
        k = 0
        if mode != "construct":
            for i in range(10):
                s0.track_rgbd(gray8[i], d16[i], float(seq.timestamps[i]))
                k += 1
        if mode == "full":
            for _ in range(3):
                s0.track_rgbd(blank_g, blank_d,
                              float(seq.timestamps[k])); k += 1
            for i in range(10, 16):
                s0.track_rgbd(gray8[i], d16[i], float(seq.timestamps[k]))
                k += 1
            # also compile the reloc-CORRECTION executables (Sim3 match/
            # solve, depth fallback, pose graph, SearchAndFuse): in the
            # slow-revisit world no detector loop ever closes, so the
            # first real correction would otherwise first-hit compile
            # them mid-window (measured: +50 compiles at the loss event)
            try:
                m0 = s0.tracker.map
                kl = s0.tracker.last_kf_id
                cd = 0 if kl != 0 else 1
                s0.loop._compute_sim3(m0, kl, cd, True)
                okw, s_r, R_r, t_r, _, _ = \
                    s0.loop._compute_sim3_depth(m0, kl, cd)
                if not okw:
                    R_r = np.asarray(m0.kf_R[cd]) @ \
                        np.asarray(m0.kf_R[kl]).T
                    t_r = np.asarray(m0.kf_t[cd]) - \
                        R_r @ np.asarray(m0.kf_t[kl])
                    s_r = 1.0
                mw = s0.loop._correct(m0, kl, cd, s_r, R_r, t_r)
                s0.loop._search_and_fuse(mw, kl, cd)
            except Exception as e:   # prewarm must never kill the run
                print(f"[endurance] correction prewarm skipped: {e}",
                      file=sys.stderr)
        del s0
        print(f"[endurance] recovery path prewarmed "
              f"({time.time() - t0p:.0f}s, compiles so far {_cc.count})",
              file=sys.stderr)
    windows = []
    lost = loops = 0
    compiles_at_warmup = None
    tw = time.time()
    n_run = min(args.frames, args.limit) if args.limit else args.frames
    for i in range(n_run):
        st = sys_.track_rgbd(gray8[i], d16[i], float(seq.timestamps[i]))
        lost += st.state == "LOST"
        if args.trace and args.trace[0] <= i < args.trace[1]:
            t = sys_.tracker
            print(f"[trace] f={i} fin={st.frame_id} st={st.state} "
                  f"mm={st.n_inliers_mm} map={st.n_inliers_map} "
                  f"kf={int(st.is_keyframe)} tracker={t.state} "
                  f"n_kf={t.n_kf_host}", file=sys.stderr)
        ll = getattr(sys_, "last_loop", None)
        if ll and ll.closed:
            loops += 1
            sys_.last_loop = None
        if (i + 1) % args.window == 0:
            dt = time.time() - tw
            tw = time.time()
            t = sys_.tracker
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
            if compiles_at_warmup is None:
                # end of window 1 = warmup boundary: every executable the
                # steady state touches must exist by now
                compiles_at_warmup = _cc.count
            w = dict(frame=i + 1, fps=round(args.window / dt, 2),
                     rss_mb=rss, kf_seq=t.kf_seq,
                     kf_live=int(np.asarray(t.map.kf_valid).sum()),
                     lm_live=int(np.asarray(t.map.lm_valid).sum()),
                     loops=loops, lost=lost,
                     compiles=_cc.count)
            windows.append(w)
            print(f"[endurance] {json.dumps(w)}", file=sys.stderr)

    est = np.stack([-R.T @ t for _, R, t in sys_.trajectory])
    gt = seq.t_wc[:len(est)]
    ate = ate_rmse(est, gt)
    fps_all = [w["fps"] for w in windows]
    out = dict(frames=args.frames, ate_m=round(float(ate), 4),
               kf_seq=sys_.tracker.kf_seq,
               kf_capacity=args.max_kf, loops=loops, lost=lost,
               reloc_corrections=getattr(sys_, "n_reloc_corrections", 0),
               fps_first=fps_all[0], fps_last=fps_all[-1],
               fps_drift=round(fps_all[-1] / max(fps_all[0], 1e-9), 3),
               rss_first_mb=windows[0]["rss_mb"],
               rss_last_mb=windows[-1]["rss_mb"],
               compiles_total=_cc.count,
               compiles_after_warmup=_cc.count - (compiles_at_warmup or 0))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
