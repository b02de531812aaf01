#!/usr/bin/env python
"""Benchmark driver: tracked frames/s/chip + ATE on the synthetic sequence.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: tracked frames/s/chip on the standard 640x480 RGB-D
sequence (1000 ORB features/frame, full pipeline: extraction, depth
association, motion-model + local-map tracking, keyframing, local BA).
`vs_baseline` is the ratio to the reference's implicit real-time budget of
30 fps (TUM camera rate — the reference's own real-time claim, SURVEY §6;
it publishes no quantitative numbers, BASELINE.md).

Flags:
  --quick     short CPU run (sanity)
  --frames N  sequence length (default 60)
  --ate       report ATE RMSE instead of fps
"""
import argparse
import json
import os
import sys
import threading
import time

import numpy as np

# Shared progress for the watchdog: if the driver's budget is nearly
# exhausted (or the device hangs — e.g. another process holds the
# exclusive TPU), we still emit the ONE JSON line with partial results.
_progress = {"t_start": time.time(), "t_timed0": None, "frames": 0,
             "done": False}
_progress_lock = threading.Lock()


def _log(msg):
    print(f"[bench t={time.time() - _progress['t_start']:.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _watchdog(budget_s: float):
    time.sleep(budget_s)
    with _progress_lock:
        if _progress["done"]:
            return
        n = _progress["frames"]
        t0 = _progress["t_timed0"]
    if t0 is not None and n >= 5:
        fps = n / (time.time() - t0)
        out = {"metric": "tracked frames/s/chip (640x480 RGB-D, full SLAM, "
                         "partial: watchdog budget hit)",
               "value": round(fps, 2), "unit": "fps",
               "vs_baseline": round(fps / 30.0, 3), "partial_frames": n}
    else:
        out = {"metric": "tracked frames/s/chip (640x480 RGB-D, full SLAM)",
               "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
               "error": "watchdog: no timed frames completed — device "
                        "unresponsive (is another process holding the "
                        "exclusive TPU?)"}
    _log(f"WATCHDOG fired after {budget_s}s; emitting partial result")
    print(json.dumps(out), flush=True)
    os._exit(0)


def _restore_jax_cache(_log):
    """Unpack the committed compile-cache tarball if .jax_cache is empty.

    First-compiles of the fused per-frame graphs through the axon tunnel
    take minutes — far beyond the watchdog budget — so the persistent
    XLA compile cache is shipped as `assets/jax_cache.tar.gz` (the
    .jax_cache directory itself is gitignored and gets cleaned between
    rounds). Repack after hot-path changes with `tools/pack_jax_cache.py`.
    """
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    tarball = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "assets", "jax_cache.tar.gz")
    if os.path.isdir(cache_dir) and os.listdir(cache_dir):
        return
    if not os.path.exists(tarball):
        return
    import tarfile
    _log(f"restoring compile cache from {tarball}")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        with tarfile.open(tarball, "r:gz") as tf:
            tf.extractall(cache_dir, filter="data")
        _log(f"restored {len(os.listdir(cache_dir))} cache entries")
    except Exception as e:  # cache is an optimization, never fatal
        _log(f"cache restore failed (continuing cold): {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--frames", type=int, default=120,
                    help="sequence length (default 120: the per-chunk "
                         "transport cost varies ~2x by time window — a "
                         "longer timed window averages over it)")
    ap.add_argument("--ate", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pipeline", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="pipelined readback (decisions lag N frames; "
                         "measured +23%% fps at ~2mm ATE cost)")
    ap.add_argument("--pipeline-depth", type=int, default=1,
                    help="in-flight frames when --pipeline (default 1)")
    ap.add_argument("--depth-stride", type=int, default=1,
                    help="upload every Nth depth pixel (device samples "
                         "keypoints at the low-res pixel)")
    ap.add_argument("--stereo", action="store_true",
                    help="bench the stereo pipeline (L/R extraction + "
                         "row-band matching) instead of RGB-D")
    ap.add_argument("--dynamic", action="store_true",
                    help="bench the dynamic-scene pipeline: moving object "
                         "+ per-frame boxes + fused H/F classification "
                         "(the framework's namesake workload)")
    ap.add_argument("--classify-every", type=int, default=2,
                    help="dynamic mode: run the fused H/F classification "
                         "on every Nth frame (skip frames dispatch the "
                         "light dyn executable). The LIBRARY default is 1 "
                         "(reference parity); the bench defaults to 2 — "
                         "the measured throughput/verdict-lag tradeoff "
                         "(RESULTS.md)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="temporal chunking: track N consecutive frames "
                         "per device call (ONE upload + ONE packed "
                         "readback per N frames) — amortizes the "
                         "transport round trip; decisions lag one chunk. "
                         "DEFAULT 6 (measured best: 36.9 fps through the "
                         "axon tunnel vs 30 fps budget, RESULTS.md); pass "
                         "--chunk 1 for the per-frame pipeline")
    ap.add_argument("--eager-finalize", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="chunked mode: finalize the previous chunk before "
                         "dispatching the next (KF decisions lag C-j not "
                         "2C-j frames; costs the readback/compute overlap: "
                         "24.3 fps / 5.0 mm vs 30.2 fps / 5.9 mm measured)")
    ap.add_argument("--multi", type=int, default=0,
                    help="batched-serving mode: track N sequences as ONE "
                         "MultiSystem (single chip, one fused device call "
                         "+ one packed readback per step for all N lanes); "
                         "reports AGGREGATE frames/s/chip")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", "420")),
                    help="watchdog: emit partial JSON and exit after this "
                         "many seconds (warm-cache full run is ~110s)")
    args = ap.parse_args()

    threading.Thread(target=_watchdog, args=(args.budget,),
                     daemon=True).start()
    cpu_fallback = False
    if not (args.cpu or args.quick):
        # a wedged tunnel hangs PJRT client init forever (RESULTS.md
        # incident notes); probe in a SUBPROCESS so the main process can
        # still fall back to a clearly-labeled CPU measurement instead of
        # timing out with no number.
        # Multiple attempts: a single marginal timeout (CPU contention
        # slowing client init, or the tunnel server timing out a dead
        # client) must not demote a healthy device to the CPU fallback —
        # but probing is BUDGET-AWARE (round-4 postmortem: the raw
        # 150+90+300 s plan consumed 412 s of the 420 s watchdog and the
        # fallback never ran). Probes stop early so that the labeled
        # CPU-fallback measurement ALWAYS has enough budget left to
        # complete; override the plan via BENCH_PROBE_S=comma,seconds.
        import subprocess
        rc = -1
        fallback_reserve_s = min(170.0, 0.5 * args.budget)
        probe_deadline = _progress["t_start"] + min(
            0.55 * args.budget, args.budget - fallback_reserve_s)
        probe_plan = tuple(
            float(x) for x in os.environ.get(
                "BENCH_PROBE_S", "150,90,300").split(","))
        # test hook: BENCH_PROBE_CMD replaces the probe payload (e.g.
        # "sleep 1000" rehearses an unresponsive device without one)
        probe_cmd = os.environ.get("BENCH_PROBE_CMD")
        probe_argv = (["/bin/sh", "-c", probe_cmd] if probe_cmd else
                      [sys.executable, "-c",
                       "import jax, jax.numpy as jnp;"
                       "print(float(jnp.ones(8).sum()))"])
        for attempt, probe_s in enumerate(probe_plan):
            left = probe_deadline - time.time()
            if left < 15.0:
                _log(f"probe budget exhausted (keeping "
                     f"{fallback_reserve_s:.0f}s reserve for the CPU "
                     f"fallback); skipping remaining attempts")
                break
            probe_s = min(probe_s, left)
            _log(f"probing device health (attempt {attempt + 1}, "
                 f"{probe_s:.0f}s subprocess)")
            try:
                rc = subprocess.call(
                    probe_argv,
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                    timeout=probe_s)
            except subprocess.TimeoutExpired:
                rc = -1
            if rc == 0:
                break
        if rc != 0:
            _log("DEVICE UNRESPONSIVE — falling back to CPU "
                 "(metric will say so)")
            cpu_fallback = True
            args.frames = min(args.frames, 36)   # fit the reserve window
            # (measured: the chunk=6 CPU fallback at 36 frames completes
            # in ~40 s warm-cache / well under the 170 s reserve cold)
    _restore_jax_cache(_log)
    _log(f"start (watchdog {args.budget:.0f}s); importing jax")
    import jax
    if args.cpu or args.quick or cpu_fallback:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: repeat runs (e.g. the driver's bench
    # invocation) skip the multi-minute first-compile of the fused graphs
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from slam_dynamic_tpu.config import (SystemConfig, CameraConfig,
                                         ORBConfig, DetectorConfig,
                                         CapacityConfig)
    from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
    from slam_dynamic_tpu.io.evo import ate_rmse
    from slam_dynamic_tpu.system import System

    dyn_kw = dict(dynamic_object=True, obj_size=1.6, obj_depth=3.0,
                  obj_speed=0.06) if args.dynamic else {}
    if args.quick:
        scfg = SynthConfig(n_frames=12, width=320, height=240, fx=260.0,
                           fy=260.0, cx=159.5, cy=119.5,
                           stereo=args.stereo, **dyn_kw)
        nfeat, nkp = 600, 1024
    else:
        scfg = SynthConfig(n_frames=args.frames, stereo=args.stereo,
                           **dyn_kw)
        nfeat, nkp = 1000, 2048
    seq = generate(scfg)

    # camera-native dtypes: uint8 gray + uint16 millimetre depth (what a
    # real RGB-D sensor emits) — h2d is 0.7MB/frame instead of 2.4MB;
    # conversion to float metres happens on device (frontend/fused.py)
    gray8 = np.clip(seq.gray, 0, 255).astype(np.uint8)
    if args.stereo:
        aux8 = np.clip(seq.right, 0, 255).astype(np.uint8)
    else:
        aux8 = np.clip(seq.depth * 1000.0, 0, 65535).astype(np.uint16)

    cfg = SystemConfig(
        camera=CameraConfig(fx=scfg.fx, fy=scfg.fy, cx=scfg.cx, cy=scfg.cy,
                            bf=scfg.fx * scfg.baseline, width=scfg.width,
                            height=scfg.height, th_depth=120.0,
                            fps=scfg.fps, depth_map_factor=1000.0),
        orb=ORBConfig(n_features=nfeat),
        detector=DetectorConfig(
            mode="precomputed" if args.dynamic else "off"),
        capacity=CapacityConfig(max_keyframes=128, max_landmarks=32768,
                                max_keypoints=nkp, local_ba_keyframes=8,
                                local_ba_landmarks=2048),
        sensor="stereo" if args.stereo else "rgbd")
    import dataclasses
    if args.pipeline:
        cfg = cfg.replace(tracking=dataclasses.replace(
            cfg.tracking, pipeline_depth=args.pipeline_depth))
    if args.depth_stride > 1:
        cfg = cfg.replace(tracking=dataclasses.replace(
            cfg.tracking, depth_stride=args.depth_stride))
    if args.eager_finalize:
        cfg = cfg.replace(tracking=dataclasses.replace(
            cfg.tracking, chunk_eager_finalize=True))
    if args.dynamic and args.classify_every != 1:
        cfg = cfg.replace(dynamic=dataclasses.replace(
            cfg.dynamic, classify_every=args.classify_every))
    # warm up and time the SAME system: the first n_warm frames run with a
    # forced keyframe cadence so every jit unit (fused step, mapping stage,
    # loop-closer BoW) compiles before the timed window — first-compiles
    # through the tunnel take minutes and must not pollute steady-state
    # numbers — then cadence config is swapped back (host-side only; no
    # recompiles) and the remaining frames are timed.
    def track(s, i):
        # NOTE: prefetch_next (worker-thread upload of frame i+1) was
        # tried here and REGRESSED through the axon tunnel (21.6 -> 14.8
        # fps): the worker's h2d RPCs contend with the critical packed
        # readback on the serialized transport. Keep feeds synchronous.
        det = None
        if args.dynamic and seq.box_valid[i, 0]:
            det = seq.boxes[i][seq.box_valid[i]]
        if args.stereo:
            return s.track_stereo(gray8[i], aux8[i],
                                  float(seq.timestamps[i]),
                                  detections=det)
        return s.track_rgbd(gray8[i], aux8[i], float(seq.timestamps[i]),
                            detections=det)

    if args.chunk is None:
        # no-args default: temporal chunking at C=6 — the measured-best
        # single-sequence mode through the axon tunnel (RESULTS.md:
        # 36.9 fps vs 24.6 at C=4 and 34.9 at C=8; ATE 22.7 mm).
        # DYNAMIC scenes also default to chunking since round 5: with
        # the chunked classify stride (classify_every_chunked=2) the
        # dyn chunk costs only ~98 ms more than the static chunk
        # (tools/chunk_dyn_probe.py) — same-window 120-frame pair:
        # 24.1 fps / 13.7 mm chunked vs 20.5 fps / 12.1 mm per-frame.
        # The r3 negative result (chunking loses on dynamic scenes)
        # predates the stride and the matmul-precision fix; pass
        # --chunk 1 for the per-frame latency-oriented pipeline.
        args.chunk = 0 if args.multi else 6
    if args.multi and args.multi > 1:
        return _run_multi(args, scfg, seq, gray8, aux8, cfg, _log,
                          cpu_fallback)
    if args.chunk and args.chunk > 1:
        return _run_chunk(args, scfg, seq, gray8, aux8, cfg, _log,
                          cpu_fallback)

    warm_cfg = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, max_frames_between_kf=3))
    if args.dynamic:
        # a dynamic-MODE frame whose box tracker is EMPTY (object out of
        # view) dispatches the STATIC fused_track_step (system._dyn_args
        # returns None) — compile it too, on a throwaway System, or it
        # lands mid-window (measured: one 19.4 s straggler frame)
        s0 = System(warm_cfg)
        for i in range(min(4, scfg.n_frames)):
            if args.stereo:
                s0.track_stereo(gray8[i], aux8[i], float(seq.timestamps[i]))
            else:
                s0.track_rgbd(gray8[i], aux8[i], float(seq.timestamps[i]))
        del s0
        _log("static-step executable warmed (dynamic mode)")
    sys_ = System(warm_cfg)
    n_warm = min(10, scfg.n_frames - 1)
    _log(f"warmup: {n_warm} frames (compiles all jit units; cache dir "
         f".jax_cache)")
    for i in range(n_warm):
        track(sys_, i)
        _log(f"warm frame {i} done")
    # restore real cadence for the timed window (read live per-frame)
    sys_.cfg = cfg
    sys_.tracker.cfg = cfg
    _warm_loop_detect(sys_, _log)

    _log("timed window start")
    t0 = time.time()
    with _progress_lock:
        _progress["t_timed0"] = t0
    frame_times = []
    kf_frames = 0
    for i in range(n_warm, scfg.n_frames):
        f0 = time.time()
        st = track(sys_, i)
        frame_times.append(time.time() - f0)
        kf_frames += bool(st.is_keyframe)
        with _progress_lock:
            _progress["frames"] = len(frame_times)
    dt = time.time() - t0
    with _progress_lock:
        _progress["done"] = True
    n_timed = scfg.n_frames - n_warm
    fps = n_timed / dt
    ft = np.sort(np.asarray(frame_times)) * 1e3
    import sys as _sys
    print(f"[bench] frame ms: p50 {np.median(ft):.1f} p90 "
          f"{ft[int(len(ft)*0.9)]:.1f} max {ft[-1]:.1f}; "
          f"kf frames {kf_frames}/{n_timed}", file=_sys.stderr)

    traj = sys_.trajectory
    est = np.stack([-R.T @ t for _, R, t in traj])
    gt = seq.t_wc[:len(est)]
    ate = ate_rmse(est, gt)

    if args.ate:
        out = {"metric": "ATE RMSE (synthetic RGB-D, evo_ape-equivalent -as)",
               "value": round(ate, 5), "unit": "m",
               "vs_baseline": round(0.02 / max(ate, 1e-9), 3)}
    else:
        kind = "stereo" if args.stereo else "RGB-D"
        if args.dynamic:
            kind += " dynamic-scene"
        label = f"tracked frames/s/chip (640x480 {kind}, full SLAM)"
        if cpu_fallback:
            label += (" — CPU FALLBACK, TPU device unresponsive; healthy-"
                      "device numbers in RESULTS.md")
        out = {"metric": label,
               "value": round(fps, 2), "unit": "fps",
               "vs_baseline": round(fps / 30.0, 3),
               "ate_m": round(ate, 5)}
    if cpu_fallback:
        out["cpu_fallback"] = True
    print(json.dumps(out))
    return 0


def _warm_loop_detect(sys_, _log):
    """Compile-warm the loop-detection graph: its first REAL invocation
    is at keyframe k >= 10, typically inside the timed window — through
    the tunnel that lands a multi-second compile straggler on one frame
    (measured: max 2.2 s). One dummy call compiles the same executable."""
    if sys_.loop is None:
        return
    import jax.numpy as jnp
    from slam_dynamic_tpu.backend.loop_closing import _detect_device
    from slam_dynamic_tpu.models import vocabulary as voc_mod
    m = sys_.tracker.map
    bv = voc_mod.transform(sys_.voc, m.kf_kp_desc[0], m.kf_kp_valid[0])
    sb = voc_mod.sparse_bow(bv, top_w=sys_.loop.db.word.shape[1])
    np.asarray(_detect_device(sys_.loop.db, sb, m.covis, m.kf_valid,
                              jnp.int32(0)))
    _log("loop-detect graph warmed")


def _run_chunk(args, scfg, seq, gray8, aux8, cfg, _log, cpu_fallback=False):
    """Temporal-chunking throughput: C consecutive frames per device call
    (Tracker.step_images_chunk) — ONE upload + ONE packed [C, 28]
    readback per C frames. The single-sequence offline/dataset-processing
    headline: through a latency-bound transport the per-frame round-trip
    cost divides by C."""
    import dataclasses
    from slam_dynamic_tpu.io.evo import ate_rmse
    from slam_dynamic_tpu.system import System
    C = args.chunk
    nf = scfg.n_frames
    warm_cfg = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, max_frames_between_kf=3))
    sys_ = System(warm_cfg)
    ts = [float(t) for t in seq.timestamps]

    def det(i):
        if args.dynamic and seq.box_valid[i, 0]:
            return seq.boxes[i][seq.box_valid[i]]
        return None

    def chunk_kwargs(i):
        if not args.dynamic:
            return {}
        return dict(detections=[det(i + j) for j in range(C)])

    # bootstrap per-frame until tracking is OK, then chunk
    i = 0
    while sys_.tracker.state != "OK" and i < 6:
        sys_.track_rgbd(gray8[i], aux8[i], ts[i], detections=det(i))
        i += 1
    n_warm_steps = max(0, min(3, (nf - i) // C - 1))
    _log(f"chunk[{C}] warmup: {n_warm_steps} chunked steps")
    for w in range(n_warm_steps):
        sys_.track_chunk([gray8[i + j] for j in range(C)],
                         [aux8[i + j] for j in range(C)],
                         [ts[i + j] for j in range(C)], **chunk_kwargs(i))
        i += C
        _log(f"warm chunk {w} done")
    real_cfg = sys_.cfg.replace(tracking=dataclasses.replace(
        sys_.cfg.tracking,
        max_frames_between_kf=cfg.tracking.max_frames_between_kf))
    sys_.cfg = real_cfg
    sys_.tracker.cfg = real_cfg
    _warm_loop_detect(sys_, _log)
    _log("timed window start")
    t0 = time.time()
    with _progress_lock:
        _progress["t_timed0"] = t0
    step_times = []
    trace = []
    n_timed = 0
    while i + C <= nf:
        f0 = time.time()
        sts = sys_.track_chunk([gray8[i + j] for j in range(C)],
                               [aux8[i + j] for j in range(C)],
                               [ts[i + j] for j in range(C)],
                               **chunk_kwargs(i))
        step_times.append(time.time() - f0)
        if os.environ.get("BENCH_TRACE"):
            # logging deferred to AFTER the timed loop (stderr I/O inside
            # the window skews the headline fps); label by the FINALIZED
            # frames' ids — stats lag one chunk behind dispatch index i
            fids = [s.frame_id for s in sts]
            trace.append((fids, step_times[-1],
                          sum(bool(s.is_keyframe) for s in sts),
                          sys_.tracker.n_kf_host))
        i += C
        n_timed += C
        with _progress_lock:
            _progress["frames"] = n_timed
    sys_.tracker.flush()
    dt = time.time() - t0
    with _progress_lock:
        _progress["done"] = True
    for fids, st_s, nk, nkf in trace:
        rng = f"{fids[0]}..{fids[-1]}" if fids else "-"
        _log(f"chunk frames {rng}: {st_s*1e3:.1f} ms, kf {nk}, "
             f"n_kf_host {nkf}")
    fps = n_timed / dt
    st_ms = np.sort(np.asarray(step_times)) * 1e3
    print(f"[bench] chunk ms (={C} frames): p50 {np.median(st_ms):.1f} "
          f"p90 {st_ms[int(len(st_ms)*0.9)]:.1f} max {st_ms[-1]:.1f}",
          file=sys.stderr)
    traj = sys_.trajectory
    est = np.stack([-R.T @ t for _, R, t in traj])
    ate = ate_rmse(est, seq.t_wc[:len(est)])
    kind = "stereo" if cfg.sensor == "stereo" else "RGB-D"
    if args.dynamic:
        kind += " dynamic-scene"
    label = (f"tracked frames/s/chip (chunk={C} frames/call, 640x480 "
             f"{kind}, full SLAM)")
    if cpu_fallback:
        label += (" — CPU FALLBACK, TPU device unresponsive; healthy-"
                  "device numbers in RESULTS.md")
    out = {"metric": label, "value": round(fps, 2), "unit": "fps",
           "vs_baseline": round(fps / 30.0, 3), "ate_m": round(ate, 5)}
    if cpu_fallback:
        out["cpu_fallback"] = True
    print(json.dumps(out))
    return 0


def _run_multi(args, scfg, seq, gray8, aux8, cfg, _log,
               cpu_fallback=False):
    """Batched-serving throughput: N lanes in ONE MultiSystem — a single
    fused device call + one packed [N, 28] readback per step drives all N
    host state machines (parallel/multi_system.py). Through a latency-
    bound transport the lanes amortize the per-step round trip, so the
    AGGREGATE frames/s/chip is the serving-mode headline. Lanes track the
    same synthetic scene phase-shifted by 3 steps each, desynchronizing
    keyframe events (a keyframe materializes only its own lane)."""
    import dataclasses
    from slam_dynamic_tpu.io.evo import ate_rmse
    from slam_dynamic_tpu.parallel.multi_system import MultiSystem
    n = args.multi
    if cfg.detector.mode != "off":
        # MultiSystem batches the static-scene path (per-lane dynamics
        # carry reference-frame state) — run dynamic scenes single-lane
        _log("multi mode forces detector off (--dynamic ignored)")
        cfg = cfg.replace(detector=cfg.detector.__class__(mode="off"))
    # warm with a forced keyframe cadence so the KF-event path (lane
    # gather/scatter, mapping stage, BoW) compiles before the timed window
    warm_cfg = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, max_frames_between_kf=3))
    ms = MultiSystem(warm_cfg, n, pipeline=True)
    nf = scfg.n_frames
    idx = lambda i, b: max(0, min(i - 3 * b, nf - 1))

    track_batch = (ms.track_stereo_batch if cfg.sensor == "stereo"
                   else ms.track_rgbd_batch)
    C = args.chunk if args.chunk and args.chunk > 1 else 1
    chunk_batch = (ms.track_stereo_chunk_batch if cfg.sensor == "stereo"
                   else ms.track_rgbd_chunk_batch)

    def step(i):
        if C > 1:
            # B lanes x C frames in ONE device call (the composition of
            # lane batching and temporal chunking — B*C tracked frames
            # per transport round trip)
            return chunk_batch(
                [[gray8[idx(i + j, b)] for j in range(C)]
                 for b in range(n)],
                [[aux8[idx(i + j, b)] for j in range(C)]
                 for b in range(n)],
                [[float(seq.timestamps[idx(i + j, b)]) for j in range(C)]
                 for b in range(n)])
        return track_batch(
            [gray8[idx(i, b)] for b in range(n)],
            [aux8[idx(i, b)] for b in range(n)],
            [float(seq.timestamps[idx(i, b)]) for b in range(n)])

    n_warm = min(14, nf - 1)
    _log(f"multi[{n}]{f' x chunk[{C}]' if C > 1 else ''} warmup: "
         f"{n_warm} steps")
    for i in range(0, n_warm, C):
        step(i)
        _log(f"warm step {i} done")
    # restore the real cadence (host-side only; no recompiles)
    real_cfg = ms.cfg.replace(tracking=dataclasses.replace(
        ms.cfg.tracking,
        max_frames_between_kf=cfg.tracking.max_frames_between_kf))
    ms.cfg = real_cfg
    for s in ms.systems:
        s.cfg = real_cfg
        s.tracker.cfg = real_cfg
    _log("timed window start")
    t0 = time.time()
    with _progress_lock:
        _progress["t_timed0"] = t0
    step_times = []
    n_timed = 0
    for i in range(n_warm, nf - C + 1, C):
        f0 = time.time()
        step(i)
        step_times.append(time.time() - f0)
        n_timed += C
        with _progress_lock:
            _progress["frames"] = n_timed * n
    ms.flush()
    dt = time.time() - t0
    with _progress_lock:
        _progress["done"] = True
    fps = n_timed * n / dt
    st_ms = np.sort(np.asarray(step_times)) * 1e3
    print(f"[bench] step ms (={n * C} frames): p50 {np.median(st_ms):.1f} "
          f"p90 {st_ms[int(len(st_ms)*0.9)]:.1f} max {st_ms[-1]:.1f}",
          file=sys.stderr)
    # accuracy: lane 0 runs the unshifted sequence
    traj = ms.systems[0].trajectory
    est = np.stack([-R.T @ t for _, R, t in traj])
    ate = ate_rmse(est, seq.t_wc[:len(est)])
    kind = "stereo" if cfg.sensor == "stereo" else "RGB-D"
    ck = f" x chunk={C}" if C > 1 else ""
    label = (f"aggregate tracked frames/s/chip ({n} lanes{ck}, 640x480 "
             f"{kind}, batched MultiSystem)")
    if cpu_fallback:
        label += (" — CPU FALLBACK, TPU device unresponsive; healthy-"
                  "device numbers in RESULTS.md")
    out = {"metric": label,
           "value": round(fps, 2), "unit": "fps",
           "vs_baseline": round(fps / 30.0, 3), "ate_m": round(ate, 5),
           "per_lane_fps": round(fps / n, 2)}
    if cpu_fallback:
        out["cpu_fallback"] = True
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
