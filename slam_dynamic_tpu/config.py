"""Typed configuration tree for the whole framework.

One dataclass tree replaces the reference's three config mechanisms
(/root/reference — SURVEY §5.6): OpenCV FileStorage YAMLs (camera/ORB/viewer
params, src/Tracking.cc:54-152), the compile-time ``YOLO_S`` macro
(src/Tracking.cc:41), and scattered hardcoded constants (thresholds in
src/Tracking.cc:623,954,1267,1326, box gates :818,853-856, yolo paths
src/yolo.cc:17-24). Everything is runtime-configurable here; no compile-time
switches.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class CameraConfig:
    fx: float = 535.4
    fy: float = 539.2
    cx: float = 320.1
    cy: float = 247.6
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    bf: float = 40.0          # baseline(m) * fx; 0 for monocular
    fps: float = 30.0
    width: int = 640
    height: int = 480
    rgb: bool = True          # channel order of input images
    depth_map_factor: float = 5000.0  # TUM depth png scaling
    th_depth: float = 40.0    # close/far threshold in baseline units


@dataclass(frozen=True)
class ORBConfig:
    """ORB extractor parameters (reference YAML `ORBextractor.*` +
    ORBextractor ctor, src/ORBextractor.cc:410-479)."""

    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    # TPU-specific capacities (static shapes): per-level raw FAST cap before
    # spatial selection, and the grid used for uniform distribution.
    max_raw_per_level: int = 4096
    cell_size: int = 32       # spatial-binning cell for uniform selection
    edge_threshold: int = 19  # border margin for descriptors (ref :442)
    batched_levels: bool = False  # True: one [L,H,W] op stack (fewest ops;
    # best on dispatch-bound backends); False: per-level pipeline (least
    # intermediate bytes; faster through the axon tunnel)


@dataclass(frozen=True)
class MatcherConfig:
    """Hamming matcher thresholds (include/ORBmatcher.h:93-95)."""

    th_low: int = 50
    th_high: int = 100
    histo_length: int = 30
    nn_ratio_tracking: float = 0.9
    nn_ratio_reloc: float = 0.75
    check_orientation: bool = True


@dataclass(frozen=True)
class TrackingConfig:
    """Frontend state machine (src/Tracking.cc)."""

    min_frames_between_kf: int = 0
    max_frames_between_kf: int = 30        # defaults to fps in reference
    motion_model_radius: float = 15.0      # SearchByProjection th (stereo 7 / mono 15)
    local_map_radius: float = 3.0          # wide=5, narrow=... ref :2040-2060
    min_inliers_track: int = 10            # ref :1786,:1688
    min_inliers_localmap: int = 30         # ref :1829
    min_inliers_after_reloc: int = 50
    reloc_max_candidates: int = 8
    # dynamic-scene handling
    mono_init_min_matches: int = 100       # ref :1445 (scale with features)
    pipeline_depth: int = 0                # 1 = overlap the packed readback
    # of frame t with the dispatch of frame t+1 (decisions lag one frame,
    # like the reference's async LocalMapping thread); 0 = synchronous
    adaptive_pipeline: bool = False        # pipelined mode: when the oldest
    # in-flight packet is NOT yet ready (non-blocking is_ready poll), run
    # up to 2 frames deeper instead of stalling — the slack the
    # reference's async LocalMapping has. OFF by default because the
    # readiness poll makes TRACKING DECISIONS timing-dependent: compile-
    # cache warmth / host load shift keyframe decisions by 1-2 landmarks
    # from the first mapping window and the divergence compounds
    # chaotically over long runs (measured r5: the endurance prewarm
    # flipped the 2000-frame loss count 12<->8 through this branch alone),
    # violating the same-seed -> same-trajectory determinism the framework
    # otherwise guarantees (SURVEY §5.2 rebuild note). Opt in for
    # latency-tolerant serving where throughput beats reproducibility.
    # (Always off through the axon tunnel: >1 unsynced in-flight frame
    # triggers the tunnel queue pathology — RESULTS.md incident note.)
    chunk_eager_finalize: bool = False     # chunked mode: finalize the
    # previous chunk (readback + keyframe insertion) BEFORE dispatching
    # the next one, so a keyframe triggered inside chunk N reaches the
    # map for chunk N+1 instead of chunk N+2 — decision lag C-j instead
    # of 2C-j frames. Costs part of the readback/compute overlap:
    # measured on the TPU tunnel (r5, with chunk_eager_upload_first)
    # 30.4 fps / 4.98 mm ATE@60f (eager) vs 36.3 fps / 5.94 mm
    # (overlapped) — the default stays overlapped (throughput headroom
    # first); flip on for accuracy-critical runs, it now clears the
    # 30 fps budget too.
    chunk_eager_upload_first: bool = True  # eager-finalize variant: ISSUE
    # the next chunk's image-stack h2d before the previous chunk's
    # blocking packet readback (map/pose/keyframe snapshots still happen
    # after the finalize, so the dispatch sees the updated map exactly
    # like plain eager). A full-duplex transport streams the upload
    # under the finalize, recovering part of the overlap eager gives up;
    # a strictly serialized transport makes it a no-op (same total).
    # Only consulted when chunk_eager_finalize=True.
    depth_stride: int = 1                  # upload every Nth depth pixel
    # (rgbd fused path): depth is only sampled at keypoints, so stride 2
    # quarters the depth h2d bytes for ~nearest-pixel sampling error;
    # 1 = full resolution
    ref_frame_age_s: float = 0.2           # ref :623
    frame_queue_factor: float = 0.3        # queue cap 0.3*fps, ref :954
    dyn_confirm_frames: int = 2            # 2 consecutive dyn frames, ref :1213
    max_lost_frames: int = 90              # consecutive LOST frames before
    # the map is reinitialized from scratch (trajectory preserved as
    # absolute poses; 0 = never). Relocalization can only rescue a loss
    # within the RETAINED map — after keyframe eviction at capacity, or
    # in genuinely new terrain, a prolonged loss would otherwise deadlock
    # (no reloc target AND no new keyframes while LOST; measured on the
    # 2000-frame endurance run)
    bow_fallback: bool = True              # on track failure, descriptor-
    # match vs the reference keyframe (no projection gate) and re-optimize
    # BEFORE declaring LOST — the TrackReferenceKeyFrame analog (ref
    # Tracking.cc:1618-1660, SearchByBoW ORBmatcher.cc:159); one extra
    # device call on the rare bad frame
    vo_mode_inliers: int = 20              # localization-only "VO mode"
    # threshold: below this many local-map inliers the tracker is deemed
    # to be doing visual odometry (ref mbVO, Tracking.cc:728-766) and the
    # next frame runs the dual-hypothesis MM-vs-relocalization arbitration


@dataclass(frozen=True)
class DynamicConfig:
    """Dynamic-object subsystem (boxes, geometric reclassification)."""

    max_boxes: int = 16                    # static capacity of box slots
    iou_match_threshold: float = 0.3       # boxTrack gate (ref Frame.cc:508)
    velocity_ghost_frames: int = 1         # carry lost boxes this many frames
    chi2_homography: float = 5.991         # ref Tracking.cc:1267
    chi2_fundamental: float = 5.841        # ref Tracking.cc:1326 (1-dof 0.95-ish)
    ransac_hypotheses: int = 256           # batched RANSAC rounds
    ransac_threshold_px: float = 3.0
    classify_every_chunked: int = 2        # chunked-dyn mode: run the H/F
    # classification on every Nth frame of a chunk (skipped frames emit
    # verdict 0 = unknown, which the host streak logic ignores). The
    # reference already needs 2 CONSECUTIVE dynamic verdicts to confirm
    # (Tracking.cc:1213-1226), so the streak semantics survive at half
    # rate — and the fused classification is the chunk's dominant device
    # cost. 1 = classify every frame.
    classify_every: int = 1                # per-frame pipeline: classify on
    # every Nth frame; skip frames dispatch the LIGHT dyn executable
    # (fused_track_step_dyn with classify=False — the static executable
    # only runs when the box tracker is empty, see system._dyn_args) —
    # through a per-dispatch-cost transport the classify executable is
    # the dominant per-frame cost. Streak semantics survive at stride N
    # (confirmation needs 2 CLASSIFIED dynamic frames -> up to 2N wall
    # frames), but the LIBRARY default matches the reference, which
    # classifies every frame (ref Tracking.cc:968-1367); throughput-
    # oriented callers (bench.py --dynamic) opt into stride 2.
    min_pairs_for_model: int = 20
    box_center_margin: Tuple[float, float] = (0.2, 0.8)   # ref :818
    max_object_depth: float = 20.0         # ref :853
    max_depth_jump: float = 5.0            # ref :856
    shrink_w: float = 0.8                  # Segmentation_ box reshape: width*0.8
    grow_h: float = 1.6                    # height*1.6 (src/yolo.cc:142-149)


@dataclass(frozen=True)
class DetectorConfig:
    """Online detector (yolo.cc equivalent) / offline box loading."""

    mode: str = "precomputed"              # "precomputed" | "online" | "off"
    conf_threshold: float = 0.5            # include/yolo.h:24
    nms_threshold: float = 0.4
    input_size: Tuple[int, int] = (640, 480)
    max_detections: int = 32
    dynamic_classes: Tuple[int, ...] = (0, 1, 2, 3, 5, 7)  # person/bicycle/car/moto/bus/truck (coco ids)
    weights_path: Optional[str] = None     # .npz from tools/train_detector.py
    # (None -> the shipped assets/detector_synth.npz if present)
    quarantine_pad: float = 0.25           # inflate ONLINE detections by
    # this fraction before feature quarantine: detector boxes are not
    # pixel-tight and an uncovered sliver of a moving object corrupts the
    # pose (the mask-dilation analog of the reference's Mask-R-CNN path)


@dataclass(frozen=True)
class MappingConfig:
    """Local mapping thread equivalents (src/LocalMapping.cc)."""

    culling_min_found_ratio: float = 0.25
    triangulation_neighbors: int = 10      # 20 for mono (ref :219)
    # stereo/RGB-D far-point triangulation: neighbors fused into the
    # keyframe device stage (each adds a full NxN match+triangulate block
    # to the jit graph; 2 covers the recent-motion pairs that matter)
    stereo_tri_neighbors: int = 2
    fuse_neighbors: int = 10
    kf_redundancy_ratio: float = 0.9       # KeyFrameCulling rule
    min_covisibility_weight: int = 15      # KeyFrame::UpdateConnections


@dataclass(frozen=True)
class LoopConfig:
    """Loop closing (src/LoopClosing.cc)."""

    enabled: bool = True
    covisibility_consistency_th: int = 3
    sim3_min_inliers: int = 20
    sim3_total_matches: int = 40
    fix_scale: bool = True                 # stereo/RGB-D: s=1
    kf_gap: int = 10                       # ignore loops to recent KFs (ref :115)
    run_global_ba: bool = False            # post-loop full BA (ref spawns a
    # GBA thread, LoopClosing.cc:646); off by default to keep tests fast.
    # When on, the solve is AMORTIZED: gba_slice_iters GN iterations are
    # dispatched per subsequent frame, then merged (no frame-time spike).
    gba_slice_iters: int = 3
    # correct map drift when relocalization succeeds (beyond-reference:
    # the reference's Relocalization, src/Tracking.cc:2212, re-poses the
    # tracker but leaves the drifted approach keyframes/landmarks in the
    # map). A successful reloc is a verified loop observation: the last
    # pre-loss keyframe vs the matched old keyframe go through the
    # standard Sim3 verification + essential-graph correction +
    # SearchAndFuse (backend/loop_closing.py:on_relocalization).
    reloc_correction: bool = True
    # act only when the measured Sim3 disagrees with the current estimates
    # by more than the Sim3 solve's own noise floor — measured ~4 mm /
    # ~1.4 mrad on a mature clean map and up to ~15 mm on a young
    # (20-frame) map whose duplicate landmarks carry triangulation noise
    # (tests/test_reloc_correction.py + the kidnap canary). Below the
    # gate a pose-graph run would only redistribute solver noise; real
    # slow-revisit drift is several cm (endurance trace, RESULTS.md r5)
    reloc_correction_min_t: float = 0.02       # meters
    reloc_correction_min_rad: float = 0.01     # radians
    reloc_correction_min_scale: float = 0.005  # |s - 1| (mono only)


@dataclass(frozen=True)
class VocabularyConfig:
    k: int = 10
    levels: int = 4                        # 10^4 = 10k words (ref uses 10^6)
    direct_index_level: int = 2            # levels-up analog (ComputeBoW lvl 4 of 6)
    # restrict relocalization's SearchByBoW analog to pairs sharing a
    # direct-index node (ORBmatcher.cc:159). On TPU the dense MXU Hamming
    # matrix is already one matmul, so the node gate buys no time — it is
    # a RECALL/precision knob. Measured (tools/direct_index_bench.py):
    # the gate loses matches near node boundaries and with it reloc
    # inliers, so the default stays dense; flip on for corpora where
    # cross-node matches are predominantly false positives.
    use_direct_index: bool = False
    path: Optional[str] = None             # packed .npz vocabulary
    # False: ignore the shipped synthetic-corpus asset and train from the
    # first keyframe's own descriptors (scene-adapted words can give
    # better recall on imagery far from the asset's training corpus)
    prefer_asset: bool = True


@dataclass(frozen=True)
class OptimizerConfig:
    """GN/LM engine (src/Optimizer.cc)."""

    pose_rounds: int = 4                   # PoseOptimization: 4 rounds
    pose_iters_per_round: int = 10         # x 10 LM iters (ref :370)
    chi2_mono: float = 5.991
    chi2_stereo: float = 7.815
    local_ba_iters: Tuple[int, int] = (5, 10)
    global_ba_iters: int = 20
    essential_graph_iters: int = 20
    sim3_iters: int = 5
    lambda_init: float = 1e-3


@dataclass(frozen=True)
class CapacityConfig:
    """Static capacities for the fixed-shape map state (TPU requirement).

    The reference's dynamically-growing pointer graph becomes fixed-capacity
    struct-of-arrays with validity masks; these set the capacities.
    """

    max_keypoints: int = 2048              # per frame (>= ORBConfig.n_features)
    max_keyframes: int = 512
    max_landmarks: int = 65536
    max_obs_per_kf: int = 2048
    local_ba_keyframes: int = 32
    local_ba_landmarks: int = 4096
    max_loop_edges: int = 16               # persistent loop constraints
    max_matches: int = 2048
    # essential-graph edge capacity: `LoopCloser._correct` pads its edge
    # arrays to this so every closure reuses ONE compiled
    # optimize_pose_graph executable (a fresh shape would retrace — and a
    # fresh compile through the axon tunnel costs minutes). Sized for
    # max_keyframes spanning edges + strong-covis fan-in + loop edges.
    max_pose_graph_edges: int = 4096


@dataclass(frozen=True)
class PointCloudConfig:
    """Dense mapping (src/pointcloudmapping.cc)."""

    enabled: bool = False
    stride: int = 3                        # every 3rd pixel (ref :66)
    min_depth: float = 0.01
    max_depth: float = 5.0
    voxel_resolution: float = 0.04


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout for distributed BA / multi-host streaming."""

    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("kf",)
    dp_axis: Optional[str] = None


@dataclass(frozen=True)
class SystemConfig:
    camera: CameraConfig = field(default_factory=CameraConfig)
    orb: ORBConfig = field(default_factory=ORBConfig)
    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    dynamic: DynamicConfig = field(default_factory=DynamicConfig)
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    mapping: MappingConfig = field(default_factory=MappingConfig)
    loop: LoopConfig = field(default_factory=LoopConfig)
    vocabulary: VocabularyConfig = field(default_factory=VocabularyConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    capacity: CapacityConfig = field(default_factory=CapacityConfig)
    pointcloud: PointCloudConfig = field(default_factory=PointCloudConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    sensor: str = "rgbd"                   # "mono" | "stereo" | "rgbd"
    seed: int = 0

    def replace(self, **kw) -> "SystemConfig":
        return dataclasses.replace(self, **kw)


def load_yaml(path: str) -> SystemConfig:
    """Load a reference-style dataset YAML (Camera.*, ORBextractor.*, ...)
    into the typed tree. Understands the OpenCV FileStorage subset used by
    the reference configs (e.g. Examples/Stereo/KITTI04-12.yaml)."""
    kv = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if ":" not in line or line.startswith("%"):
                continue
            k, v = line.split(":", 1)
            v = v.strip()
            if not v:
                continue
            try:
                kv[k.strip()] = float(v) if "." in v or "e" in v.lower() else int(v)
            except ValueError:
                kv[k.strip()] = v

    g = kv.get
    cam = CameraConfig(
        fx=g("Camera.fx", 535.4), fy=g("Camera.fy", 539.2),
        cx=g("Camera.cx", 320.1), cy=g("Camera.cy", 247.6),
        k1=g("Camera.k1", 0.0), k2=g("Camera.k2", 0.0),
        p1=g("Camera.p1", 0.0), p2=g("Camera.p2", 0.0), k3=g("Camera.k3", 0.0),
        bf=g("Camera.bf", 0.0), fps=float(g("Camera.fps", 30.0)),
        width=int(g("Camera.width", 640)), height=int(g("Camera.height", 480)),
        rgb=bool(g("Camera.RGB", 1)),
        depth_map_factor=g("DepthMapFactor", 5000.0),
        th_depth=g("ThDepth", 40.0),
    )
    orb = ORBConfig(
        n_features=int(g("ORBextractor.nFeatures", 1000)),
        scale_factor=g("ORBextractor.scaleFactor", 1.2),
        n_levels=int(g("ORBextractor.nLevels", 8)),
        ini_th_fast=int(g("ORBextractor.iniThFAST", 20)),
        min_th_fast=int(g("ORBextractor.minThFAST", 7)),
    )
    pc = PointCloudConfig(
        voxel_resolution=g("PointCloudMapping.Resolution", 0.04))
    return SystemConfig(camera=cam, orb=orb, pointcloud=pc)
