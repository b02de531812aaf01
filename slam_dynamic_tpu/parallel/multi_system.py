"""MultiSystem: B SLAM frontends tracked as ONE batched device program.

The DP frame axis of SURVEY §5.7, integrated with the real System/Tracker
state machines (not just the dryrun): B independent sequences — multiple
cameras on one chip, or per-host streams across a mesh — share a single
fused tracking call (`frontend/fused.py:fused_track_step_batch`) and a
single packed [B, 28] readback per frame. The per-sequence host state
machines (keyframe decisions, mapping, loop closing, relocalization) stay
exactly the single-System code: lanes that leave the steady OK state fall
back to their own System's scalar path for that frame and rejoin the
batch when healthy.

The reference runs one camera per process with pthreads inside
(/root/reference/src/System.cc:65-89); there is no multi-camera mode to
cite — this is the TPU-native serving design: the B maps live as ONE
stacked MapState pytree (stacked once at startup, never re-stacked), so
the batched step reads them in place; keyframe events slice out the one
affected map, run the normal mapping stage, and write the slice back.

Sharding: pass a mesh and the batch axis is laid out over its "dp" axis
(frames, maps and recurrent state all NamedSharding'd P("dp")), so XLA
runs each lane on its own device group with zero collectives. Without a
mesh it is plain batching on one device (MXU utilization win for small
frames).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..frontend.frame import Frame
from ..frontend.tracking import TrackStats
from ..system import System


# lane gather/scatter as ONE device call each (a plain tree_map issues one
# dispatch per leaf — ~30 for a MapState — and each dispatch costs ~5-10 ms
# through a latency-bound transport; keyframe events do both)
@jax.jit
def _read_lane_jit(tree, b):
    return jax.tree_util.tree_map(lambda x: x[b], tree)


@jax.jit
def _write_lane_jit(tree, lane, b):
    return jax.tree_util.tree_map(
        lambda full, one: full.at[b].set(one), tree, lane)


@jax.jit
def _merge_counters_jit(maps, vis, fnd, lane_mask):
    """Adopt the batched step's landmark counters only for masked lanes."""
    return maps._replace(
        lm_visible=jnp.where(lane_mask[:, None], vis, maps.lm_visible),
        lm_found=jnp.where(lane_mask[:, None], fnd, maps.lm_found))


@jax.jit
def _csrc_refresh_jit(vis, fnd, mvis, mfnd, b):
    """Reset lane b's counter-chain rows from the authoritative map."""
    return vis.at[b].set(mvis[b]), fnd.at[b].set(mfnd[b])


class MultiSystem:
    """Track B sequences with one batched device call per frame.

    Restrictions (fall back to per-lane scalar stepping otherwise):
    detector must be "off" (dynamic-scene classification carries per-lane
    reference-frame state; quarantine boxes per lane still work) and
    pipelining is handled by the batch itself (pipeline_depth forced 0).
    """

    def __init__(self, cfg: SystemConfig, n: int,
                 mesh=None, dp_axis: str = "dp", pipeline: bool = False):
        import dataclasses
        assert cfg.detector.mode == "off", \
            "MultiSystem batches the static-scene path; run dynamic " \
            "scenes on per-lane Systems"
        cfg = dataclasses.replace(
            cfg, tracking=dataclasses.replace(cfg.tracking,
                                              pipeline_depth=0))
        self.cfg = cfg
        self.n = n
        # 1-step pipelining: the packed readback of step i finalizes at
        # step i+1, overlapping the device compute with the next step's
        # upload (the single-System pipeline_depth=1 semantics, lifted to
        # the batch: keyframe/lost decisions lag ONE step). Call flush()
        # before reading trajectories.
        self.pipeline = pipeline
        self._pending = None
        self.mesh = mesh
        self._dp = dp_axis
        self.systems: List[System] = [System(cfg) for _ in range(n)]
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._sharding = NamedSharding(mesh, P(dp_axis))
        # the B maps as ONE stacked pytree (the batched call's input)
        self.maps = jax.tree_util.tree_map(
            lambda *xs: self._put(jnp.stack(xs)),
            *[s.tracker.map for s in self.systems])
        self._map_dirty = [False] * n     # lane map newer than self.maps
        self._consts = None
        self._ref_kf_batch = None   # (tuple of lane ref-kfs, device [n])
        # recurrent tracking state kept BATCHED on device between steps:
        # steady-state steps touch it with ZERO per-lane stacks/slices —
        # through a latency-bound transport every extra dispatch costs
        # ~5-10 ms, and the old per-step jnp.stack of per-lane handles made
        # a 4-lane step ~6x slower than the fused call itself
        self._bst = None          # dict: last_ids/R_last/t_last/R_p2/t_p2/
        #                           has_vel, all [n, ...] device arrays
        self._np_last = [None] * n   # (np_R, np_t) per lane for velocity
        self._boxes_empty = None     # cached [n]-broadcast empty box args
        # landmark-counter chain for dispatch: in pipelined mode the
        # in-flight step's OUTPUT counters feed the next dispatch (the
        # data dependency already exists through the recurrent state), so
        # the accumulation is C_i = C_{i-1} + b_i instead of the lossy
        # C_i = C_{i-2} + b_i that adopting finalize-time counters gives
        self._csrc = None            # (lm_visible, lm_found) for dispatch

    # ------------------------------------------------------------------
    def _put(self, x):
        if self._sharding is not None and x.ndim >= 1 \
                and x.shape[0] == self.n:
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = P(self._dp, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))
        return x

    def _bi(self, b):
        """Cached device int32 of a lane index (avoids per-event h2d)."""
        cache = getattr(self, "_bi_cache", None)
        if cache is None:
            import jax.numpy as _jnp
            cache = self._bi_cache = {
                i: _jnp.int32(i) for i in range(self.n)}
        return cache[b]

    def _sync_lane_to_batch(self, b):
        if self._map_dirty[b]:
            m = self.systems[b].tracker.map
            self.maps = _write_lane_jit(self.maps, m, self._bi(b))
            self._map_dirty[b] = False
            if self._csrc is not None:
                # the counter chain must restart from the lane's new
                # authoritative map row (KF inserts initialize new
                # landmarks' counters; scalar steps bumped them directly)
                self._csrc = _csrc_refresh_jit(
                    self._csrc[0], self._csrc[1],
                    self.maps.lm_visible, self.maps.lm_found, self._bi(b))

    def _materialize_lane(self, b):
        """tracker.map <- maps[b] (ONE gather call)."""
        tr = self.systems[b].tracker
        tr.map = _read_lane_jit(self.maps, self._bi(b))
        tr._kf_pose_cache.clear()

    def _patch_lane_state(self, b):
        """Write lane b's scalar-tracker recurrent state into the batched
        device state (called only on lane events: rejoin after fallback,
        keyframe insert — a few .at[b].set dispatches, never per-step)."""
        tr = self.systems[b].tracker
        dc = tr._scalar_consts()
        st = self._bst
        lf = tr.last_frame
        ids = lf.obs_lm if lf.obs_lm is not None else dc["no_obs"]
        R = jnp.asarray(lf.R)
        t = jnp.asarray(lf.t)
        p2 = tr._prev2_pose
        st["last_ids"] = st["last_ids"].at[b].set(ids)
        st["R_last"] = st["R_last"].at[b].set(R)
        st["t_last"] = st["t_last"].at[b].set(t)
        st["R_p2"] = st["R_p2"].at[b].set(p2[0] if p2 is not None else R)
        st["t_p2"] = st["t_p2"].at[b].set(p2[1] if p2 is not None else t)
        st["has_vel"] = st["has_vel"].at[b].set(
            0.0 if p2 is None else 1.0)
        self._np_last[b] = (np.asarray(lf.np_R) if lf.np_R is not None
                            else np.asarray(lf.R),
                            np.asarray(lf.np_t) if lf.np_t is not None
                            else np.asarray(lf.t))

    def _init_bstate(self):
        tr0 = self.systems[0].tracker
        dc = tr0._scalar_consts()
        n, N = self.n, self.cfg.capacity.max_keypoints
        eye = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
        z3 = jnp.zeros((n, 3))
        self._bst = {
            "last_ids": self._put(jnp.broadcast_to(dc["no_obs"], (n, N))),
            "R_last": self._put(eye), "t_last": self._put(z3),
            "R_p2": self._put(eye), "t_p2": self._put(z3),
            "has_vel": self._put(jnp.zeros(n)),
        }
        self._ones = self._put(jnp.ones(n))

    # ------------------------------------------------------------------
    def track_rgbd_batch(self, grays: Sequence[np.ndarray],
                         depths: Sequence[np.ndarray],
                         timestamps: Sequence[float]) -> List[TrackStats]:
        """One RGB-D frame for each of the B lanes.

        Steady-state cost per step: ONE stacked image upload, ONE fused
        batched device call, ONE packed [B, 28] readback. The recurrent
        state (last observations, last/prev poses) stays batched on
        device and is rotated by reference — per-lane device work happens
        only on events (keyframe, lost, fallback rejoin)."""
        assert self.cfg.sensor == "rgbd", self.cfg.sensor
        return self._track_batch(grays, depths, timestamps)

    def track_stereo_batch(self, lefts: Sequence[np.ndarray],
                           rights: Sequence[np.ndarray],
                           timestamps: Sequence[float]) -> List[TrackStats]:
        """One stereo pair for each of the B lanes (KITTI-style serving;
        same batched program with sensor='stereo': L+R extraction and
        row-band matching run vmapped on device)."""
        assert self.cfg.sensor == "stereo", self.cfg.sensor
        return self._track_batch(lefts, rights, timestamps)

    def _track_batch(self, grays: Sequence[np.ndarray],
                     auxes: Sequence[np.ndarray],
                     timestamps: Sequence[float]) -> List[TrackStats]:
        from ..frontend.fused import fused_track_step_batch
        assert len(grays) == self.n
        cfg = self.cfg
        depths = auxes          # aux = depth maps (rgbd) / right images
        batched: List[int] = []
        stats: List[Optional[TrackStats]] = [None] * self.n
        if self._bst is None:
            self._init_bstate()

        early = None
        if self.pipeline and self._pending is not None and any(
                s.tracker.state != "OK" for s in self.systems):
            # a lane is about to run its scalar path, which appends
            # trajectory entries — drain the in-flight step FIRST so its
            # (older) entries land in timestamp order
            prev, self._pending = self._pending, None
            fin = self._finalize_any(prev)
            early = fin[-1] if prev[0] == "chunk" else fin

        # lanes outside steady-state run their own scalar path (init,
        # lost->reloc, mono bootstrap); they write their map + recurrent
        # state back into the batch when they recover
        for b, s in enumerate(self.systems):
            if s.tracker.state == "OK":
                batched.append(b)
            else:
                self._materialize_lane(b)
                self._map_dirty[b] = True       # scalar path mutates map
                track1 = (s.track_rgbd if cfg.sensor == "rgbd"
                          else s.track_stereo)
                stats[b] = track1(np.asarray(grays[b]),
                                  np.asarray(depths[b]),
                                  float(timestamps[b]))
                self._sync_lane_to_batch(b)
                if s.tracker.state == "OK":     # rejoins next step
                    self._patch_lane_state(b)
        if not batched:
            return stats

        t0 = self.systems[batched[0]].tracker
        dc = t0._scalar_consts()
        H, W = np.asarray(grays[0]).shape

        # the batch ALWAYS spans all n slots (jit shape and the stacked
        # map batch never change); non-OK lanes compute garbage rows that
        # are simply ignored (their state rows are re-patched on rejoin)
        ds = cfg.tracking.depth_stride
        if cfg.sensor == "rgbd" and ds > 1:
            # strided depth upload (the batch path is upload-bound through
            # a latency transport; device samples at the low-res pixel)
            depths = [np.ascontiguousarray(np.asarray(x)[::ds, ::ds])
                      for x in depths]
        g = self._put(jnp.asarray(np.stack(grays)))
        d = self._put(jnp.asarray(np.stack(depths)))
        if self._boxes_empty is None:
            B = cfg.dynamic.max_boxes
            self._boxes_empty = (
                self._put(jnp.broadcast_to(dc["bx_empty"], (self.n, B, 4))),
                self._put(jnp.broadcast_to(dc["ba_empty"], (self.n, B))))
        bx, ba = self._boxes_empty
        depth_scale = dc["depth_scale"] if np.asarray(
            depths[batched[0]]).dtype == np.uint16 else None

        ref_ks = tuple(max(s.tracker.last_kf_id, 0) for s in self.systems)
        if self._ref_kf_batch is None or self._ref_kf_batch[0] != ref_ks:
            self._ref_kf_batch = (
                ref_ks, self._put(jnp.asarray(np.array(ref_ks, np.int32))))

        st = self._bst
        if self._csrc is None:
            self._csrc = (self.maps.lm_visible, self.maps.lm_found)
        maps_in = self.maps._replace(lm_visible=self._csrc[0],
                                     lm_found=self._csrc[1])
        out = fused_track_step_batch(
            maps_in, t0.cam, t0.bounds, g, d, bx, ba, st["last_ids"],
            st["R_last"], st["t_last"], st["R_p2"], st["t_p2"],
            st["has_vel"], self._ref_kf_batch[1],
            orb_cfg=cfg.orb, height=H, width=W,
            mm_radius=dc["mm_radius"], local_radius=dc["local_radius"],
            depth_th=dc["depth_th"], scale_factor=dc["sf"],
            min_inliers_track=dc["min_tr"], sensor=cfg.sensor,
            max_kf=cfg.capacity.local_ba_keyframes,
            max_lm=cfg.capacity.local_ba_landmarks,
            n_levels=cfg.orb.n_levels,
            n_slots=cfg.capacity.max_keypoints,
            depth_scale=depth_scale,
            depth_stride=(ds if cfg.sensor == "rgbd" else 1))

        # rotate the batched recurrent state BY REFERENCE (no device ops)
        self._bst = {
            "last_ids": out.obs_lm, "R_last": out.R, "t_last": out.t,
            "R_p2": st["R_last"], "t_p2": st["t_last"],
            "has_vel": self._ones,
        }
        # counter chain: next dispatch continues from THIS step's output
        # (non-OK lanes' rows are garbage; their next _sync_lane_to_batch
        # refreshes them from the authoritative map before the next use)
        self._csrc = (out.lm_visible, out.lm_found)

        step = ("frame", (out, [float(t) for t in timestamps], ref_ks,
                          batched))
        if self.pipeline:
            prev, self._pending = self._pending, step
            if prev is None:
                # nothing in flight (first step, or early-flushed above):
                # report the early-drained stats for lanes this step
                # didn't cover; lanes that ran the scalar fallback THIS
                # step keep their own stats and carry the drained step's
                # stats in drained_prev (so is_keyframe/LOST flags of the
                # drained frame are never silently dropped)
                if early is not None:
                    for b in range(self.n):
                        if stats[b] is None:
                            stats[b] = early[b]
                        elif early[b] is not None:
                            stats[b].drained_prev = early[b]
                return stats
            # return the PREVIOUS step's finalized stats (decisions lag 1
            # step); fallback lanes' stats from THIS step override theirs
            prev_stats = self._finalize_any(prev)
            if isinstance(prev_stats, list) and prev_stats and \
                    isinstance(prev_stats[0], list):
                prev_stats = prev_stats[-1]     # chunk: last frame's row
            for b in range(self.n):
                if stats[b] is not None:
                    prev_stats[b] = stats[b]
            return prev_stats
        fin = self._finalize_step(step[1])
        for b in range(self.n):
            if fin[b] is not None:
                stats[b] = fin[b]
        return stats

    # ------------------------------------------------------------------
    def track_rgbd_chunk_batch(self, grays, depths, timestamps):
        """B lanes x C consecutive frames in ONE device call + ONE packed
        [B, C, 28] readback (fused.fused_track_chunk_batch): the serving
        composition of lane batching and temporal chunking — the
        round-trip cost of a latency-bound transport divides by B*C.
        grays/depths/timestamps: [B][C] nested sequences. Decisions lag
        one chunk per lane; lanes outside steady state make the whole
        chunk fall back to per-frame batched stepping (rare). Returns the
        flat list of TrackStats finalized during this call."""
        assert self.cfg.sensor == "rgbd", self.cfg.sensor
        return self._track_chunk_batch(grays, depths, timestamps)

    def track_stereo_chunk_batch(self, lefts, rights, timestamps):
        assert self.cfg.sensor == "stereo", self.cfg.sensor
        return self._track_chunk_batch(lefts, rights, timestamps)

    def _track_chunk_batch(self, grays, auxes, timestamps):
        from ..frontend.fused import fused_track_chunk_batch
        cfg = self.cfg
        C = len(grays[0])
        sts: List[TrackStats] = []

        def fallback():
            for j in range(C):
                row = self._track_batch(
                    [np.asarray(g[j]) for g in grays],
                    [np.asarray(a[j]) for a in auxes],
                    [float(t[j]) for t in timestamps])
                sts.extend(st for st in row if st is not None)
            return sts

        if C == 1 or any(s.tracker.state != "OK" for s in self.systems):
            return fallback()
        if self._bst is None:
            self._init_bstate()
        t0 = self.systems[0].tracker
        dc = t0._scalar_consts()
        H, W = np.asarray(grays[0][0]).shape
        ds = cfg.tracking.depth_stride if cfg.sensor == "rgbd" else 1
        if cfg.sensor == "rgbd" and ds > 1:
            auxes = [[np.ascontiguousarray(np.asarray(x)[::ds, ::ds])
                      for x in al] for al in auxes]
        g = self._put(jnp.asarray(
            np.stack([np.stack([np.asarray(x) for x in gl])
                      for gl in grays])))
        d = self._put(jnp.asarray(
            np.stack([np.stack([np.asarray(x) for x in al])
                      for al in auxes])))
        key = ("chunk_empty_boxes", C)
        cache = getattr(self, "_chunk_boxes_cache", None)
        if cache is None or cache[0] != key:
            B = cfg.dynamic.max_boxes
            self._chunk_boxes_cache = cache = (key, (
                self._put(jnp.full((self.n, C, B, 4), -1.0, jnp.float32)),
                self._put(jnp.zeros((self.n, C, B), bool))))
        bx, ba = cache[1]
        depth_scale = dc["depth_scale"] if np.asarray(
            auxes[0][0]).dtype == np.uint16 else None
        ref_ks = tuple(max(s.tracker.last_kf_id, 0) for s in self.systems)
        if self._ref_kf_batch is None or self._ref_kf_batch[0] != ref_ks:
            self._ref_kf_batch = (
                ref_ks, self._put(jnp.asarray(np.array(ref_ks, np.int32))))
        st = self._bst
        if self._csrc is None:
            self._csrc = (self.maps.lm_visible, self.maps.lm_found)
        maps_in = self.maps._replace(lm_visible=self._csrc[0],
                                     lm_found=self._csrc[1])
        outs, packed_dev = fused_track_chunk_batch(
            maps_in, t0.cam, t0.bounds, g, d, bx, ba, st["last_ids"],
            st["R_last"], st["t_last"], st["R_p2"], st["t_p2"],
            st["has_vel"], self._ref_kf_batch[1],
            orb_cfg=cfg.orb, height=H, width=W,
            mm_radius=dc["mm_radius"], local_radius=dc["local_radius"],
            depth_th=dc["depth_th"], scale_factor=dc["sf"],
            min_inliers_track=dc["min_tr"], sensor=cfg.sensor,
            max_kf=cfg.capacity.local_ba_keyframes,
            max_lm=cfg.capacity.local_ba_landmarks,
            n_levels=cfg.orb.n_levels,
            n_slots=cfg.capacity.max_keypoints,
            depth_scale=depth_scale,
            depth_stride=(ds if cfg.sensor == "rgbd" else 1), chunk=C)
        self._bst = {
            "last_ids": outs[-1].obs_lm, "R_last": outs[-1].R,
            "t_last": outs[-1].t, "R_p2": outs[-2].R, "t_p2": outs[-2].t,
            "has_vel": self._ones,
        }
        self._csrc = (outs[-1].lm_visible, outs[-1].lm_found)
        ts = [[float(t) for t in tl] for tl in timestamps]
        step = ("chunk", (outs, packed_dev, ts, ref_ks, C))
        if self.pipeline:
            prev, self._pending = self._pending, step
            if prev is not None:
                # prev may be a "frame" step (a flat [B] row — the lane
                # bootstrap runs per-frame batches through the same
                # pipeline slot) or a "chunk" step ([C][B] rows)
                sts.extend(self._flat_stats(self._finalize_any(prev)))
            return sts
        sts.extend(self._flat_stats(self._finalize_any(step)))
        return sts

    @staticmethod
    def _flat_stats(fin):
        """Flatten finalize output — [B] (frame step) or [C][B] (chunk
        step) — into a flat TrackStats list, dropping Nones."""
        out = []
        for row in fin:
            if row is None:
                continue
            if isinstance(row, list):
                out.extend(st for st in row if st is not None)
            else:
                out.append(row)
        return out

    def _finalize_chunk(self, step):
        """Finalize a chunk step: ONE [B, C, 28+] readback, then the
        per-lane host state machine frame by frame (a lane that goes LOST
        mid-chunk skips its remaining frames — they chained on device
        from a lost pose). Returns [C][B] stats rows."""
        outs, packed_dev, ts, ref_ks, C = step
        self.maps = self.maps._replace(lm_visible=outs[-1].lm_visible,
                                       lm_found=outs[-1].lm_found)
        packed = np.asarray(packed_dev)          # [B, C, 28]
        rows = []
        for j in range(C):
            row: List[Optional[TrackStats]] = [None] * self.n
            for b in range(self.n):
                if self.systems[b].tracker.state != "OK":
                    continue
                row[b] = self._lane_post(b, outs[j], packed[b, j],
                                         ts[b][j], ref_ks[b],
                                         allow_obs_patch=False)
            rows.append(row)
        return rows

    def _finalize_any(self, step):
        kind, payload = step
        if kind == "chunk":
            return self._finalize_chunk(payload)
        return self._finalize_step(payload)

    def flush(self):
        """Drain the in-flight pipelined step (call before reading
        trajectories)."""
        if self._pending is None:
            return None
        prev, self._pending = self._pending, None
        fin = self._finalize_any(prev)
        if prev[0] == "chunk":
            return [st for row in fin for st in row if st is not None]
        return fin

    def _finalize_step(self, step) -> List[Optional[TrackStats]]:
        out, ts, ref_ks, batched = step
        # batched landmark-statistics update — but ONLY for lanes that
        # were in the batch: fallback lanes' rows were computed from
        # stale state and overwriting their counters would wrongly drive
        # found/visible ratios toward culling
        if len(batched) == self.n:
            self.maps = self.maps._replace(lm_visible=out.lm_visible,
                                           lm_found=out.lm_found)
        else:
            bset = tuple(sorted(batched))
            cache = getattr(self, "_bmask_cache", None)
            if cache is None or cache[0] != bset:
                m = np.zeros(self.n, bool)
                m[list(batched)] = True
                self._bmask_cache = cache = (bset, self._put(jnp.asarray(m)))
            self.maps = _merge_counters_jit(self.maps, out.lm_visible,
                                            out.lm_found, cache[1])
        packed = np.asarray(out.packed)          # the ONE readback [B, 28]
        stats: List[Optional[TrackStats]] = [None] * self.n
        for b in batched:
            stats[b] = self._lane_post(b, out, packed[b], ts[b], ref_ks[b])
        return stats

    def _lane_post(self, b, out, pk, ts, ref_k,
                   allow_obs_patch: bool = True) -> TrackStats:
        """Host state machine for one batched lane from its packet row —
        device work (FrameData slices, map materialization) happens ONLY
        on keyframe / lost events."""
        cfg = self.cfg
        sys_b = self.systems[b]
        tr = sys_b.tracker
        n_mm, n_map = int(pk[0]), int(pk[1])
        np_R = pk[4:13].reshape(3, 3)
        np_t = pk[13:16]
        np_Rk = pk[16:25].reshape(3, 3)
        np_tk = pk[25:28]
        lost = (n_mm < cfg.tracking.min_inliers_track
                or n_map < cfg.tracking.min_inliers_localmap)

        def make_frame():
            fd_b = _read_lane_jit(out.fd, self._bi(b))
            frame = Frame(data=fd_b, frame_id=sys_b.frame_id, timestamp=ts,
                          ref_kf=ref_k, np_R=np_R, np_t=np_t,
                          np_Rk=np_Rk, np_tk=np_tk)
            frame.R, frame.t = out.R[b], out.t[b]
            frame.obs_lm = out.obs_lm[b]
            return frame

        # velocity (host numpy mirror, feeds the scalar path on fallback)
        last_np = self._np_last[b]
        if last_np is not None:
            Rv = np_R @ last_np[0].T
            tv = np_t - Rv @ last_np[1]
            tr.velocity = (Rv, tv)
        self._np_last[b] = (np_R, np_t)
        # relative-trajectory bookkeeping from the packet's ref-KF pose
        R_rel = np_R @ np_Rk.T
        t_rel = np_t - R_rel @ np_tk
        tr.trajectory.append((ts, ref_k, R_rel, t_rel))

        if lost:
            tr.state = "LOST"
            frame = make_frame()            # scalar reloc needs handles
            tr.last_frame = frame
            tr._prev2_pose = None
            sys_b.frame_id += 1
            return TrackStats("LOST", n_inliers_mm=n_mm,
                              n_inliers_map=n_map, frame_id=frame.frame_id)

        tr.frames_since_kf += 1
        st = TrackStats("OK", n_inliers_mm=n_mm, n_inliers_map=n_map,
                        frame_id=sys_b.frame_id, np_R=np_R, np_t=np_t)
        if tr.localization_only:
            # VO-mode dual-hypothesis arbitration, same as the scalar
            # path (tracking.py _post_track, ref Tracking.cc:728-766):
            # while map tracking is weak, also relocalize and PREFER that
            # solution over the drifting motion-model pose
            relocated = False
            if tr.vo_mode and tr.relocalizer is not None:
                self._materialize_lane(b)
                frame = make_frame()
                tr.last_frame = frame
                ok_r, Rr, tr_r, obs = tr.relocalizer(frame)
                if ok_r:
                    r_R = np.asarray(Rr, np.float32)
                    r_t = np.asarray(tr_r, np.float32)
                    frame.R = jnp.asarray(r_R)
                    frame.t = jnp.asarray(r_t)
                    frame.np_R, frame.np_t = r_R, r_t
                    if obs is not None:
                        frame.obs_lm = obs
                    st.np_R, st.np_t = r_R, r_t
                    tr._prev2_pose = None        # velocity invalid now
                    # this frame's trajectory entry and the batched
                    # recurrent state must follow the preferred pose
                    R_rel = r_R @ np_Rk.T
                    t_rel = r_t - R_rel @ np_tk
                    tr.trajectory[-1] = (ts, ref_k, R_rel, t_rel)
                    self._np_last[b] = (r_R, r_t)
                    self._patch_lane_state(b)
                    relocated = True             # ref: mbVO = false
            tr.vo_mode = (not relocated and
                          n_map < cfg.tracking.vo_mode_inliers)
        if not tr.localization_only and \
                tr._need_keyframe_counts(n_map, int(pk[2]), int(pk[3])):
            self._materialize_lane(b)
            frame = make_frame()
            tr.last_frame = frame
            pre_map = tr.map
            before = tr.kf_seq
            tr._create_keyframe(frame, n_map)
            st.is_keyframe = tr.kf_seq > before
            if st.is_keyframe:
                # the ref-KF id enters the batch from the next dispatch;
                # the refreshed observation row only in sync mode (in
                # pipelined mode the batch state has already rotated to a
                # NEWER frame — same skew as the single-System pipeline)
                if not self.pipeline and allow_obs_patch:
                    self._bst["last_ids"] = \
                        self._bst["last_ids"].at[b].set(frame.obs_lm)
                self._ref_kf_batch = None
            if tr.map is not pre_map:
                self._map_dirty[b] = True
                self._sync_lane_to_batch(b)
        sys_b.frame_id += 1
        if sys_b._gba is not None:
            # the amortized GBA merge must apply to the lane's CURRENT map
            # and its correction must be written back into the batch —
            # otherwise the next lane event's _materialize_lane would
            # clobber tracker.map with the uncorrected batch copy and the
            # whole post-loop global BA would be silently discarded
            self._materialize_lane(b)
            pre = tr.map
            sys_b._gba_step()
            if tr.map is not pre:
                self._map_dirty[b] = True
                self._sync_lane_to_batch(b)
        return st

    # ------------------------------------------------------------------
    def trajectories(self):
        self.flush()
        return [s.trajectory for s in self.systems]
