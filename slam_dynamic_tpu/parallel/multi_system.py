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


def _tree_slice(tree, b):
    return jax.tree_util.tree_map(lambda x: x[b], tree)


class MultiSystem:
    """Track B sequences with one batched device call per frame.

    Restrictions (fall back to per-lane scalar stepping otherwise):
    detector must be "off" (dynamic-scene classification carries per-lane
    reference-frame state; quarantine boxes per lane still work) and
    pipelining is handled by the batch itself (pipeline_depth forced 0).
    """

    def __init__(self, cfg: SystemConfig, n: int,
                 mesh=None, dp_axis: str = "dp"):
        import dataclasses
        assert cfg.detector.mode == "off", \
            "MultiSystem batches the static-scene path; run dynamic " \
            "scenes on per-lane Systems"
        cfg = dataclasses.replace(
            cfg, tracking=dataclasses.replace(cfg.tracking,
                                              pipeline_depth=0))
        self.cfg = cfg
        self.n = n
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

    # ------------------------------------------------------------------
    def _put(self, x):
        if self._sharding is not None and x.ndim >= 1 \
                and x.shape[0] == self.n:
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = P(self._dp, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))
        return x

    def _sync_lane_to_batch(self, b):
        if self._map_dirty[b]:
            m = self.systems[b].tracker.map
            self.maps = jax.tree_util.tree_map(
                lambda full, one: full.at[b].set(one), self.maps, m)
            self._map_dirty[b] = False

    def _materialize_lane(self, b):
        """tracker.map <- maps[b] (lazy device slices)."""
        tr = self.systems[b].tracker
        tr.map = _tree_slice(self.maps, b)
        tr._kf_pose_cache.clear()

    # ------------------------------------------------------------------
    def track_rgbd_batch(self, grays: Sequence[np.ndarray],
                         depths: Sequence[np.ndarray],
                         timestamps: Sequence[float]) -> List[TrackStats]:
        """One RGB-D frame for each of the B lanes."""
        from ..frontend.fused import fused_track_step_batch, FusedOut
        assert len(grays) == self.n
        cfg = self.cfg
        batched: List[int] = []
        stats: List[Optional[TrackStats]] = [None] * self.n

        # lanes outside steady-state run their own scalar path (init,
        # lost->reloc, mono bootstrap); they write their map back into the
        # stacked batch before the next batched call
        for b, s in enumerate(self.systems):
            if s.tracker.state == "OK":
                batched.append(b)
            else:
                self._materialize_lane(b)
                self._map_dirty[b] = True       # scalar path mutates map
                stats[b] = s.track_rgbd(np.asarray(grays[b]),
                                        np.asarray(depths[b]),
                                        float(timestamps[b]))
                self._sync_lane_to_batch(b)
        if not batched:
            return stats

        # any lane whose map advanced on the host (KF / loop closure last
        # frame) flushes into the stacked maps first
        for b in batched:
            self._sync_lane_to_batch(b)

        t0 = self.systems[batched[0]].tracker
        dc = t0._scalar_consts()
        H, W = np.asarray(grays[batched[0]]).shape

        # the batch ALWAYS spans all n slots (jit shape and the stacked
        # map batch never change); lanes that fell back this frame have
        # their inputs repeated from a healthy lane and outputs ignored
        lanes = list(range(self.n))
        fill = [b if b in batched else batched[0] for b in lanes]
        src = [self.systems[f].tracker for f in fill]

        g = self._put(jnp.asarray(np.stack([grays[f] for f in fill])))
        d = self._put(jnp.asarray(np.stack([depths[f] for f in fill])))
        last_ids = jnp.stack([
            tr.last_frame.obs_lm if tr.last_frame.obs_lm is not None
            else dc["no_obs"] for tr in src])
        R_last = jnp.stack([jnp.asarray(tr.last_frame.R) for tr in src])
        t_last = jnp.stack([jnp.asarray(tr.last_frame.t) for tr in src])
        prev2 = [tr._prev2_pose for tr in src]
        R_p2 = jnp.stack([p[0] if p is not None else R_last[i]
                          for i, p in enumerate(prev2)])
        t_p2 = jnp.stack([p[1] if p is not None else t_last[i]
                          for i, p in enumerate(prev2)])
        has_vel = jnp.asarray(np.array(
            [0.0 if p is None else 1.0 for p in prev2], np.float32))
        B = cfg.dynamic.max_boxes
        bx = jnp.broadcast_to(dc["bx_empty"], (self.n, B, 4))
        ba = jnp.broadcast_to(dc["ba_empty"], (self.n, B))
        ds = cfg.tracking.depth_stride
        depth_scale = dc["depth_scale"] if np.asarray(
            depths[batched[0]]).dtype == np.uint16 else None

        ref_ks = tuple(max(tr.last_kf_id, 0) for tr in src)
        if self._ref_kf_batch is None or self._ref_kf_batch[0] != ref_ks:
            self._ref_kf_batch = (
                ref_ks, self._put(jnp.asarray(np.array(ref_ks, np.int32))))

        out = fused_track_step_batch(
            self.maps, t0.cam, t0.bounds, g, d, bx, ba, last_ids,
            R_last, t_last, R_p2, t_p2, has_vel, self._ref_kf_batch[1],
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

        # batched landmark-statistics update: one op for every lane
        self.maps = self.maps._replace(lm_visible=out.lm_visible,
                                       lm_found=out.lm_found)
        packed = np.asarray(out.packed)          # the ONE readback [B, 28]

        for b in batched:
            sys_b = self.systems[b]
            tr = sys_b.tracker
            tr._prev2_pose = (R_last[b], t_last[b])
            fd_b = _tree_slice(out.fd, b)
            frame = Frame(data=fd_b, frame_id=sys_b.frame_id,
                          timestamp=float(timestamps[b]),
                          ref_kf=ref_ks[b])
            out_b = FusedOut(fd=fd_b, obs_lm=out.obs_lm[b], R=out.R[b],
                             t=out.t[b], lm_visible=None, lm_found=None,
                             packed=packed[b])
            # materialize this lane's map only when the host logic will
            # actually touch it (keyframe or lost transition)
            n_mm, n_map = int(packed[b][0]), int(packed[b][1])
            lost = (n_mm < cfg.tracking.min_inliers_track
                    or n_map < cfg.tracking.min_inliers_localmap)
            tr.frames_since_kf += 1             # peek the KF decision
            need_kf = (not tr.localization_only) and not lost and \
                tr._need_keyframe_counts(n_map, int(packed[b][2]),
                                         int(packed[b][3]))
            tr.frames_since_kf -= 1
            if lost or need_kf:
                self._materialize_lane(b)
            pre_map = tr.map
            stats[b] = tr._post_track(frame, out_b)
            tr._bookkeep(frame)
            sys_b.frame_id += 1
            sys_b._gba_step()
            if tr.map is not pre_map:
                self._map_dirty[b] = True
                self._sync_lane_to_batch(b)
        return stats

    # ------------------------------------------------------------------
    def trajectories(self):
        return [s.trajectory for s in self.systems]
