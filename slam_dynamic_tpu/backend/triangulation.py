"""New-landmark creation by two-view triangulation between covisible
keyframes.

Equivalent of LocalMapping::CreateNewMapPoints (/root/reference/src/
LocalMapping.cc:208-454): for the new keyframe and each of its best
covisible neighbors, match unbound keypoints under the epipolar constraint
(SearchForTriangulation, ORBmatcher.cc:814), triangulate by DLT, and keep
points passing parallax / positive-depth / reprojection / scale-consistency
checks. All pairs are processed as dense masked matrices; triangulation is
one batched 4x4 nullspace solve (ops/nullspace.py — pure matmuls, no SVD).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import hamming as hm
from ..utils.camera import Intrinsics, backproject, project
from ..worldmap.state import MapState, add_landmarks


def fundamental_from_poses(cam: Intrinsics, R1, t1, R2, t2):
    """F12 such that x2^T F21... returns F with x1' in image1, x2 in image2:
    x1^T F x2 = 0 given world->cam poses (ref LocalMapping::ComputeF12)."""
    R12 = R1 @ R2.T
    t12 = t1 - R12 @ t2
    tx = jnp.array([[0, -t12[2], t12[1]], [t12[2], 0, -t12[0]],
                    [-t12[1], t12[0], 0]])
    Kinv = jnp.linalg.inv(cam.K)
    return Kinv.T @ tx @ R12 @ Kinv


def triangulate_dlt(cam: Intrinsics, R1, t1, R2, t2, uv1, uv2):
    """Batched two-view DLT triangulation -> world points [N, 3]."""
    P1 = cam.K @ jnp.concatenate([R1, t1[:, None]], axis=1)   # [3,4]
    P2 = cam.K @ jnp.concatenate([R2, t2[:, None]], axis=1)

    from ..ops.nullspace import null_vector
    A = jnp.stack([
        uv1[:, 0, None] * P1[2] - P1[0],
        uv1[:, 1, None] * P1[2] - P1[1],
        uv2[:, 0, None] * P2[2] - P2[0],
        uv2[:, 1, None] * P2[2] - P2[1],
    ], axis=1)                                 # [N, 4, 4]
    X = null_vector(A)                         # batched pure-matmul solve
    return X[:, :3] / jnp.where(jnp.abs(X[:, 3:]) < 1e-12, 1e-12, X[:, 3:])


class TriangulationOut(NamedTuple):
    points: jnp.ndarray     # [N, 3] world positions (slots of kf1 keypoints)
    idx2: jnp.ndarray       # [N] matched keypoint slot in kf2
    ok: jnp.ndarray         # [N] bool passed all checks


@functools.partial(jax.jit, static_argnames=("n_levels",))
def triangulate_between(cam: Intrinsics, scale_factor,
                        kp1_xy, kp1_desc, kp1_valid, kp1_level, kp1_angle,
                        kp1_unbound, R1, t1,
                        kp2_xy, kp2_desc, kp2_valid, kp2_level, kp2_angle,
                        kp2_unbound, R2, t2,
                        n_levels: int = 8,
                        epipolar_th: float = 3.84,
                        chi2_mono: float = 5.991,
                        kp1_depth=None, kp1_ur=None,
                        kp2_depth=None, kp2_ur=None,
                        chi2_stereo: float = 7.8) -> TriangulationOut:
    """Triangulate unbound keypoints of KF1 against unbound of KF2.

    When kp*_depth/kp*_ur are given (stereo/RGB-D keyframes), the
    reference's stereo arbitration applies (LocalMapping.cc:293-368):
    DLT-triangulate when the ray parallax beats both stereo parallaxes,
    otherwise unproject from whichever frame has the more confident
    stereo depth — this is how FAR points (beyond ThDepth) enter the map
    on KITTI-style sequences — and reprojection gates use the 3-dof
    stereo chi2 (7.8) including the u_right residual.
    """
    # epipolar pair gate (ref :884: dist to epipolar line < 3.84 sigma2)
    F12 = fundamental_from_poses(cam, R1, t1, R2, t2)
    ones = jnp.ones((kp1_xy.shape[0], 1))
    x1h = jnp.concatenate([kp1_xy, ones], axis=1)
    x2h = jnp.concatenate([kp2_xy, jnp.ones((kp2_xy.shape[0], 1))], axis=1)
    lines2 = x1h @ F12            # [N1, 3] epiline of kp1 in image 2
    num = (lines2 @ x2h.T) ** 2   # [N1, N2] via matmul (no 3D broadcast)
    den = jnp.maximum(lines2[:, 0] ** 2 + lines2[:, 1] ** 2, 1e-12)
    sigma2_2 = (scale_factor ** (2.0 * kp2_level.astype(jnp.float32)))
    epi_ok = num / den[:, None] < epipolar_th * sigma2_2[None, :]

    lvl_ok = hm.level_pair_mask(kp1_level, kp2_level, -1, 1)
    dist = hm.masked_hamming_matrix(
        kp1_desc, kp1_valid & kp1_unbound, kp2_desc,
        kp2_valid & kp2_unbound, pair_mask=epi_ok & lvl_ok)
    idx2, d, ok = hm.match_nn(dist, max_dist=50, ratio=0.9, mutual=True)
    ok = hm.rotation_consistency(kp1_angle, kp2_angle, idx2, ok)

    idx2c = jnp.clip(idx2, 0, kp2_xy.shape[0] - 1)
    uv2 = kp2_xy[idx2c]
    X = triangulate_dlt(cam, R1, t1, R2, t2, kp1_xy, uv2)

    # parallax of the viewing RAYS (through the matched pixels, not the
    # triangulated point — the point is meaningless at low parallax)
    O1 = -R1.T @ t1
    O2 = -R2.T @ t2
    ray1 = jnp.einsum("ji,nj->ni", R1,
                      backproject(cam, kp1_xy, jnp.ones(kp1_xy.shape[0])))
    ray2 = jnp.einsum("ji,nj->ni", R2,
                      backproject(cam, uv2, jnp.ones(uv2.shape[0])))
    cosp = jnp.sum(ray1 * ray2, -1) / jnp.maximum(
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1),
        1e-9)

    if kp1_depth is not None:
        # stereo arbitration (ref :293-341): cosParallaxStereo =
        # cos(2*atan2(b/2, depth)); DLT only when ray parallax beats it,
        # else unproject from the more confident stereo frame
        b = cam.baseline
        d2g = kp2_depth[idx2c]
        cs1 = jnp.where(kp1_depth > 0,
                        jnp.cos(2.0 * jnp.arctan2(b / 2.0, kp1_depth)), 2.0)
        cs2 = jnp.where(d2g > 0,
                        jnp.cos(2.0 * jnp.arctan2(b / 2.0, d2g)), 2.0)
        cos_stereo = jnp.minimum(cs1, cs2)
        good_dlt = (cosp > 0) & (cosp < 0.9998) & (cosp < cos_stereo)
        use_s1 = ~good_dlt & (kp1_depth > 0) & (cs1 <= cs2)
        use_s2 = ~good_dlt & ~use_s1 & (d2g > 0)
        xw1 = jnp.einsum("ji,nj->ni", R1,
                         backproject(cam, kp1_xy, kp1_depth) - t1[None, :])
        xw2 = jnp.einsum("ji,nj->ni", R2,
                         backproject(cam, uv2, d2g) - t2[None, :])
        X = jnp.where(good_dlt[:, None], X,
                      jnp.where(use_s1[:, None], xw1, xw2))
        ok &= good_dlt | use_s1 | use_s2
    else:
        ok &= (cosp > 0) & (cosp < 0.9998)

    # checks (ref :342-420)
    xc1 = X @ R1.T + t1
    xc2 = X @ R2.T + t2
    ok &= (xc1[:, 2] > 0.05) & (xc2[:, 2] > 0.05)
    r1 = X - O1
    r2 = X - O2
    # reprojection chi2: 2-dof mono form, or 3-dof stereo form including
    # the u_right residual where the keypoint has one (ref :344-368)
    e1 = jnp.sum((project(cam, xc1) - kp1_xy) ** 2, -1)
    e2 = jnp.sum((project(cam, xc2) - uv2) ** 2, -1)
    s21 = scale_factor ** (2.0 * kp1_level.astype(jnp.float32))
    s22 = scale_factor ** (2.0 * kp2_level.astype(jnp.float32))[idx2c]
    if kp1_depth is not None:
        z1 = jnp.maximum(xc1[:, 2], 1e-9)
        z2 = jnp.maximum(xc2[:, 2], 1e-9)
        ur1_pred = (project(cam, xc1)[:, 0] - cam.bf / z1)
        ur2_pred = (project(cam, xc2)[:, 0] - cam.bf / z2)
        ur2g = kp2_ur[idx2c]
        e1s = e1 + (ur1_pred - kp1_ur) ** 2
        e2s = e2 + (ur2_pred - ur2g) ** 2
        ok1 = jnp.where(kp1_ur >= 0, e1s < chi2_stereo * s21,
                        e1 < chi2_mono * s21)
        ok2 = jnp.where(ur2g >= 0, e2s < chi2_stereo * s22,
                        e2 < chi2_mono * s22)
        ok &= ok1 & ok2
    else:
        ok &= (e1 < chi2_mono * s21) & (e2 < chi2_mono * s22)
    # scale consistency (ref :406-418): distance ratio vs octave ratio
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    ratio_d = d1 / jnp.maximum(d2, 1e-9)
    lvl2 = kp2_level[jnp.clip(idx2, 0, kp2_xy.shape[0] - 1)]
    ratio_o = scale_factor ** (kp1_level - lvl2).astype(jnp.float32)
    rf = scale_factor * 1.5
    ok &= (ratio_d < ratio_o * rf) & (ratio_d > ratio_o / rf)
    return TriangulationOut(X, idx2, ok)


def create_new_landmarks(m: MapState, cam: Intrinsics, k: int,
                         scale_factor: float, n_neighbors: int = 5,
                         n_levels: int = 8) -> MapState:
    """Triangulate KF k against its best covisible neighbors and insert the
    new landmarks (host loop over <=n_neighbors pairs, device math)."""
    import numpy as np
    covis = np.array(m.covis[k])           # writable copy
    covis[int(k):] = 0                     # only earlier KFs
    order = np.argsort(-covis)[:n_neighbors]
    sf = jnp.float32(scale_factor)
    for k2 in order:
        if covis[k2] < 15:
            break
        k2 = int(k2)
        unbound1 = m.kf_obs_lm[k] < 0
        unbound2 = m.kf_obs_lm[k2] < 0
        out = triangulate_between(
            cam, sf,
            m.kf_kp_xy[k], m.kf_kp_desc[k], m.kf_kp_valid[k],
            m.kf_kp_level[k], m.kf_kp_angle[k], unbound1,
            m.kf_R[k], m.kf_t[k],
            m.kf_kp_xy[k2], m.kf_kp_desc[k2], m.kf_kp_valid[k2],
            m.kf_kp_level[k2], m.kf_kp_angle[k2], unbound2,
            m.kf_R[k2], m.kf_t[k2], n_levels=n_levels)
        m = _insert_triangulated(m, k, k2, out, sf, n_levels)
    return m


@functools.partial(jax.jit, static_argnames=("n_levels",))
def _insert_triangulated(m: MapState, k, k2, out: TriangulationOut,
                         scale_factor, n_levels: int) -> MapState:
    N = out.points.shape[0]
    Ow = -jnp.einsum("ji,j->i", m.kf_R[k], m.kf_t[k])
    po = out.points - Ow
    dist = jnp.linalg.norm(po, axis=-1)
    normal = po / jnp.maximum(dist, 1e-9)[:, None]
    lvl_scale = scale_factor ** m.kf_kp_level[k].astype(jnp.float32)
    dmax = dist * lvl_scale
    dmin = dmax / (scale_factor ** (n_levels - 1))
    slots = jnp.arange(N, dtype=jnp.int32)
    n_before = m.n_lm
    m = add_landmarks(m, out.points, m.kf_kp_desc[k], normal, dmin, dmax,
                      jnp.full_like(slots, k), slots, out.ok)
    # bind the second observation in kf2 (obs bookkeeping only; covis
    # refreshed on next insert)
    new_ids = m.kf_obs_lm[k]
    write = out.ok & (new_ids >= 0)    # only slots that actually allocated
    # masked writes dump to an out-of-range extra slot (sliced off) so a
    # genuine bind to any real slot can't be clobbered by a no-op write
    # (duplicate-index scatter order is unspecified in XLA)
    Nk = m.kf_obs_lm.shape[1]
    row_ext = jnp.concatenate([m.kf_obs_lm[k2],
                               jnp.full((1,), -1, jnp.int32)])
    row = row_ext.at[jnp.where(write, out.idx2, Nk)].set(new_ids)[:Nk]
    obs = m.kf_obs_lm.at[k2].set(row)
    return m._replace(kf_obs_lm=obs)


def triangulate_with_neighbors(m: MapState, cam: Intrinsics, k,
                               scale_factor, *, n_neighbors: int,
                               n_levels: int, stereo: bool) -> MapState:
    """CreateNewMapPoints for ALL sensors as pure device work, composable
    inside the fused keyframe stage (no host sync): triangulate keyframe k
    against its top-``n_neighbors`` earlier covisible keyframes (weight
    >= 15 gate applied as a mask, ref LocalMapping.cc:219-227 uses the
    10/20 best covisible neighbors).
    """
    K = m.kf_R.shape[0]
    row = jnp.where((jnp.arange(K) < k) & m.kf_valid, m.covis[k], 0)
    _, nbrs = jax.lax.top_k(row, n_neighbors)
    sf = jnp.asarray(scale_factor, jnp.float32)
    for i in range(n_neighbors):
        k2 = nbrs[i]
        w_ok = row[k2] >= 15
        unbound1 = m.kf_obs_lm[k] < 0
        unbound2 = m.kf_obs_lm[k2] < 0
        kw = dict(n_levels=n_levels)
        if stereo:
            kw.update(kp1_depth=m.kf_kp_depth[k], kp1_ur=m.kf_kp_ur[k],
                      kp2_depth=m.kf_kp_depth[k2], kp2_ur=m.kf_kp_ur[k2])
        out = triangulate_between(
            cam, sf,
            m.kf_kp_xy[k], m.kf_kp_desc[k], m.kf_kp_valid[k],
            m.kf_kp_level[k], m.kf_kp_angle[k], unbound1,
            m.kf_R[k], m.kf_t[k],
            m.kf_kp_xy[k2], m.kf_kp_desc[k2], m.kf_kp_valid[k2],
            m.kf_kp_level[k2], m.kf_kp_angle[k2], unbound2,
            m.kf_R[k2], m.kf_t[k2], **kw)
        out = out._replace(ok=out.ok & w_ok)
        m = _insert_triangulated(m, k, k2, out, sf, n_levels)
    return m
