"""End-to-end loop closure + relocalization on synthetic sequences."""
import dataclasses

import numpy as np
import pytest

from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
from slam_dynamic_tpu.io.evo import ate_rmse
from tests.test_e2e_slam import make_system


def orbit_cfg(n=100):
    return SynthConfig(n_frames=n, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5, trajectory="orbit")


def dense_kf(sys_, loop_on=True):
    tr = dataclasses.replace(sys_.cfg.tracking, max_frames_between_kf=5)
    lp = dataclasses.replace(sys_.cfg.loop, enabled=loop_on)
    sys_.cfg = sys_.cfg.replace(tracking=tr, loop=lp)
    sys_.tracker.cfg = sys_.cfg
    return sys_


@pytest.mark.slow
def test_loop_closure_reduces_drift():
    scfg = orbit_cfg()
    seq = generate(scfg)
    results = {}
    for loop_on in (False, True):
        sys_ = dense_kf(make_system(scfg), loop_on)
        loops = 0
        for i in range(seq.gray.shape[0]):
            sys_.track_rgbd(seq.gray[i], seq.depth[i],
                            float(seq.timestamps[i]))
            ll = getattr(sys_, "last_loop", None)
            if ll and ll.closed:
                loops += 1
                sys_.last_loop = None
        est = np.stack([-R.T @ t for _, R, t in sys_.trajectory])
        est_w = (seq.R_wc[0] @ est.T).T + seq.t_wc[0]
        gt = seq.t_wc[:len(est)]
        results[loop_on] = (ate_rmse(est_w, gt, align=False), loops)
    ate_off, loops_off = results[False]
    ate_on, loops_on = results[True]
    assert loops_off == 0 and loops_on >= 1
    assert ate_on < 0.75 * ate_off, (ate_on, ate_off)
    assert ate_on < 0.15


@pytest.mark.slow
def test_relocalization_after_kidnap():
    scfg = SynthConfig(n_frames=24, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5)
    seq = generate(scfg)
    sys_ = dense_kf(make_system(scfg))
    for i in range(20):
        st = sys_.track_rgbd(seq.gray[i], seq.depth[i],
                             float(seq.timestamps[i]))
    assert st.state == "OK"
    # kidnap: flat frames kill tracking
    flat = np.full_like(seq.gray[0], 120.0)
    zdep = np.zeros_like(seq.depth[0])
    for j in range(2):
        st = sys_.track_rgbd(flat, zdep, 1.0 + j * 0.03)
    assert st.state == "LOST"
    # show an earlier view again -> relocalize near that pose
    st = sys_.track_rgbd(seq.gray[5], seq.depth[5], 2.0)
    assert st.state == "OK", st
    ts, R, t = sys_.trajectory[-1]
    center = -np.asarray(R).T @ np.asarray(t)
    gt_center = seq.t_wc[5]
    assert np.linalg.norm(center - gt_center) < 0.05
