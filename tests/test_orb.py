"""FAST / ORB kernels vs small numpy oracles."""
import numpy as np
import jax.numpy as jnp

from slam_dynamic_tpu.config import ORBConfig
from slam_dynamic_tpu.ops import fast, orb
from slam_dynamic_tpu.frontend.extractor import extract_np, level_budgets


def brute_contiguous9(mask_bits):
    bits = [(mask_bits >> i) & 1 for i in range(16)]
    doubled = bits + bits
    run = 0
    for b in doubled:
        run = run + 1 if b else 0
        if run >= 9:
            return True
    return False


def test_contiguous9_matches_bruteforce(rng):
    masks = rng.integers(0, 2**16, size=(4096,)).astype(np.uint32)
    got = np.asarray(fast._contiguous9(jnp.asarray(masks)))
    want = np.array([brute_contiguous9(int(m)) for m in masks])
    np.testing.assert_array_equal(got, want)


def numpy_fast_segment(img, t):
    """Brute-force FAST-9-16 segment test (interior pixels only)."""
    h, w = img.shape
    out = np.zeros((h, w), bool)
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            p = img[y, x]
            ring = np.array([img[y + dy, x + dx]
                             for dx, dy in fast.RING_OFFSETS])
            mb = sum(1 << i for i in range(16) if ring[i] > p + t)
            md = sum(1 << i for i in range(16) if ring[i] < p - t)
            out[y, x] = brute_contiguous9(mb) or brute_contiguous9(md)
    return out


def test_fast_matches_numpy_oracle(rng):
    img = rng.uniform(0, 255, size=(32, 32)).astype(np.float32)
    corner, _ = fast.fast_response(jnp.asarray(img), 20.0)
    got = np.asarray(corner)
    want = numpy_fast_segment(img, 20.0)
    interior = np.zeros_like(want)
    interior[3:-3, 3:-3] = True
    np.testing.assert_array_equal(got & interior, want & interior)


def test_fast_flat_image_no_corners():
    img = jnp.full((64, 64), 100.0)
    score = fast.detect(img, 20, 7, border=3)
    assert float(score.max()) == 0.0


def test_fast_detects_blob_corner():
    img = np.full((64, 64), 50.0, np.float32)
    img[28:36, 28:36] = 200.0  # bright square: corners are FAST corners
    score = fast.detect(jnp.asarray(img), 20, 7, border=3)
    ys, xs = np.nonzero(np.asarray(score) > 0)
    assert len(ys) >= 4
    assert ys.min() >= 25 and ys.max() <= 38


def test_select_topk_cells_uniformity(rng):
    score = np.zeros((64, 64), np.float32)
    # 20 corners clustered in one cell, 3 spread out
    for i in range(20):
        score[8 + (i % 5), 8 + (i // 5)] = 100 + i
    score[40, 40] = 5.0
    score[10, 50] = 4.0
    score[50, 10] = 3.0
    xy, resp, valid = orb.select_topk_cells(jnp.asarray(score), 8, cell=32,
                                            per_cell=4)
    xy, valid = np.asarray(xy), np.asarray(valid)
    assert valid.sum() == 7  # 4 from the cluster cell + 3 spread
    # all three isolated corners survive despite low response
    got = {tuple(p) for p in xy[valid]}
    assert {(40, 40), (50, 10), (10, 50)} <= got


def test_ic_angle_gradient_directions():
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    xy = jnp.asarray([[32, 32]], jnp.int32)
    ang_x = float(orb.ic_angles(jnp.asarray(x), xy)[0])       # grad +x
    ang_y = float(orb.ic_angles(jnp.asarray(y), xy)[0])       # grad +y
    assert abs(ang_x) < 1e-3
    assert abs(ang_y - np.pi / 2) < 1e-3


def test_brief_rotation_invariance(rng):
    """Descriptor of a rotated patch (with angle fed in) stays close."""
    from scipy.ndimage import rotate as ndrotate
    img = rng.uniform(0, 255, size=(96, 96)).astype(np.float32)
    from slam_dynamic_tpu.ops.pyramid import gaussian_blur
    img_s = np.asarray(gaussian_blur(jnp.asarray(img), 7, 2.0))
    deg = 30.0
    rot = ndrotate(img_s, -deg, reshape=False, order=1, mode="nearest")
    xy = jnp.asarray([[48, 48]], jnp.int32)
    d0 = np.asarray(orb.brief_descriptors(jnp.asarray(img_s), xy,
                                          jnp.asarray([0.0])))
    d1 = np.asarray(orb.brief_descriptors(jnp.asarray(rot), xy,
                                          jnp.asarray([np.deg2rad(deg)])))
    ham = bin(int(d0[0, 0] ^ d1[0, 0])).count("1")
    ham = sum(bin(int(a ^ b)).count("1") for a, b in zip(d0[0], d1[0]))
    assert ham < 60  # random pairs average 128


def test_level_budgets_sum():
    cfg = ORBConfig(n_features=1000)
    b = level_budgets(cfg)
    assert sum(b) == 1000 and len(b) == cfg.n_levels
    assert b[0] > b[-1]


def test_extract_end_to_end(rng):
    img = (rng.uniform(0, 1, size=(240, 320)) > 0.5).astype(np.float32) * 200
    from scipy.ndimage import zoom, gaussian_filter
    img = gaussian_filter(img, 1.0).astype(np.float32)
    cfg = ORBConfig(n_features=500)
    kp = extract_np(img, cfg)
    n = int(np.asarray(kp.valid).sum())
    assert n > 200
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
    # descriptors should be diverse
    d = np.asarray(kp.desc)[np.asarray(kp.valid)]
    assert len(np.unique(d[:, 0])) > n // 4
