"""Native C++ prefetching PNG loader vs PIL ground truth."""
import os

import numpy as np
import pytest

from slam_dynamic_tpu.io.native_loader import (PrefetchingLoader,
                                               native_available)
from slam_dynamic_tpu.viz.headless import write_png


@pytest.fixture
def png_dir(tmp_path, rng):
    paths = []
    for i in range(6):
        img = rng.uniform(0, 255, (48, 64)).astype(np.uint8)
        p = tmp_path / f"img_{i:03d}.png"
        write_png(str(p), img)
        paths.append(str(p))
    return paths


def test_native_loader_matches_pil(png_dir):
    if not native_available():
        pytest.skip("native lib not built")
    from PIL import Image
    got = list(PrefetchingLoader(png_dir, n_threads=3, capacity=2))
    assert len(got) == 6
    for p, arr in zip(png_dir, got):
        assert arr.dtype == np.uint8  # camera-native dtype end to end
        ref = np.asarray(Image.open(p).convert("L"), np.float32)
        np.testing.assert_allclose(arr, ref, atol=0)


def test_loader_oversized_frame_raises(png_dir):
    if not native_available():
        pytest.skip("native lib not built")
    with pytest.raises(IOError, match="larger"):
        list(PrefetchingLoader(png_dir, max_hw=(8, 8)))


def test_loader_decode_failure_raises(png_dir, tmp_path):
    if not native_available():
        pytest.skip("native lib not built")
    bad = tmp_path / "corrupt.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\nnot a real png")
    # failure mid-stream must raise (NOT silently truncate the dataset)
    with pytest.raises(IOError, match="decode"):
        list(PrefetchingLoader([png_dir[0], str(bad), png_dir[1]]))


def test_native_loader_16bit(tmp_path):
    if not native_available():
        pytest.skip("native lib not built")
    # write a 16-bit PNG via PIL
    from PIL import Image
    depth = (np.random.default_rng(0).uniform(0, 65535, (32, 40))
             ).astype(np.uint16)
    p = tmp_path / "d.png"
    Image.fromarray(depth, mode="I;16").save(str(p))
    got = list(PrefetchingLoader([str(p)]))
    assert got[0].dtype == np.uint16
    np.testing.assert_array_equal(got[0], depth)


def test_loader_order_under_parallelism(png_dir):
    if not native_available():
        pytest.skip("native lib not built")
    # many threads, tiny ring: frames must still arrive in order
    got = list(PrefetchingLoader(png_dir * 3, n_threads=4, capacity=2))
    assert len(got) == 18
    from PIL import Image
    ref0 = np.asarray(Image.open(png_dir[0]).convert("L"), np.float32)
    np.testing.assert_allclose(got[0], ref0)
    np.testing.assert_allclose(got[6], ref0)
