"""One-time extraction of the canonical ORB rBRIEF sampling pattern.

The 256-pair learned sampling pattern (`bit_pattern_31_`) is public data
originating in OpenCV's ORB implementation (also embedded in the reference at
/root/reference/src/ORBextractor.cc:150). We store it as a .npy data asset —
it is a learned constant, not code — so descriptors are standard ORB and
directly comparable with any ORB pipeline.

Usage: python tools/extract_orb_pattern.py
Writes slam_dynamic_tpu/ops/orb_pattern.npy with shape (256, 4) int8
(x1, y1, x2, y2 per comparison, coordinates in [-13, 13]).
"""
import re
import numpy as np

SRC = "/root/reference/src/ORBextractor.cc"
OUT = "slam_dynamic_tpu/ops/orb_pattern.npy"


def main():
    with open(SRC) as f:
        text = f.read()
    start = text.index("bit_pattern_31_")
    start = text.index("{", start)
    end = text.index("};", start)
    body = text[start + 1:end]
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    vals = [int(v) for v in re.findall(r"-?\d+", body)]
    assert len(vals) == 256 * 4, len(vals)
    arr = np.array(vals, dtype=np.int8).reshape(256, 4)
    assert arr.min() >= -13 and arr.max() <= 13
    np.save(OUT, arr)
    print(f"wrote {OUT}: {arr.shape} {arr.dtype}")


if __name__ == "__main__":
    main()
