"""slam_dynamic_tpu: TPU-native dynamic-scene visual SLAM (JAX/XLA/Pallas)."""
__version__ = "0.1.0"

import os as _os

# Geometry demands true float32 matmuls. On TPU, JAX's DEFAULT matmul
# precision runs float32 contractions as bfloat16 passes on the MXU —
# fine for neural nets, but the pose optimizer's normal equations, the
# projection/radius gating and the BA Schur solves all lose enough bits
# to roughly double trajectory ATE (measured: 13.7 mm on-device vs 4.7 mm
# on CPU for the identical 60-frame benchmark world). The descriptor
# Hamming path is int8 and unaffected; the f32 matmuls this touches are
# small next to it, and the pipeline is transport-bound, so the extra MXU
# passes are free in practice. Opt out (e.g. to A/B the cost) with
# SLAM_TPU_FAST_MATMUL=1.
if not _os.environ.get("SLAM_TPU_FAST_MATMUL"):
    import jax as _jax
    _jax.config.update(
        "jax_default_matmul_precision",
        _os.environ.get("SLAM_TPU_MATMUL_PRECISION", "highest"))
