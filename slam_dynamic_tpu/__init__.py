"""slam_dynamic_tpu: TPU-native dynamic-scene visual SLAM (JAX/XLA/Pallas)."""
__version__ = "0.1.0"
