"""Transport detection: is the device reached through the axon tunnel?

Several hot-path policies key off this (fused pallas matching, adaptive
pipeline depth): the tunnel pays a large per-dispatch penalty for
Mosaic-custom-call executables and wedges on >1 unsynced in-flight frame
(RESULTS.md), so those optimizations enable only on co-located backends.
"""
from __future__ import annotations

import jax


def tunneled() -> bool:
    """True when devices are reached through the axon tunnel transport.
    The axon plugin registers its devices with platform name "tpu", so
    backend/platform names cannot discriminate — the requested-platforms
    config can."""
    try:
        plats = jax.config.jax_platforms or ""
    except AttributeError:      # very old jax
        plats = ""
    return "axon" in plats
