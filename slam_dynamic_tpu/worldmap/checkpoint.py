"""Map checkpoint/resume.

The reference has NO persistence (SaveMap/LoadMap is an explicit TODO,
/root/reference/include/System.h:122-124 — SURVEY §5.4). Here the map is a
pytree of fixed arrays, so checkpointing is a single npz (and orbax works
out of the box for async multi-host checkpointing if configured).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .state import MapState

_SCALARS = ("n_kf", "n_lm")


def save_map(path: str, m: MapState):
    np.savez_compressed(path, **{
        f: np.asarray(getattr(m, f)) for f in MapState._fields})


def load_map(path: str) -> MapState:
    z = np.load(path)
    kw = {}
    for f in MapState._fields:
        a = z[f]
        kw[f] = jnp.asarray(a) if a.ndim else jnp.asarray(a[()])
    return MapState(**kw)
