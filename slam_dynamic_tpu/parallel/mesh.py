"""Device mesh construction for distributed SLAM.

The communication backend of the framework (SURVEY §5.8): the reference is
single-process pthreads + mutexes; here, multi-chip/multi-host scaling uses
`jax.sharding.Mesh` + shard_map with XLA collectives over ICI/DCN.

Axes:
  "lm"   — landmark axis of bundle adjustment (the big axis; the SLAM
           analog of sequence/context parallelism, SURVEY §5.7);
  "dp"   — frame batch axis for the data-parallel frontend (per-host
           streaming sequence shards).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "lm") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_2d(n_lm: int, n_dp: int) -> Mesh:
    devs = np.asarray(jax.devices()[:n_lm * n_dp]).reshape(n_lm, n_dp)
    return Mesh(devs, ("lm", "dp"))


def shard_leading(mesh: Mesh, x, axis_name: str = "lm"):
    """Place array sharded along its leading dim over `axis_name`."""
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicated(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
