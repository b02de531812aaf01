"""Runtime value checking (NaN / out-of-bounds) for jitted SLAM stages.

The reference relies on hand-rolled mutexes and has no sanitizer story
(SURVEY §5.2; build flags at /root/reference/CMakeLists.txt:10-11). In the
functional JAX design data races are impossible by construction, so the
debugging surface that remains is *numerical*: NaNs escaping a degenerate
solve, or a bad index from a corrupted match. `jax.experimental.checkify`
instruments a jitted function with those checks without giving up jit.

Usage:
    from slam_dynamic_tpu.utils import debug
    checked = debug.checked(my_jitted_fn)   # same signature
    out = checked(*args)                    # raises on NaN / bad index

Intended for tests and offline triage, not the hot path: the
instrumented graph carries error state through every op, which costs
throughput — wrap the stage you are debugging explicitly.
"""
from __future__ import annotations

import functools

import jax
from jax.experimental import checkify


#: checks applied by :func:`checked` — float (NaN/inf in any op output),
#: index (gather/scatter OOB), div (x/0).
DEFAULT_CHECKS = checkify.float_checks | checkify.index_checks


def checked(fn, checks=None):
    """Wrap a jittable function so it RAISES on NaN/inf or bad indices.

    Returns a function with the same signature; on the first offending
    op the call raises ``checkify.JaxRuntimeError`` naming the op and
    source line instead of silently propagating NaNs into the map.
    """
    cfn = checkify.checkify(fn, errors=checks or DEFAULT_CHECKS)

    @functools.wraps(fn)
    def run(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return run


def check_finite_tree(tree, name: str = "tree"):
    """Host-side assert that every float leaf of a pytree is finite.

    Cheap triage helper for map state between stages:
    ``debug.check_finite_tree(tracker.map, "map after BA")``.
    """
    import numpy as np
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite leaves in {name}: {bad}")
    return True
