"""Honest device timing helpers.

On some backends (notably the axon remote-TPU tunnel used in CI),
`jax.block_until_ready` can return before the computation actually
retires, producing physically impossible timings (we measured a "3 ms"
batch-32 train step that would imply >300 TFLOP/s on a 197-TFLOP chip).
Reading a VALUE back to the host is the only reliable barrier: it cannot
complete until the full dependency chain has executed.

Use `hard_sync(x)` instead of `block_until_ready` in any timed region.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def hard_sync(tree):
    """Force completion of everything `tree` depends on by pulling one
    scalar to the host. Returns the scalar (ignorable)."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return 0.0
    x = leaves[0]
    return float(jnp.ravel(x)[0])


def timed(fn, *args, iters=10, warmup=1, **kw):
    """Median seconds per call of fn(*args) with hard syncs."""
    import statistics

    for _ in range(warmup):
        hard_sync(fn(*args, **kw))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        hard_sync(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)
