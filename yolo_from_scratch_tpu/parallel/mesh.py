"""Device mesh + sharding layer — the framework's communication backend.

The reference is strictly single-process / single-device (reference:
train.py:1377; no torch.distributed anywhere — SURVEY.md §2.3). Scaling
here is TPU-native instead: a 1-D `jax.sharding.Mesh` over the slice's
chips, batches sharded on the `data` axis, parameters replicated, and the
gradient all-reduce emitted by XLA's SPMD partitioner over ICI — no
explicit collective calls needed in the step function.

The mesh abstraction keeps an extensible axis layout so a `model` axis
(tensor parallelism) could be added later, though at <100M params DP is
the only strategy that pays for itself (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_multiple(arr: np.ndarray, multiple: int):
    """Pad the batch dim to a multiple of the mesh size so the batch
    divides evenly across chips, by REPEATING real rows (wrap-around).
    Returns (padded, valid_count).

    Repeating instead of zero-filling keeps padded rows statistically
    real: gradients/BatchNorm stats on the final partial batch see
    duplicated images rather than fabricated black ones (a zero image has
    no objects but real background statistics do not look like zeros).
    Loss means over a padded batch weight the duplicated rows twice —
    only the final partial batch of an epoch is affected; eval counts are
    exact because callers mask with `valid_count`."""
    b = arr.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return arr, b
    reps = np.concatenate([arr] * ((rem + b - 1) // b + 1), axis=0)[: b + rem]
    return reps, b


def shard_batch(mesh: Mesh, images, targets):
    """Place a host batch onto the mesh, sharded along the batch dim."""
    sh = batch_sharding(mesh)
    images = jax.device_put(images, sh)
    targets = [jax.device_put(t, sh) for t in targets]
    return images, targets
