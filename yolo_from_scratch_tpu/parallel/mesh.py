"""Device mesh + sharding layer — the framework's communication backend.

The reference is strictly single-process / single-device (reference:
train.py:1377; no torch.distributed anywhere — SURVEY.md §2.3). Scaling
here is TPU-native instead: a `jax.sharding.Mesh` over the slice's chips,
batches sharded on the `data` axis, parameters replicated, and the
gradient all-reduce emitted by XLA's SPMD partitioner over ICI — no
explicit collective calls needed in the step function.

Two first-class strategies:

- **Data parallelism** (1-D mesh, the default): batch dim sharded on
  `data`; XLA inserts the gradient psum.
- **Spatial partitioning** (2-D `data x space` mesh): the image HEIGHT
  dimension is additionally sharded on `space` — the CNN analogue of
  sequence parallelism. Each 3x3 conv needs one row of halo from the
  neighbouring shard; GSPMD emits the collective-permute halo exchanges
  and converts BatchNorm's (B,H,W) statistics reductions into cross-chip
  psums automatically. Use when per-chip activations exceed HBM before
  the batch runs out — e.g. 1280² small-object training (SURVEY.md §5.7),
  where P3 activations alone are 160·1280·1280/64 elements per image.

A third strategy — tensor parallelism over a `model` axis (channel-
sharded conv kernels / BN params / Adam moments, for l/x variants where
per-chip HBM presses) — lives in `parallel/tensor.py`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(n_space: int, devices=None) -> Mesh:
    """2-D (data, space) mesh: DP over groups of `n_space` chips, with the
    image height dimension split `n_space` ways inside each group.

    On real hardware the `space` axis should map to ICI-adjacent chips
    (the halo exchange is a nearest-neighbour permute); jax.devices()
    order already enumerates the slice in torus order.
    """
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % n_space:
        raise ValueError(
            f"{len(devices)} devices do not divide into space={n_space}")
    arr = np.asarray(devices).reshape(len(devices) // n_space, n_space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for NHWC image batches: batch on `data`, and on a 2-D mesh
    the H dimension on `space` (spatial partitioning)."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def target_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, gs, gs, A, 5+nc) dense targets: rows follow the
    image rows so the loss stays local to each spatial shard."""
    return image_sharding(mesh)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding_for(mesh: Mesh, arr) -> NamedSharding:
    """Rank-aware sharding for a batch-leading array: dense spatial maps
    (ndim >= 4 — images (B,H,W,C), targets (B,gs,gs,A,D)) follow
    `target_sharding` (rows on `space` for a 2-D mesh); low-rank arrays
    (compact labels (B,K,5), counts (B,)) shard the batch dim only — a
    `space` entry there would split a non-spatial axis."""
    if getattr(arr, "ndim", len(getattr(arr, "shape", ()))) >= 4:
        return target_sharding(mesh)
    return NamedSharding(mesh, P(DATA_AXIS))


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
    """Place a host batch onto the mesh: batch dim on `data`, and on a 2-D
    mesh the H / grid-row dims on `space`."""
    images = jax.device_put(images, image_sharding(mesh))
    targets = [jax.device_put(t, target_sharding(mesh)) for t in targets]
    return images, targets
