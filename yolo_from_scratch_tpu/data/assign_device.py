"""On-device dense target assignment from compact padded labels.

The host path (data/dataset.py `assign_targets`) materializes three dense
(gs, gs, A, 5+nc) target maps per image on the CPU and ships them to the
chip — at nc=80 @640 that is ~8.7 MB per image, which both saturates the
host->device link and caps how many images the scanned trainer can
pre-stage in HBM (the BASELINE config-3 regime topped out at 512 images
when staged dense, ~9 GB of targets).

This module moves the assignment onto the TPU: the host ships only the
compact labels — a (K, 5) [class, cx, cy, w, h] array padded to a static
capacity K plus a valid count — ~1 KB per image — and the dense maps are
rebuilt inside the jitted step by pure vector ops:

- shape-only IoU of every GT against all 9 anchors is a (K, 9) min/mul
  matrix + argmax (the same vectorization the host path uses, reference:
  train.py:108-131, 169-180);
- grid cell = truncate(center * gs) clamped to [0, gs-1] (reference:
  train.py:184-189; truncation matches Python's int());
- the reference's sequential "first GT wins an occupied slot" rule
  (train.py:193) becomes a (K, K) earlier-box-same-slot clash matrix:
  box n wins iff no box m < n maps to the same (scale, cell, anchor)
  slot — O(K^2) elementwise work, trivial at K<=128;
- winners scatter their [cx, cy, w, h, 1, one-hot] rows into a flat
  (gs*gs*A + 1)-row buffer; losers and padding rows are redirected to the
  final dummy row, which is sliced off. Scatter indices of live rows are
  therefore unique, so the scatter is deterministic.

Bit-parity with the host `assign_targets` is pinned by
tests/test_assign_device.py on random, adversarial (duplicate-slot,
out-of-range) and real-dataset labels.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import vmap

from yolo_from_scratch_tpu.config import NUM_ANCHORS_PER_SCALE, STRIDES


def pack_labels(boxes_list, class_list, capacity: int):
    """Host helper: pad per-image labels to a static capacity.

    Args:
        boxes_list: list of (N_i, 4) float32 [cx, cy, w, h] (letterboxed,
            normalized) arrays.
        class_list: list of (N_i,) int arrays.
        capacity: static K; images with more than K boxes keep the first K
            (file order, matching the reference's first-wins semantics).

    Returns (labels (B, K, 5) f32 [class, cx, cy, w, h], counts (B,) i32).
    """
    b = len(boxes_list)
    labels = np.zeros((b, capacity, 5), np.float32)
    counts = np.zeros((b,), np.int32)
    for i, (boxes, cls) in enumerate(zip(boxes_list, class_list)):
        n = min(len(boxes), capacity)
        counts[i] = n
        if n:
            labels[i, :n, 0] = np.asarray(cls[:n], np.float32)
            labels[i, :n, 1:5] = boxes[:n]
    return labels, counts


@functools.partial(
    vmap, in_axes=(0, 0, None, None, None), out_axes=0
)
def assign_targets_device_batch(labels, counts, anchors, img_size,
                                num_classes):
    """Batched `assign_targets_device`: (B, K, 5) + (B,) -> dense maps with
    a leading batch axis."""
    return assign_targets_device(labels, counts, anchors, img_size,
                                 num_classes)


def assign_targets_device(labels, count, anchors, img_size: int,
                          num_classes: int):
    """Jittable dense multi-scale target assignment for one image.

    Args:
        labels: (K, 5) float32 [class, cx, cy, w, h], rows >= count are
            padding (ignored).
        count: () int32 number of valid rows.
        anchors: (3, A, 2) pixel anchors (static numpy or jnp array).
        img_size: static input resolution.
        num_classes: static nc.

    Returns [t_p3, t_p4, t_p5], t_i (gs_i, gs_i, A, 5+nc) float32 —
    bit-identical to the host `assign_targets` on the same labels.
    """
    valid = jnp.arange(labels.shape[0]) < count
    return assign_targets_device_masked(labels, valid, anchors, img_size,
                                        num_classes)


@functools.partial(
    vmap, in_axes=(0, 0, None, None, None), out_axes=0
)
def assign_targets_device_masked_batch(labels, valid, anchors, img_size,
                                       num_classes):
    """Batched masked assignment: (B, K, 5) + (B, K) bool -> dense maps
    with a leading batch axis."""
    return assign_targets_device_masked(labels, valid, anchors, img_size,
                                        num_classes)


def class_onehot(cls_ids, num_classes: int):
    """The class row the assignment writes: (K,) int32 -> (K, nc) float32.
    nc == 1 writes 1 regardless of the id (reference: train.py:201-205);
    out-of-range ids write all-zeros."""
    k = cls_ids.shape[0]
    if num_classes == 1:
        return jnp.ones((k, 1), jnp.float32)
    return jnp.zeros((k, num_classes), jnp.float32).at[
        jnp.arange(k), jnp.clip(cls_ids, 0, num_classes - 1)
    ].set(jnp.where((cls_ids >= 0) & (cls_ids < num_classes), 1.0, 0.0))


def transport_slots(labels, valid, anchors, img_size: int):
    """Per-GT (scale, cell, anchor) routing + first-wins resolution — the
    transport shared by the dense scatter path (below) and the sparse
    gather loss (ops/losses_sparse.py).

    Returns (best_anchor (K,) i32, winners, slots) where winners[s] is the
    (K,) bool mask of rows that own a slot at scale s and slots[s] the
    (K,) i32 flat index (gy*gs + gx)*A + anchor there (dummy = gs*gs*A for
    rows not routed to s, so scatters can redirect them off the grid).
    """
    na = NUM_ANCHORS_PER_SCALE
    grid_sizes = [img_size // s for s in STRIDES]
    boxes = labels[:, 1:5]

    # (K, 9) shape-only IoU, both boxes centered at origin (reference:
    # train.py:108-131) — same expression as the host _shape_iou_matrix.
    wh_px = boxes[:, 2:4] * img_size
    anc = jnp.asarray(anchors, jnp.float32).reshape(-1, 2)
    inter = jnp.minimum(wh_px[:, None, 0], anc[None, :, 0]) * jnp.minimum(
        wh_px[:, None, 1], anc[None, :, 1]
    )
    union = (
        wh_px[:, 0:1] * wh_px[:, 1:2]
        + anc[None, :, 0] * anc[None, :, 1]
        - inter
    )
    best_flat = jnp.argmax(inter / (union + 1e-16), axis=1)
    best_scale = best_flat // na
    best_anchor = best_flat % na

    order = jnp.arange(labels.shape[0])
    winners, slots = [], []
    for s, gs in enumerate(grid_sizes):
        dummy = gs * gs * na
        # truncation toward zero matches the host's int(); clamp both ends
        # (untrusted labels — see assign_targets)
        gx = jnp.clip((boxes[:, 0] * gs).astype(jnp.int32), 0, gs - 1)
        gy = jnp.clip((boxes[:, 1] * gs).astype(jnp.int32), 0, gs - 1)
        mine = valid & (best_scale == s)
        slot = jnp.where(mine, (gy * gs + gx) * na + best_anchor, dummy)
        # first-wins: an earlier box with the same live slot evicts mine.
        # Padding/other-scale rows sit on the dummy slot, and live slots
        # are always < dummy, so eq never cross-matches them.
        clash = (slot[None, :] == slot[:, None]) & (order[None, :] <
                                                    order[:, None])
        winners.append(mine & ~jnp.any(clash, axis=1))
        slots.append(slot)
    return best_anchor, winners, slots


def assign_targets_device_masked(labels, valid, anchors, img_size: int,
                                 num_classes: int):
    """Mask-based variant of `assign_targets_device`: validity is an
    explicit (K,) bool instead of a prefix count. Needed by the device
    mosaic (ops/mosaic_device.py), whose composed label set interleaves
    the four sources' padding rows; the first-wins rule still resolves in
    ROW ORDER among valid rows (for a prefix mask this is exactly the
    host's file order)."""
    na = NUM_ANCHORS_PER_SCALE
    grid_sizes = [img_size // s for s in STRIDES]
    out_dim = 5 + num_classes
    boxes = labels[:, 1:5]
    cls_ids = labels[:, 0].astype(jnp.int32)

    # the value row every winner writes: [cx, cy, w, h, 1, one-hot(cls)]
    onehot = class_onehot(cls_ids, num_classes)
    k = labels.shape[0]
    rows = jnp.concatenate(
        [boxes, jnp.ones((k, 1), jnp.float32), onehot], axis=1
    )

    _, winners, slots = transport_slots(labels, valid, anchors, img_size)
    targets = []
    for gs, winner, slot in zip(grid_sizes, winners, slots):
        dummy = gs * gs * na
        idx = jnp.where(winner, slot, dummy)
        flat = jnp.zeros((dummy + 1, out_dim), jnp.float32).at[idx].set(rows)
        targets.append(flat[:-1].reshape(gs, gs, na, out_dim))
    return targets
