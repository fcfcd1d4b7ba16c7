"""Sparse (gather-based) YOLO loss — the dense loss without the dense
transport.

`ops/losses.yolo_loss_multiscale` consumes dense (B, gs, gs, A, 5+nc)
target maps: at nc=80 @640 the compact trainer spends a measurable slice
of every step materializing ~8.7 MB/image of targets on-device
(data/assign_device.py) and sweeping preds+targets+BCE tensors of the
same size through HBM, even though only K<=64 cells per image carry an
object. This module computes the SAME loss directly from the compact
(K, 5) labels:

- routing: `data/assign_device.transport_slots` — the identical
  (scale, cell, anchor) + first-wins resolution the dense scatter uses;
- bbox/cls terms: gather the <=K winner cells' raw predictions
  (`take_along_axis` on the flattened scale), decode those rows with the
  exact per-cell formulas of `ops/decode.decode_predictions`, and take
  the same masked means (denominators: winner count, winner count * nc);
- objectness term: the only dense part of the reference loss is a mean
  of BCE over every cell with a {0,1} label. Since
  BCE(l, 1) = BCE(l, 0) - l identically (optax's formulation), the full
  mean rewrites as  mean(BCE(l, 0)) - sum_winners(l) / N  — one fused
  elementwise reduction over the objectness channel plus a gathered
  correction, no scattered target grid at all.

The result equals the dense path to float-summation-order (~1e-6 rel;
pinned by tests/test_sparse_loss.py across nc, quirk, collisions), and
the gradients agree analytically: d/dl [mean BCE(l,0) - sum_w l / N] =
(sigmoid(l) - [winner]) / N, the dense BCE gradient.

Reference semantics being reproduced: loss train.py:781-886, assignment
train.py:108-207.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from yolo_from_scratch_tpu.config import NUM_ANCHORS_PER_SCALE
from yolo_from_scratch_tpu.data.assign_device import (
    class_onehot,
    transport_slots,
)
from yolo_from_scratch_tpu.ops.ciou import ciou
from yolo_from_scratch_tpu.ops.losses import (
    BOX_WEIGHT,
    CLS_WEIGHT,
    OBJ_SCALE_WEIGHTS,
)


def _scale_loss(pred, gt_boxes, onehot, win, slot, anchors, num_classes,
                decode_size):
    """One scale's (bbox, obj, cls) from gathered winner rows.

    pred: (B, gs, gs, A, 5+nc) raw logits; gt_boxes (B, K, 4) normalized
    [cx, cy, w, h]; onehot (B, K, nc); win (B, K) bool; slot (B, K) i32
    flat (gy*gs+gx)*A + anchor (dummy where ~win).
    """
    b, gs, _, na, _ = pred.shape
    n_cells = float(b * gs * gs * na)
    flat = pred.reshape(b, gs * gs * na, pred.shape[-1])

    idx = jnp.where(win, slot, 0)
    g = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, K, 5+nc)

    # decode the gathered rows exactly as ops/decode.decode_predictions
    # decodes those cells (same expressions, same dtype)
    anchor_i = idx % na
    cell = idx // na
    gx = (cell % gs).astype(pred.dtype)
    gy = (cell // gs).astype(pred.dtype)
    sxy = jax.nn.sigmoid(g[..., 0:2])
    bx = ((sxy[..., 0] * 2.0 - 0.5) + gx) / gs
    by = ((sxy[..., 1] * 2.0 - 0.5) + gy) / gs
    anc = jnp.asarray(anchors, pred.dtype).reshape(-1, 2)
    swh = jax.nn.sigmoid(g[..., 2:4])
    bw = (jnp.take(anc[:, 0], anchor_i) / decode_size) * jnp.square(
        2.0 * swh[..., 0])
    bh = (jnp.take(anc[:, 1], anchor_i) / decode_size) * jnp.square(
        2.0 * swh[..., 1])
    pred_boxes = jnp.stack([bx, by, bw, bh], axis=-1)

    winf = win.astype(pred.dtype)
    count = jnp.sum(winf)

    # bbox: masked mean of (1 - CIoU) == dense ciou_loss(mask=obj_mask)
    bbox = jnp.sum((1.0 - ciou(pred_boxes, gt_boxes)) * winf) / jnp.maximum(
        count, 1.0)

    # objectness: mean BCE over every cell against the {0,1} winner grid,
    # via BCE(l, 1) = BCE(l, 0) - l (no scattered target grid)
    l = pred[..., 4]
    obj_all = jnp.mean(optax.sigmoid_binary_cross_entropy(
        l, jnp.zeros_like(l)))
    obj = obj_all - jnp.sum(g[..., 4] * winf) / n_cells

    # class: masked mean over the nc channels of winner cells
    if num_classes > 0:
        bce = optax.sigmoid_binary_cross_entropy(g[..., 5:], onehot)
        cls = jnp.sum(bce * winf[..., None]) / jnp.maximum(
            count * num_classes, 1.0)
    else:
        cls = jnp.asarray(0.0, pred.dtype)
    return bbox, obj, cls


def yolo_loss_multiscale_sparse(predictions, labels, valid, anchors_list,
                                num_classes=1, img_size=640,
                                quirk_640=False):
    """Multi-scale FPN loss from compact labels (no dense targets).

    Args:
        predictions: [P3, P4, P5] raw (B, gs, gs, A, 5+nc) head outputs.
        labels: (B, K, 5) float32 [class, cx, cy, w, h] padded rows.
        valid: (B, K) bool row validity.
        anchors_list: (3, A, 2) pixel anchors.
        quirk_640: decode the loss path at 640 regardless of img_size
            (reference train.py:796 behavior; SURVEY.md §3.6).

    Returns (total, bbox, obj, cls) with identical semantics to
    `ops/losses.yolo_loss_multiscale` on the dense maps
    `assign_targets_device_masked_batch` would build from the same labels.
    """
    decode_size = 640 if quirk_640 else img_size
    transport = jax.vmap(
        functools.partial(transport_slots, img_size=img_size),
        in_axes=(0, 0, None))
    _, winners, slots = transport(labels, valid, jnp.asarray(anchors_list))

    cls_ids = labels[..., 0].astype(jnp.int32)
    onehot = jax.vmap(
        functools.partial(class_onehot, num_classes=num_classes))(cls_ids)
    gt_boxes = labels[..., 1:5]

    total = bbox_t = obj_t = cls_t = 0.0
    for pred, win, slot, anchors, obj_w in zip(
            predictions, winners, slots, anchors_list, OBJ_SCALE_WEIGHTS):
        bbox, obj, cls = _scale_loss(
            pred, gt_boxes, onehot, win, slot, anchors, num_classes,
            decode_size)
        total = total + BOX_WEIGHT * bbox + obj_w * obj + CLS_WEIGHT * cls
        bbox_t = bbox_t + bbox
        obj_t = obj_t + obj
        cls_t = cls_t + cls
    return total, bbox_t, obj_t, cls_t
