"""Composite YOLO loss — dense, statically shaped, jit/grad friendly.

Reproduces the reference loss semantics exactly (reference: train.py:781-886)
while replacing its dynamic-shape boolean masking with dense masked means:

- bbox: CIoU over cells with objects (masked mean), weight 0.05
- objectness: BCE-with-logits over ALL cells (plain mean), per-scale weight
- class: BCE-with-logits over class channels of cells with objects (masked
  mean), weight 0.5
- per-scale objectness weights [P3, P4, P5] = [4.0, 1.0, 0.4]
  (reference: train.py:865)

`img_size` note: the reference decodes with the default 640 denominator in
its loss path regardless of the training resolution (reference: train.py:796;
SURVEY.md §3.6). We default to the CORRECT behavior (use the actual
img_size); pass `quirk_640=True` to reproduce the reference bit-for-bit at
non-640 resolutions.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from yolo_from_scratch_tpu.ops.ciou import ciou_loss
from yolo_from_scratch_tpu.ops.decode import decode_predictions

# YOLOv5 hyp.scratch-low loss weights (reference: train.py:834-836)
BOX_WEIGHT = 0.05
CLS_WEIGHT = 0.5
OBJ_SCALE_WEIGHTS = (4.0, 1.0, 0.4)  # P3, P4, P5 (reference: train.py:865)


def _bce_mean(logits, labels, mask=None):
    """Mean BCE-with-logits; optional dense mask replicating a masked mean."""
    bce = optax.sigmoid_binary_cross_entropy(logits, labels)
    if mask is None:
        return jnp.mean(bce)
    mask = jnp.broadcast_to(mask, bce.shape).astype(bce.dtype)
    return jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def yolo_loss(predictions, targets, anchors, num_classes=1, img_size=640):
    """Single-scale loss (reference: train.py:781-838).

    Args:
        predictions: (B, H, W, A, 5+nc) RAW head output (logits).
        targets: (B, H, W, A, 5+nc) dense targets; ch4 is objectness {0,1}.
        anchors: (A, 2) pixel anchors for this scale.
        num_classes: number of classes.
        img_size: denominator for box w/h decode.

    Returns:
        (total, bbox_loss, obj_loss, class_loss) — total uses the
        single-scale weights 0.05/1.0/0.5 (reference: train.py:836).
    """
    decoded = decode_predictions(predictions, anchors, img_size)

    pred_boxes = decoded[..., 0:4]
    pred_obj = predictions[..., 4]
    pred_cls = predictions[..., 5:]

    target_boxes = targets[..., 0:4]
    target_obj = targets[..., 4]
    target_cls = targets[..., 5:]

    obj_mask = target_obj > 0.5

    bbox = ciou_loss(pred_boxes, target_boxes, mask=obj_mask)
    obj = _bce_mean(pred_obj, target_obj)
    cls = (
        _bce_mean(pred_cls, target_cls, mask=obj_mask[..., None])
        if num_classes > 0
        else jnp.asarray(0.0, predictions.dtype)
    )

    total = BOX_WEIGHT * bbox + 1.0 * obj + CLS_WEIGHT * cls
    return total, bbox, obj, cls


def yolo_loss_multiscale(
    predictions, targets, anchors_list, num_classes=1, img_size=640, quirk_640=False
):
    """Multi-scale FPN loss with per-scale objectness balancing
    (reference: train.py:840-886).

    Args:
        predictions / targets: lists of [P3, P4, P5] tensors.
        anchors_list: (3, A, 2) pixel anchors, or list of three (A, 2).
        img_size: actual training resolution. Ignored (replaced by 640)
            when `quirk_640` is set, matching the reference's behavior of
            decoding its loss path with the default 640 denominator.

    Returns:
        (total, bbox, obj, cls): `total` is the weighted training loss
        summed over scales; the components are UNWEIGHTED sums for
        logging (reference: train.py:881-884).
    """
    decode_size = 640 if quirk_640 else img_size
    total = bbox_t = obj_t = cls_t = 0.0
    for pred, tgt, anchors, obj_w in zip(
        predictions, targets, anchors_list, OBJ_SCALE_WEIGHTS
    ):
        _, bbox, obj, cls = yolo_loss(pred, tgt, anchors, num_classes, decode_size)
        total = total + BOX_WEIGHT * bbox + obj_w * obj + CLS_WEIGHT * cls
        bbox_t = bbox_t + bbox
        obj_t = obj_t + obj
        cls_t = cls_t + cls
    return total, bbox_t, obj_t, cls_t
