"""Grid-aligned detection metrics, fully vectorized.

Replicates the reference's eval counting rules (reference:
train.py:1002-1024) — a quadruple Python loop over (batch, i, j, anchor)
there, a single dense tensor comparison here:

    pred_obj = sigmoid(raw obj); both thresholds default 0.5
    pred>thr & tgt>thr & IoU>thr  -> TP
    pred>thr & tgt>thr & IoU<=thr -> FP   (no FN for the missed GT!)
    pred>thr & tgt<=thr           -> FP
    pred<=thr & tgt>thr           -> FN

Precision/recall/F1 are computed from the summed counts
(reference: train.py:1026-1032). These are grid-aligned metrics, not
NMS-based mAP — by design, for parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax

from yolo_from_scratch_tpu.ops.boxes import box_iou_center
from yolo_from_scratch_tpu.ops.decode import decode_predictions


def grid_metric_counts(
    pred, target, anchors, img_size, conf_threshold=0.5, iou_threshold=0.5,
    quirk_640=False, per_image=False,
):
    """TP/FP/FN counts for one scale.

    Args:
        pred: (B, H, W, A, 5+nc) RAW head output.
        target: (B, H, W, A, 5+nc) dense targets.
        anchors: (A, 2) pixel anchors for this scale.
        img_size: resolution for box decode. The reference decodes its eval
            path with the 640 default regardless of resolution
            (train.py:993; SURVEY.md §3.6) — set quirk_640 to replicate.
        per_image: if True return (B,) vectors instead of scalars (lets the
            caller discard padded batch rows exactly).

    Returns:
        (tp, fp, fn) int32 counts — scalars, or (B,) if per_image.
    """
    decode_size = 640 if quirk_640 else img_size
    decoded = decode_predictions(pred, anchors, decode_size)

    pred_obj = jax.nn.sigmoid(pred[..., 4])
    target_obj = target[..., 4]
    pm = pred_obj > conf_threshold
    tm = target_obj > conf_threshold

    iou = box_iou_center(decoded[..., 0:4], target[..., 0:4], eps=1e-6)
    hit = iou > iou_threshold

    tp = pm & tm & hit
    fp = (pm & tm & ~hit) | (pm & ~tm)
    fn = ~pm & tm

    axes = (1, 2, 3) if per_image else None
    to_i32 = lambda m: jnp.sum(m.astype(jnp.int32), axis=axes)
    return to_i32(tp), to_i32(fp), to_i32(fn)


def grid_metric_counts_anchor_free(
    pred, target, stride, img_size, conf_threshold=0.5, iou_threshold=0.5,
    per_image=False,
):
    """Anchor-free analogue of `grid_metric_counts`: confidence is the max
    class score (objectness is folded into cls in the decoupled head);
    the assigned flag lives at target channel 4. The class logits start
    AFTER the 4*REG_MAX DFL distribution logits — slicing from channel 4
    (the pre-DFL round-1 layout) would max over distribution logits,
    flagging nearly every cell positive.

    Caveat: this legacy CELL-ALIGNED metric scores agreement with the
    size-routed transport cell, which the TAL-trained head does not
    optimize (TAL picks cells by alignment, often a neighbour) — so its
    P/R/F1 understate a good TAL model. The NMS-path mAP (`--map`,
    train/map_eval.py) is the meaningful quality metric for this head;
    this counter is kept for stdout-contract parity with the anchor
    path."""
    from yolo_from_scratch_tpu.models.anchor_free import (
        REG_MAX,
        decode_anchor_free,
    )

    decoded = decode_anchor_free(pred, stride, img_size)
    conf = jnp.max(jax.nn.sigmoid(pred[..., 4 * REG_MAX:]), axis=-1)
    pm = conf > conf_threshold
    tm = target[..., 4] > conf_threshold

    iou = box_iou_center(decoded[..., 0:4], target[..., 0:4], eps=1e-6)
    hit = iou > iou_threshold

    tp = pm & tm & hit
    fp = (pm & tm & ~hit) | (pm & ~tm)
    fn = ~pm & tm

    axes = (1, 2) if per_image else None
    to_i32 = lambda m: jnp.sum(m.astype(jnp.int32), axis=axes)
    return to_i32(tp), to_i32(fp), to_i32(fn)


def prf1(tp, fp, fn):
    """Precision/recall/F1 in percent from counts (reference:
    train.py:1026-1032)."""
    tp, fp, fn = float(tp), float(fp), float(fn)
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return precision * 100.0, recall * 100.0, f1 * 100.0
