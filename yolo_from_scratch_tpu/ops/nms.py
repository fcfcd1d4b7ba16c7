"""Fixed-shape greedy NMS for TPU.

The reference's inference path uses `torchvision.ops.batched_nms`
(reference: train.py:1232-1233), a dynamic-shape C++/CUDA kernel; its
pure-Python `nms` (train.py:1086-1112) is a dynamic list loop. Neither maps
to XLA. This module implements the same greedy, confidence-sorted
suppression with STATIC shapes using a pivot-walk algorithm:

1. scores are sorted once (descending);
2. a `lax.while_loop` repeatedly takes the highest-ranked box that is
   neither kept nor suppressed (the pivot), keeps it, and knocks out every
   lower-ranked box overlapping it with one VPU-wide IoU row;
3. the loop runs exactly `#kept` iterations (<< K), not K — the standard
   TPU formulation (cf. TF's padded NMS) — then survivors are compacted to
   a fixed `max_outputs` slot count.

Class-aware "batched" semantics use the torchvision coordinate-offset
trick: boxes are shifted per class so cross-class pairs never overlap.

Equality semantics follow torchvision (suppress IoU > threshold, keep
ties); the reference's pure-Python nms suppresses IoU >= threshold — pass
`suppress_equal=True` to reproduce it.

A Pallas TPU kernel with the identical contract lives in
`yolo_from_scratch_tpu.ops.nms_pallas`; this lax version is the portable
fallback and the correctness oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from yolo_from_scratch_tpu.ops.boxes import box_iou_corner

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("suppress_equal", "max_keep"))
def nms_keep_mask(boxes, scores, iou_threshold, suppress_equal=False,
                  max_keep=None):
    """Greedy NMS on corner-format boxes.

    Args:
        boxes: (N, 4) [x1, y1, x2, y2].
        scores: (N,). Entries with score <= NEG_INF/2 are treated as padding
            and never kept.
        iou_threshold: scalar.
        max_keep: optional static cap on kept boxes (stops the pivot walk
            early; survivors beyond the cap are dropped, matching a
            top-max_keep truncation of torchvision's output).

    Returns:
        keep: (N,) bool mask over the ORIGINAL box order.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)  # stable: ties keep original index order
    boxes_s = boxes[order]
    scores_s = scores[order]

    ranks = jnp.arange(n)
    valid = scores_s > NEG_INF / 2  # padding slots can never be pivots
    cap = n if max_keep is None else min(max_keep, n)

    def avail(keep, suppressed):
        return valid & ~keep & ~suppressed

    def cond(carry):
        keep, suppressed, count = carry
        return jnp.any(avail(keep, suppressed)) & (count < cap)

    def body(carry):
        keep, suppressed, count = carry
        a = avail(keep, suppressed)
        # first available index == highest-scored unprocessed box
        i = jnp.argmax(a)
        pivot_box = jax.lax.dynamic_slice(boxes_s, (i, 0), (1, 4))
        iou_row = box_iou_corner(pivot_box, boxes_s)  # (N,)
        overlap = (
            iou_row >= iou_threshold if suppress_equal
            else iou_row > iou_threshold
        )
        keep = keep | (ranks == i)
        suppressed = suppressed | (overlap & (ranks > i))
        return keep, suppressed, count + 1

    keep0 = jnp.zeros(n, bool)
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, keep0, 0))
    # scatter back to original order
    return jnp.zeros(n, bool).at[order].set(keep)


def _class_offset_boxes(boxes, classes):
    """Shift boxes per class so distinct classes can never overlap
    (torchvision batched_nms semantics)."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0))
    offset = classes.astype(boxes.dtype) * (max_coord + 1.0)
    return boxes + offset[:, None]


@functools.partial(jax.jit, static_argnames=("max_outputs", "suppress_equal"))
def batched_nms_fixed(
    boxes, scores, classes, iou_threshold, max_outputs, suppress_equal=False
):
    """Class-aware global NMS with fixed-size output.

    Args:
        boxes: (N, 4) corner-format; padding rows should carry score NEG_INF.
        scores: (N,).
        classes: (N,) int class ids.
        max_outputs: static output capacity K.

    Returns:
        (boxes (K, 4), scores (K,), classes (K,), valid (K,) bool) sorted by
        descending score; invalid slots have score NEG_INF.
    """
    keep = nms_keep_mask(
        _class_offset_boxes(boxes, classes),
        scores,
        iou_threshold,
        suppress_equal=suppress_equal,
        max_keep=max_outputs,
    )
    masked_scores = jnp.where(keep, scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(masked_scores, max_outputs)
    valid = top_scores > NEG_INF / 2
    return boxes[top_idx], top_scores, classes[top_idx], valid


def nms_fixed(boxes, scores, iou_threshold, max_outputs, suppress_equal=False):
    """Single-class convenience wrapper around `batched_nms_fixed`."""
    classes = jnp.zeros(boxes.shape[0], jnp.int32)
    b, s, _, v = batched_nms_fixed(
        boxes, scores, classes, iou_threshold, max_outputs, suppress_equal
    )
    return b, s, v
