"""Pallas TPU kernel for fixed-shape greedy NMS.

Replaces the reference's `torchvision.ops.batched_nms` C++/CUDA call
(reference: train.py:1232-1233) with an on-chip kernel: boxes live in VMEM
for the whole suppression walk, each pivot iteration is one VPU-wide IoU
row over all K candidates, and the loop runs `#kept` iterations (the
pivot-walk formulation, identical greedy semantics to torchvision).

Layout notes (see /opt/skills/guides/pallas_guide.md):
- every K-wide working vector is shaped (R, 128) with R = K/128 rounded up
  to a multiple of 8, so each f32 vreg tile (8 sublanes x 128 lanes) is
  fully used — a flat (1, K) row would leave 7/8 of every tile empty and
  cost ~8x the vector work per pivot iteration;
- pivot selection is a max + exact one-hot compare (the selection key is
  strictly decreasing in rank, so the max is unique) — no argmax, whose
  Mosaic tie-breaking is unspecified and whose lowering is slower than a
  plain reduction;
- scalars (iou threshold, max_keep) ride in SMEM as (1, 1);
- masks are f32 0/1 in VMEM (bool vectors tile poorly);
- the sequential dependency is a `lax.while_loop` carried in registers —
  nothing round-trips to HBM until the final keep-mask store.

The pure-lax implementation in `ops.nms` is the correctness oracle; both
produce bit-identical keep masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolo_from_scratch_tpu.ops.nms import NEG_INF, _class_offset_boxes

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nms_kernel(thr_ref, cap_ref, boxes_ref, valid_ref, keep_ref):
    """One grid step = one image. boxes_ref: (1, 4, R, 128) sorted desc by
    score, row-major rank order. valid_ref/keep_ref: (1, R, 128)."""
    r = boxes_ref.shape[2]
    x1 = boxes_ref[0, 0]  # (R, 128)
    y1 = boxes_ref[0, 1]
    x2 = boxes_ref[0, 2]
    y2 = boxes_ref[0, 3]
    area = (x2 - x1) * (y2 - y1)

    thr = thr_ref[0, 0]
    cap = cap_ref[0, 0]
    valid = valid_ref[0]  # (R, 128) f32 0/1 mask

    # row-major linear rank: rank[i, j] = i * 128 + j, matching the sorted
    # flat order the host staged. f32 is exact for any practical K (< 2^24).
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, LANE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, LANE), 1)
    ranks_f = (rows * LANE + cols).astype(jnp.float32)
    kf = jnp.float32(r * LANE)

    # All loop carries are f32 arrays / i32 scalars: bool vector carries
    # and bool arg-reductions do not legalize in the Mosaic TPU lowering.
    def avail(keep, suppressed):
        return valid * (1.0 - keep) * (1.0 - suppressed)

    def cond(carry):
        keep, suppressed, count = carry
        return (jnp.max(avail(keep, suppressed)) > 0.0) & (count < cap)

    def body(carry):
        keep, suppressed, count = carry
        a = avail(keep, suppressed)
        # first available == best score. The key is strictly decreasing in
        # rank so its maximum is UNIQUE — the equality compare below is an
        # exact one-hot.
        key = a * (kf - ranks_f)
        onehot = jnp.where(key == jnp.max(key), 1.0, 0.0)
        pivot_rank = jnp.sum(ranks_f * onehot)

        # pivot coordinate extraction via one-hot reduction (dynamic_slice
        # of vector values is not lowerable in Mosaic)
        px1 = jnp.sum(x1 * onehot)
        py1 = jnp.sum(y1 * onehot)
        px2 = jnp.sum(x2 * onehot)
        py2 = jnp.sum(y2 * onehot)
        parea = (px2 - px1) * (py2 - py1)

        ix1 = jnp.maximum(px1, x1)
        iy1 = jnp.maximum(py1, y1)
        ix2 = jnp.minimum(px2, x2)
        iy2 = jnp.minimum(py2, y2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        iou = inter / (parea + area - inter + 1e-6)

        overlap = (
            jnp.where(iou > thr, 1.0, 0.0)
            * jnp.where(ranks_f > pivot_rank, 1.0, 0.0)
        )
        keep = jnp.maximum(keep, onehot)
        suppressed = jnp.maximum(suppressed, overlap)
        return keep, suppressed, count + 1

    zeros = jnp.zeros((r, LANE), jnp.float32)
    keep, _, _ = jax.lax.while_loop(cond, body, (zeros, zeros, 0))
    keep_ref[0] = keep


@functools.partial(
    jax.jit, static_argnames=("max_keep", "interpret", "presorted")
)
def nms_keep_mask_pallas_batched(boxes, scores, iou_threshold, max_keep=None,
                                 interpret=False, presorted=False):
    """Batched Pallas NMS: one grid step per image, each running the full
    pivot walk in VMEM. A vmapped `pallas_call` is unsupported — the batch
    axis is a kernel grid dimension instead.

    Args:
        boxes: (B, N, 4) corner boxes.
        scores: (B, N); entries <= NEG_INF/2 are padding, never kept.
        presorted: scores are already descending per image (e.g. straight
            out of `lax.top_k`) — skips the sort and the unsort scatter.
            Exact: a stable argsort of an already-sorted vector is the
            identity permutation.

    Returns (B, N) bool keep mask in the ORIGINAL per-image box order."""
    b, n, _ = boxes.shape
    if presorted:
        boxes_s, scores_s = boxes, scores
    else:
        order = jnp.argsort(-scores, axis=1)
        boxes_s = jnp.take_along_axis(boxes, order[..., None], axis=1)
        scores_s = jnp.take_along_axis(scores, order, axis=1)

    # pad to full (8, 128) f32 vreg tiles: R rows of 128 lanes, R % 8 == 0
    r = _round_up(_round_up(n, LANE) // LANE, SUBLANE)
    k = r * LANE
    pad = k - n
    boxes_t = (
        jnp.pad(boxes_s, ((0, 0), (0, pad), (0, 0)))
        .transpose(0, 2, 1)
        .reshape(b, 4, r, LANE)
    )
    valid = jnp.pad(
        (scores_s > NEG_INF / 2).astype(jnp.float32), ((0, 0), (0, pad))
    ).reshape(b, r, LANE)

    cap = n if max_keep is None else min(max_keep, n)
    thr = jnp.asarray([[iou_threshold]], jnp.float32)
    cap_arr = jnp.asarray([[cap]], jnp.int32)

    keep_f = pl.pallas_call(
        _nms_kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, r, LANE), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, r, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(thr, cap_arr, boxes_t, valid)

    keep_sorted = keep_f.reshape(b, k)[:, :n] > 0.5
    if presorted:
        return keep_sorted
    return (
        jnp.zeros((b, n), bool)
        .at[jnp.arange(b)[:, None], order]
        .set(keep_sorted)
    )


@functools.partial(
    jax.jit, static_argnames=("max_keep", "interpret", "presorted")
)
def nms_keep_mask_pallas(boxes, scores, iou_threshold, max_keep=None,
                         interpret=False, presorted=False):
    """Drop-in Pallas equivalent of `ops.nms.nms_keep_mask` (torchvision
    suppress-on-greater semantics). Returns (N,) bool keep mask in the
    ORIGINAL box order."""
    return nms_keep_mask_pallas_batched(
        boxes[None], scores[None], iou_threshold, max_keep=max_keep,
        interpret=interpret, presorted=presorted,
    )[0]


def batched_nms_fixed_pallas(boxes, scores, classes, iou_threshold,
                             max_outputs, interpret=False, presorted=False):
    """Class-aware global NMS with fixed-size output — Pallas path.
    Same contract as `ops.nms.batched_nms_fixed`."""
    keep = nms_keep_mask_pallas(
        _class_offset_boxes(boxes, classes), scores, iou_threshold,
        max_keep=max_outputs, interpret=interpret, presorted=presorted,
    )
    masked_scores = jnp.where(keep, scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(masked_scores, max_outputs)
    valid = top_scores > NEG_INF / 2
    return boxes[top_idx], top_scores, classes[top_idx], valid


@functools.partial(
    jax.jit, static_argnames=("max_outputs", "interpret", "presorted")
)
def batched_nms_fixed_pallas_images(boxes, scores, classes, iou_threshold,
                                    max_outputs, interpret=False,
                                    presorted=False):
    """Class-aware global NMS over a BATCH of images, one kernel launch.
    Same per-image contract as `ops.nms.batched_nms_fixed`, shapes
    (B, N, 4)/(B, N)/(B, N) -> (B, K, 4)/(B, K)/(B, K)/(B, K)."""
    offset_boxes = jax.vmap(_class_offset_boxes)(boxes, classes)
    keep = nms_keep_mask_pallas_batched(
        offset_boxes, scores, iou_threshold, max_keep=max_outputs,
        interpret=interpret, presorted=presorted,
    )
    masked_scores = jnp.where(keep, scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(masked_scores, max_outputs)
    valid = top_scores > NEG_INF / 2
    out_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    out_classes = jnp.take_along_axis(classes, top_idx, axis=1)
    return out_boxes, top_scores, out_classes, valid
