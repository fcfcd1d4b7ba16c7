"""Anchor-free decoupled detection head (YOLOv8-style) — the stretch
config in BASELINE.json ("anchor-free decoupled head (new — stretch the
detection-head + NMS API YOLOv8-style)"). Not present in the reference;
this extends the framework's detect API with a second head family behind
the same model/loss/NMS plumbing.

Round-2 design (real v8 training recipe, fully dense/jittable):
- decoupled branches per scale: a box branch emitting 4*REG_MAX
  distribution logits (DFL: each edge distance l/t/r/b is a softmax over
  REG_MAX bins in stride units, decoded as the distribution's
  expectation) and a class branch (objectness folded into class scores,
  prior-initialized bias);
- Task-Aligned Assignment (TAL), computed inside the training step from
  the CURRENT predictions: per GT, candidate cells are those whose center
  lies inside the GT box; the top-k by the alignment metric
  score^alpha * IoU^beta are assigned; a cell claimed by several GTs goes
  to the one with the highest metric. Classification targets are the
  IoU-normalized alignment scores (soft), box/DFL losses are weighted by
  them — the v8 recipe, replacing round 1's size-routed center assigner;
- the DATA pipeline is untouched: the dense per-scale target maps from
  `assign_targets_anchor_free` are used only as transport (each GT
  occupies exactly one cell), and the loss gathers them back into a
  padded (M, 4+nc) GT set on-device before assignment. The cell a GT
  rides in has no effect on TAL training.

Everything is static-shape: the assignment is a dense (B, M, A) tensor
program (M = MAX_GT padded GT slots, A = all cells across scales), no
sorting-by-content or dynamic gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_from_scratch_tpu.models.blocks import ConvBNSiLU, torch_kernel_init

REG_MAX = 16      # DFL bins per edge distance (v8 default)
MAX_GT = 32       # padded GT slots per image in the TAL loss
TAL_TOPK = 10     # candidates per GT
TAL_ALPHA = 0.5   # alignment = score^alpha * iou^beta (v8 defaults)
TAL_BETA = 6.0


class DecoupledHead(nn.Module):
    """Box (DFL distribution) + class branches
    -> (B, H, W, 4 * REG_MAX + nc).

    `cls_prior`: initial sigmoid(cls) probability. v8 initializes the
    cls bias per scale to log(5/nc/(img/stride)^2) — i.e. "expect ~5
    objects of any class per image at this scale" — which at nc=80
    means sigma ~1e-5, not the 0.01 flat prior round 2 used; the flat
    prior costs the first epochs a large all-negatives BCE transient
    (8400*nc logits at sigma=0.01 vs the handful of true positives).
    YOLO passes the v8 value per scale."""

    channels: int
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    cls_prior: float = 0.01

    @nn.compact
    def __call__(self, x, train: bool = False):
        box = ConvBNSiLU(self.channels, 3, dtype=self.dtype, name="box_conv1")(
            x, train
        )
        box = ConvBNSiLU(self.channels, 3, dtype=self.dtype, name="box_conv2")(
            box, train
        )
        from yolo_from_scratch_tpu.models.blocks import torch_bias_init_for

        box = nn.Conv(4 * REG_MAX, (1, 1), use_bias=True, dtype=self.dtype,
                      param_dtype=jnp.float32, kernel_init=torch_kernel_init,
                      bias_init=torch_bias_init_for(box.shape[-1]),
                      name="box_pred")(box)

        cls = ConvBNSiLU(self.channels, 3, dtype=self.dtype, name="cls_conv1")(
            x, train
        )
        cls = ConvBNSiLU(self.channels, 3, dtype=self.dtype, name="cls_conv2")(
            cls, train
        )
        import functools

        cls = nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=torch_kernel_init,
            bias_init=functools.partial(_cls_prior_bias,
                                        prior=self.cls_prior),
            name="cls_pred",
        )(cls)
        return jnp.concatenate([box, cls], axis=-1)


def _cls_prior_bias(key, shape, dtype=jnp.float32, prior=0.01):
    """Class-score bias so initial sigmoid(cls) ~ prior (objectness is
    folded into the class scores in the anchor-free head)."""
    import math

    return jnp.full(shape, -math.log((1 - prior) / prior), dtype)


def v8_cls_prior(num_classes: int, img_size: int, stride: int) -> float:
    """The v8 per-scale cls bias prior: ~5 objects/image spread over the
    scale's (img/stride)^2 cells and nc classes (ultralytics
    Detect.bias_init: b[:nc] = log(5 / nc / (640/s)^2))."""
    p = 5.0 / num_classes / (img_size / stride) ** 2
    return float(min(max(p, 1e-8), 0.5))


def dfl_expectation(dist_logits):
    """(..., 4, REG_MAX) logits -> (..., 4) expected distances (stride
    units): softmax over bins, dotted with bin indices."""
    probs = jax.nn.softmax(dist_logits, axis=-1)
    bins = jnp.arange(REG_MAX, dtype=probs.dtype)
    return jnp.sum(probs * bins, axis=-1)


def decode_anchor_free(raw, stride, img_size):
    """Decode (B, H, W, 4*REG_MAX + nc) raw head output to normalized
    center-format boxes + passthrough class logits -> (B, H, W, 4 + nc).

    ltrb = DFL expectation in stride units; the box spans
    [center - (l, t), center + (r, b)] in pixels.
    """
    b, h, w, _ = raw.shape
    dtype = raw.dtype
    dist = raw[..., : 4 * REG_MAX].reshape(b, h, w, 4, REG_MAX)
    ltrb = dfl_expectation(dist) * (stride / img_size)
    cx = (jax.lax.broadcasted_iota(dtype, (1, h, w), 2) + 0.5) * (
        stride / img_size
    )
    cy = (jax.lax.broadcasted_iota(dtype, (1, h, w), 1) + 0.5) * (
        stride / img_size
    )
    x1 = cx - ltrb[..., 0]
    y1 = cy - ltrb[..., 1]
    x2 = cx + ltrb[..., 2]
    y2 = cy + ltrb[..., 3]
    boxes = jnp.stack(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )
    return jnp.concatenate([boxes, raw[..., 4 * REG_MAX:]], axis=-1)


# size thresholds (fraction of image) routing a GT to P3/P4/P5 in the
# dense TRANSPORT maps (the cell choice is irrelevant to TAL training —
# the loss gathers GTs back out; kept size-routed so the legacy
# grid-aligned eval metric stays meaningful)
AF_SCALE_THRESHOLDS = (0.1, 0.25)


def assign_targets_anchor_free(boxes: np.ndarray, class_ids: np.ndarray,
                               img_size: int, num_classes: int):
    """Dense anchor-free targets: [(gs, gs, 4 + 1 + nc)] x3.

    Channel layout: 0:4 box (normalized cx, cy, w, h), 4 assigned flag,
    5: one-hot class. A GT goes to the single cell containing its center
    at the scale picked by max(w, h): <=10% of image -> P3, <=25% -> P4,
    else P5. First GT wins an occupied cell. These maps are TRANSPORT for
    the TAL loss (see module docstring) and the target for the
    grid-aligned eval metric.
    """
    from yolo_from_scratch_tpu.config import STRIDES

    grid_sizes = [img_size // s for s in STRIDES]
    targets = [
        np.zeros((gs, gs, 4 + 1 + num_classes), np.float32) for gs in grid_sizes
    ]
    for n in range(len(boxes)):
        size = max(boxes[n, 2], boxes[n, 3])
        s = 0 if size <= AF_SCALE_THRESHOLDS[0] else (
            1 if size <= AF_SCALE_THRESHOLDS[1] else 2
        )
        gs = grid_sizes[s]
        gx = max(0, min(int(boxes[n, 0] * gs), gs - 1))
        gy = max(0, min(int(boxes[n, 1] * gs), gs - 1))
        t = targets[s]
        if t[gy, gx, 4] == 0:
            t[gy, gx, 0:4] = boxes[n]
            t[gy, gx, 4] = 1.0
            t[gy, gx, 5 + int(class_ids[n])] = 1.0
    return targets


def assign_targets_anchor_free_device(labels, count, img_size: int,
                                       num_classes: int):
    """Jittable `assign_targets_anchor_free` from compact labels.

    Args:
        labels: (K, 5) float32 [class, cx, cy, w, h]; rows >= count are
            padding.
        count: () int32 valid-row count.

    Returns [(gs, gs, 4+1+nc)] x3 — identical to the host assignment on
    the same valid labels (same size-routed scale choice, truncating
    cell index, first-GT-wins rule in row order). Lets the compact val
    loader serve the anchor-free grid metric without dense transport
    from the host (the TAL LOSS never needs these maps — see
    yolo_loss_anchor_free_from_gt)."""
    from yolo_from_scratch_tpu.config import STRIDES

    k = labels.shape[0]
    grid_sizes = [img_size // s for s in STRIDES]
    boxes = labels[:, 1:5]
    cls_ids = labels[:, 0].astype(jnp.int32)
    valid = jnp.arange(k) < count

    size = jnp.maximum(boxes[:, 2], boxes[:, 3])
    scale = jnp.where(
        size <= AF_SCALE_THRESHOLDS[0], 0,
        jnp.where(size <= AF_SCALE_THRESHOLDS[1], 1, 2),
    )
    # guarded one-hot (host indexing would fault on out-of-range ids;
    # clamp-and-zero like the anchor path's assign_device)
    onehot = jnp.zeros((k, num_classes), jnp.float32).at[
        jnp.arange(k), jnp.clip(cls_ids, 0, num_classes - 1)
    ].set(jnp.where((cls_ids >= 0) & (cls_ids < num_classes), 1.0, 0.0))
    rows = jnp.concatenate(
        [boxes, jnp.ones((k, 1), jnp.float32), onehot], axis=1
    )

    order = jnp.arange(k)
    targets = []
    for s, gs in enumerate(grid_sizes):
        dummy = gs * gs
        gx = jnp.clip((boxes[:, 0] * gs).astype(jnp.int32), 0, gs - 1)
        gy = jnp.clip((boxes[:, 1] * gs).astype(jnp.int32), 0, gs - 1)
        mine = valid & (scale == s)
        slot = jnp.where(mine, gy * gs + gx, dummy)
        # first-wins: an earlier valid box on the same live slot evicts
        # mine (padding rows all share the dummy slot, which is never a
        # live slot, so they can't cross-match)
        clash = (slot[None, :] == slot[:, None]) & (order[None, :] <
                                                    order[:, None])
        winner = mine & ~jnp.any(clash, axis=1)
        idx = jnp.where(winner, slot, dummy)
        flat = jnp.zeros((dummy + 1, 5 + num_classes), jnp.float32
                         ).at[idx].set(rows)
        targets.append(flat[:-1].reshape(gs, gs, 5 + num_classes))
    return targets


assign_targets_anchor_free_device_batch = jax.vmap(
    assign_targets_anchor_free_device, in_axes=(0, 0, None, None),
    out_axes=0,
)


def _anchor_points(img_size):
    """Normalized cell centers + per-cell stride over all scales, flattened:
    (A, 2) points, (A,) strides (pixels)."""
    from yolo_from_scratch_tpu.config import STRIDES

    pts, strides = [], []
    for s in STRIDES:
        g = img_size // s
        xs = (np.arange(g, dtype=np.float32) + 0.5) * (s / img_size)
        cx, cy = np.meshgrid(xs, xs)  # cx varies along axis 1
        pts.append(np.stack([cx.ravel(), cy.ravel()], axis=1))
        strides.append(np.full(g * g, s, np.float32))
    return np.concatenate(pts), np.concatenate(strides)


def _gather_gt(targets, num_classes, max_gt=MAX_GT):
    """Pull the padded GT set back out of the dense transport maps.

    targets: [(B, gs, gs, 4+1+nc)] x3 ->
    (gt_boxes (B, M, 4) cxcywh norm, gt_cls (B, M, nc) one-hot,
     gt_valid (B, M) float 0/1)."""
    b = targets[0].shape[0]
    d = 4 + 1 + num_classes
    flat = jnp.concatenate([t.reshape(b, -1, d) for t in targets], axis=1)
    flags = flat[..., 4]
    # top_k is stable: assigned cells (flag 1) come first, index order
    _, idx = jax.lax.top_k(flags, max_gt)
    rows = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return rows[..., 0:4], rows[..., 5:], rows[..., 4]


def _pairwise_iou_xyxy(gt, pred):
    """gt (B, M, 4) xyxy vs pred (B, A, 4) xyxy -> (B, M, A)."""
    gt = gt[:, :, None, :]
    pred = pred[:, None, :, :]
    ix1 = jnp.maximum(gt[..., 0], pred[..., 0])
    iy1 = jnp.maximum(gt[..., 1], pred[..., 1])
    ix2 = jnp.minimum(gt[..., 2], pred[..., 2])
    iy2 = jnp.minimum(gt[..., 3], pred[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    a_gt = (gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1])
    a_pr = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    return inter / (a_gt + a_pr - inter + 1e-9)


def _kth_threshold(align, topk, impl="iter"):
    """The k-th-largest align value per (B, M) row — the TAL candidate
    threshold.

    impl='sort': lax.top_k (sorts all A columns — exact under ties).
    impl='iter' (default): k passes of max+mask — O(k*A) vector work
    instead of a sort over A=8400; returns the k-th largest DISTINCT
    value, which differs from 'sort' only when the k-th value is exactly
    tied (measure-zero for the float products align is made of; both
    impls then select via `align >= kth`, so near-ties select
    identically). Measured on v5e nc=80 @640 b8: tal_assign 2.23 ms
    (sort) -> 0.50 ms (iter) — the sort was the AF loss's single
    largest term (benchmarks/afbench.py, 2026-08-20)."""
    if impl == "iter":
        x = align
        kth = jnp.max(x, axis=-1, keepdims=True)
        for _ in range(topk - 1):
            x = jnp.where(x >= kth, -jnp.inf, x)
            kth = jnp.max(x, axis=-1, keepdims=True)
        return kth
    return jax.lax.top_k(align, topk)[0][..., -1:]


def tal_assign(pred_scores, pred_xyxy, anchor_pts, gt_boxes, gt_cls,
               gt_valid, topk=TAL_TOPK, alpha=TAL_ALPHA, beta=TAL_BETA,
               with_stats=False, topk_impl="iter"):
    """Task-aligned assignment (dense, static shapes).

    Args:
        pred_scores: (B, A, nc) sigmoid class scores.
        pred_xyxy: (B, A, 4) decoded boxes, normalized corners.
        anchor_pts: (A, 2) normalized cell centers.
        gt_boxes: (B, M, 4) cxcywh normalized.
        gt_cls: (B, M, nc) one-hot.
        gt_valid: (B, M) 0/1.
        with_stats: also return a "stats" dict of assignment diagnostics
            (scalars; see `make_af_stats_fn`) — the instrumentation the
            nc=80 collapse analysis runs on (VERDICT r4 #1).

    Returns dict with:
        fg (B, A) float 0/1 foreground mask;
        target_boxes (B, A, 4) assigned GT (cxcywh);
        target_scores (B, A, nc) soft cls targets (IoU-normalized align);
    """
    gt_xyxy = jnp.concatenate(
        [gt_boxes[..., 0:2] - gt_boxes[..., 2:4] / 2,
         gt_boxes[..., 0:2] + gt_boxes[..., 2:4] / 2], axis=-1
    )
    # candidates: anchor center strictly inside the GT box
    ax = anchor_pts[None, None, :, 0]
    ay = anchor_pts[None, None, :, 1]
    in_gt = (
        (ax > gt_xyxy[..., 0:1]) & (ax < gt_xyxy[..., 2:3])
        & (ay > gt_xyxy[..., 1:2]) & (ay < gt_xyxy[..., 3:4])
    ).astype(pred_scores.dtype)                      # (B, M, A)

    iou = _pairwise_iou_xyxy(gt_xyxy, pred_xyxy)     # (B, M, A)
    # score of each anchor for its GT's class
    gt_score = jnp.einsum("bac,bmc->bma", pred_scores, gt_cls)
    align = (
        jnp.power(jnp.clip(gt_score, 1e-9), alpha)
        * jnp.power(jnp.clip(iou, 1e-9), beta)
        * in_gt * gt_valid[..., None]
    )

    # top-k candidates per GT: threshold at the k-th largest align value
    kth = _kth_threshold(align, topk, topk_impl)     # (B, M, 1)
    cand = (align >= kth) & (align > 0)              # (B, M, A) bool

    # conflict resolution: an anchor claimed by several GTs goes to the
    # one with the highest align metric
    align_c = jnp.where(cand, align, 0.0)
    best_gt = jnp.argmax(align_c, axis=1)            # (B, A)
    best_val = jnp.max(align_c, axis=1)              # (B, A)
    fg = (best_val > 0).astype(pred_scores.dtype)

    onehot_m = jax.nn.one_hot(best_gt, gt_boxes.shape[1],
                              dtype=pred_scores.dtype)  # (B, A, M)
    assigned = onehot_m * fg[..., None]              # anchor->GT matrix

    target_boxes = jnp.einsum("bam,bmk->bak", assigned, gt_boxes)

    # v8 normalization: per GT, scale align so its max equals the GT's max
    # IoU; soft cls target = one-hot(class) * normalized align at anchor
    align_res = align * jnp.transpose(assigned, (0, 2, 1))  # keep winners
    max_align = jnp.max(align_res, axis=2, keepdims=True)   # (B, M, 1)
    max_iou = jnp.max(iou * jnp.transpose(assigned, (0, 2, 1)), axis=2,
                      keepdims=True)
    norm = max_iou / jnp.maximum(max_align, 1e-9)           # (B, M, 1)
    anchor_align = jnp.einsum("bma,bam->ba", align_res * norm, onehot_m)
    target_cls_onehot = jnp.einsum("bam,bmc->bac", assigned, gt_cls)
    target_scores = target_cls_onehot * anchor_align[..., None]

    out = {"fg": fg, "target_boxes": target_boxes,
           "target_scores": target_scores}
    if with_stats:
        n_gt = jnp.maximum(jnp.sum(gt_valid), 1.0)
        n_img = jnp.asarray(gt_valid.shape[0], jnp.float32)
        fg_f = fg
        # per-GT: in-box candidate count, selected count, assigned count
        per_gt_in = jnp.sum(in_gt, axis=2)
        per_gt_sel = jnp.sum(cand.astype(align.dtype), axis=2)
        # assigned is (B, A, M): cells each GT finally owns
        per_gt_asn = jnp.sum(assigned, axis=1)                 # (B, M)
        starved = (gt_valid > 0) & (per_gt_asn < 0.5)
        max_iou_gt = jnp.max(iou * in_gt, axis=2)              # (B, M)
        gmask = gt_valid
        out["stats"] = {
            "fg_per_img": jnp.sum(fg_f) / n_img,
            "gt_per_img": jnp.sum(gt_valid) / n_img,
            "cand_in_per_gt": jnp.sum(per_gt_in * gmask) / n_gt,
            "cand_sel_per_gt": jnp.sum(per_gt_sel * gmask) / n_gt,
            "assigned_per_gt": jnp.sum(per_gt_asn * gmask) / n_gt,
            "starved_gt_frac": jnp.sum(starved) / n_gt,
            "gt_best_iou": jnp.sum(max_iou_gt * gmask) / n_gt,
            "align_fg_mean": jnp.sum(best_val) / jnp.maximum(
                jnp.sum(fg_f), 1.0),
            "align_max": jnp.max(best_val),
            "tgt_score_sum": jnp.sum(target_scores),
            "tgt_score_max": jnp.max(target_scores),
            # sigmoid score of the assigned class at fg cells (task
            # alignment of the cls branch) vs the background ceiling
            "cls_fg_mean": jnp.sum(
                jnp.einsum("bac,bac->ba", pred_scores, target_cls_onehot)
            ) / jnp.maximum(jnp.sum(fg_f), 1.0),
            "cls_bg_p99": jnp.percentile(
                jnp.max(pred_scores, axis=-1) * (1.0 - fg_f), 99.0),
            "cls_max": jnp.max(pred_scores),
        }
    return out


def _dfl_loss(dist_logits, target_ltrb):
    """Distribution focal loss: cross-entropy against the two integer bins
    bracketing each target distance, linearly weighted (v8). Shapes:
    dist_logits (..., 4, REG_MAX), target_ltrb (..., 4) in stride units.
    Returns per-element loss summed over the 4 edges: (...)."""
    t = jnp.clip(target_ltrb, 0.0, REG_MAX - 1 - 1e-3)
    tl = jnp.floor(t)
    wr = t - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(dist_logits, axis=-1)
    tl_i = tl.astype(jnp.int32)
    lp_l = jnp.take_along_axis(logp, tl_i[..., None], axis=-1)[..., 0]
    lp_r = jnp.take_along_axis(logp, (tl_i + 1)[..., None], axis=-1)[..., 0]
    return jnp.sum(-(wl * lp_l + wr * lp_r), axis=-1)


def _flatten_af_preds(predictions, num_classes, img_size):
    """Flatten the per-scale head outputs into all-cells tensors.

    Returns (dist (B, A, 4, REG_MAX), cls_logits (B, A, nc),
    boxes_cxcywh (B, A, 4), boxes_xyxy (B, A, 4), anchor_pts (A, 2),
    strides (A,)) — all float32, A = sum of grid cells across scales."""
    from yolo_from_scratch_tpu.config import STRIDES

    b = predictions[0].shape[0]
    pts_np, strides_np = _anchor_points(img_size)
    anchor_pts = jnp.asarray(pts_np)
    strides = jnp.asarray(strides_np)

    dist_all, cls_all, boxes_all = [], [], []
    for pred, stride in zip(predictions, STRIDES):
        _, h, w, _ = pred.shape
        dist_all.append(
            pred[..., : 4 * REG_MAX].reshape(b, h * w, 4, REG_MAX)
        )
        cls_all.append(pred[..., 4 * REG_MAX:].reshape(b, h * w, num_classes))
        decoded = decode_anchor_free(pred, stride, img_size)
        boxes_all.append(decoded[..., 0:4].reshape(b, h * w, 4))
    dist = jnp.concatenate(dist_all, axis=1).astype(jnp.float32)
    cls_logits = jnp.concatenate(cls_all, axis=1).astype(jnp.float32)
    boxes_cxcywh = jnp.concatenate(boxes_all, axis=1).astype(jnp.float32)
    boxes_xyxy = jnp.concatenate(
        [boxes_cxcywh[..., 0:2] - boxes_cxcywh[..., 2:4] / 2,
         boxes_cxcywh[..., 0:2] + boxes_cxcywh[..., 2:4] / 2], axis=-1
    )
    return dist, cls_logits, boxes_cxcywh, boxes_xyxy, anchor_pts, strides


def yolo_loss_anchor_free(predictions, targets, num_classes, img_size,
                          box_weight=7.5, cls_weight=0.5, dfl_weight=1.5,
                          **tal_kw):
    """v8-recipe anchor-free loss: TAL assignment from the current
    predictions, then BCE on soft class targets over ALL cells + CIoU +
    DFL on assigned cells, all weighted by the alignment scores.
    Returns (total, bbox, cls) — same contract as round 1."""
    gt_boxes, gt_cls, gt_valid = _gather_gt(targets, num_classes)
    return yolo_loss_anchor_free_from_gt(
        predictions, gt_boxes, gt_cls, gt_valid, num_classes, img_size,
        box_weight, cls_weight, dfl_weight, **tal_kw,
    )


def yolo_loss_anchor_free_from_gt(predictions, gt_boxes, gt_cls, gt_valid,
                                  num_classes, img_size, box_weight=7.5,
                                  cls_weight=0.5, dfl_weight=1.5,
                                  topk=TAL_TOPK, alpha=TAL_ALPHA,
                                  beta=TAL_BETA):
    """The anchor-free loss on an explicit padded GT set — TAL assigns
    from GT box LISTS, so the dense maps the anchor head needs are pure
    transport here (`_gather_gt` strips them right back off). The compact
    training path (data/assign_device.py) therefore feeds this directly:
    gt_boxes = labels[..., 1:5], gt_cls = one-hot, gt_valid = row mask —
    no dense materialization anywhere, and no per-cell collision loss
    (two GTs whose centers share a cell both survive as TAL candidates,
    where the dense transport kept only one).

    Args:
        gt_boxes: (B, M, 4) cxcywh normalized.
        gt_cls: (B, M, nc) one-hot (zero rows where invalid).
        gt_valid: (B, M) float 0/1.
        topk/alpha/beta: TAL knobs (v8 defaults) — exposed for the
            nc=80 recipe study (VERDICT r4 #1).
    """
    import optax

    from yolo_from_scratch_tpu.ops.ciou import ciou

    dist, cls_logits, boxes_cxcywh, boxes_xyxy, anchor_pts, strides = (
        _flatten_af_preds(predictions, num_classes, img_size)
    )

    # v8 semantics: the assigner runs DETACHED (ultralytics computes TAL
    # under no_grad on detached scores/boxes). Round-4 code let gradients
    # flow through the whole (B, M, A) assignment graph — the BCE target
    # side then leaks a -logit gradient term into the cls branch (targets
    # chase scores AND scores chase targets), and the backward pays for
    # the assignment einsums/IoU matrix. Both wrong vs the claimed
    # recipe; r5 A/B on the nc=80 regime: detach is also what lets the
    # anti-overfit levers behave as in v8.
    asn = tal_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(cls_logits)),
        jax.lax.stop_gradient(boxes_xyxy), anchor_pts,
        gt_boxes, gt_cls, gt_valid, topk=topk, alpha=alpha, beta=beta)
    fg = asn["fg"]
    target_scores = asn["target_scores"]
    score_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

    # classification: BCE against the soft targets over every cell
    cls_loss = jnp.sum(
        optax.sigmoid_binary_cross_entropy(cls_logits, target_scores)
    ) / score_sum

    # box: CIoU on foreground cells, weighted by the (summed) soft score
    w_fg = jnp.sum(target_scores, axis=-1) * fg          # (B, A)
    ciou_term = (1.0 - ciou(boxes_cxcywh, asn["target_boxes"])) * w_fg
    box_loss = jnp.sum(ciou_term) / score_sum

    # DFL: target edge distances in stride units from assigned boxes
    tb = asn["target_boxes"]
    t_xyxy = jnp.concatenate(
        [tb[..., 0:2] - tb[..., 2:4] / 2, tb[..., 0:2] + tb[..., 2:4] / 2],
        axis=-1,
    )
    scale = (img_size / strides)[None, :, None]           # norm -> strides
    ltrb = jnp.concatenate(
        [anchor_pts[None] - t_xyxy[..., 0:2],
         t_xyxy[..., 2:4] - anchor_pts[None]], axis=-1
    ) * scale
    dfl = _dfl_loss(dist, ltrb) * w_fg
    dfl_loss_v = jnp.sum(dfl) / score_sum

    total = (box_weight * box_loss + cls_weight * cls_loss
             + dfl_weight * dfl_loss_v)
    return total, box_loss, cls_loss


def af_assignment_stats(predictions, gt_boxes, gt_cls, gt_valid,
                        num_classes, img_size, topk=TAL_TOPK,
                        alpha=TAL_ALPHA, beta=TAL_BETA):
    """TAL diagnostics on one batch (VERDICT r4 #1 instrumentation).

    Returns a dict of scalars: the `tal_assign` stats plus per-scale fg
    splits and the DFL target-clipping fraction (fg cells whose true
    edge distance exceeds REG_MAX-1 stride units — cells the DFL head
    cannot actually regress to their target)."""
    from yolo_from_scratch_tpu.config import STRIDES

    dist, cls_logits, boxes_cxcywh, boxes_xyxy, anchor_pts, strides = (
        _flatten_af_preds(predictions, num_classes, img_size)
    )
    asn = tal_assign(jax.nn.sigmoid(cls_logits), boxes_xyxy, anchor_pts,
                     gt_boxes, gt_cls, gt_valid, topk=topk, alpha=alpha,
                     beta=beta, with_stats=True)
    stats = asn["stats"]
    fg = asn["fg"]
    n_img = jnp.asarray(fg.shape[0], jnp.float32)

    # per-scale foreground split
    bounds = np.cumsum([0] + [(img_size // s) ** 2 for s in STRIDES])
    for i, name in enumerate(("p3", "p4", "p5")):
        stats[f"fg_{name}_per_img"] = (
            jnp.sum(fg[:, bounds[i]:bounds[i + 1]]) / n_img
        )

    # DFL representability: true ltrb of the ASSIGNED target at fg cells
    tb = asn["target_boxes"]
    t_xyxy = jnp.concatenate(
        [tb[..., 0:2] - tb[..., 2:4] / 2, tb[..., 0:2] + tb[..., 2:4] / 2],
        axis=-1,
    )
    scale = (img_size / strides)[None, :, None]
    ltrb = jnp.concatenate(
        [anchor_pts[None] - t_xyxy[..., 0:2],
         t_xyxy[..., 2:4] - anchor_pts[None]], axis=-1
    ) * scale
    clipped = jnp.any(ltrb > (REG_MAX - 1), axis=-1).astype(jnp.float32)
    stats["dfl_clip_frac"] = (jnp.sum(clipped * fg)
                              / jnp.maximum(jnp.sum(fg), 1.0))
    return stats


def make_af_stats_fn(model, cfg, topk=TAL_TOPK, alpha=TAL_ALPHA,
                     beta=TAL_BETA):
    """Jitted probe: (params, batch_stats, images, labels, counts) ->
    dict of TAL diagnostic scalars on a compact batch. `images` may be
    uint8 (normalized in-fn) and packed per cfg — the same staging the
    compact trainer uses, so the probe costs one extra forward."""
    from yolo_from_scratch_tpu.config import INV255

    @jax.jit
    def stats_fn(params, batch_stats, images, labels, counts):
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) * INV255
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=False,
        )
        k = labels.shape[1]
        valid = (jnp.arange(k)[None, :] < counts[:, None]).astype(
            jnp.float32)
        cls_ids = jnp.clip(labels[..., 0].astype(jnp.int32), 0,
                           cfg.num_classes - 1)
        gt_cls = jax.nn.one_hot(cls_ids, cfg.num_classes) * valid[..., None]
        return af_assignment_stats(
            preds, labels[..., 1:5], gt_cls, valid, cfg.num_classes,
            cfg.img_size, topk=topk, alpha=alpha, beta=beta,
        )

    return stats_fn
