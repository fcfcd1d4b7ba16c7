"""Anchor-free decoupled detection head (YOLOv8-style) — the stretch
config in BASELINE.json ("anchor-free decoupled head (new — stretch the
detection-head + NMS API YOLOv8-style)"). Not present in the reference;
this extends the framework's detect API with a second head family behind
the same model/loss/NMS plumbing.

Design (simplified v8):
- decoupled branches per scale: a box branch (2x ConvBNSiLU + 1x1 -> 4)
  regressing (l, t, r, b) edge distances in stride units via softplus, and
  a class branch (2x ConvBNSiLU + 1x1 -> nc) with objectness folded into
  the class scores (prior-initialized bias);
- one prediction per cell (no anchors); decode maps cell centers + ltrb
  to normalized center-format boxes, reusing the same NMS kernels;
- assignment: a GT lands in the cell containing its center at the scale
  chosen by its size (simplified center assigner, not TAL).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_from_scratch_tpu.models.blocks import ConvBNSiLU, torch_kernel_init


class DecoupledHead(nn.Module):
    """Box + class branches -> (B, H, W, 4 + nc)."""

    channels: int
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        box = ConvBNSiLU(self.channels, 3, dtype=self.dtype, name="box_conv1")(
            x, train
        )
        box = ConvBNSiLU(self.channels, 3, dtype=self.dtype, name="box_conv2")(
            box, train
        )
        from yolo_from_scratch_tpu.models.blocks import torch_bias_init_for

        box = nn.Conv(4, (1, 1), use_bias=True, dtype=self.dtype,
                      param_dtype=jnp.float32, kernel_init=torch_kernel_init,
                      bias_init=torch_bias_init_for(box.shape[-1]),
                      name="box_pred")(box)

        cls = ConvBNSiLU(self.channels, 3, dtype=self.dtype, name="cls_conv1")(
            x, train
        )
        cls = ConvBNSiLU(self.channels, 3, dtype=self.dtype, name="cls_conv2")(
            cls, train
        )
        cls = nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=torch_kernel_init,
            bias_init=_cls_prior_bias, name="cls_pred",
        )(cls)
        return jnp.concatenate([box, cls], axis=-1)


def _cls_prior_bias(key, shape, dtype=jnp.float32, prior=0.01):
    """Class-score bias so initial sigmoid(cls) ~ prior (objectness is
    folded into the class scores in the anchor-free head)."""
    import math

    return jnp.full(shape, -math.log((1 - prior) / prior), dtype)


def decode_anchor_free(raw, stride, img_size):
    """Decode (B, H, W, 4+nc) raw head output to normalized center-format
    boxes + passthrough class logits.

    ltrb = softplus(raw[..., :4]) in stride units; the box spans
    [center - (l, t), center + (r, b)] in pixels.
    """
    _, h, w, _ = raw.shape
    dtype = raw.dtype
    ltrb = jax.nn.softplus(raw[..., 0:4]) * (stride / img_size)
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
    return jnp.concatenate([boxes, raw[..., 4:]], axis=-1)


# size thresholds (fraction of image) routing a GT to P3/P4/P5 in the
# simplified center assigner
AF_SCALE_THRESHOLDS = (0.1, 0.25)


def assign_targets_anchor_free(boxes: np.ndarray, class_ids: np.ndarray,
                               img_size: int, num_classes: int):
    """Dense anchor-free targets: [(gs, gs, 4 + 1 + nc)] x3.

    Channel layout: 0:4 box (normalized cx, cy, w, h), 4 assigned flag,
    5: one-hot class. A GT goes to the single cell containing its center
    at the scale picked by max(w, h): <=10% of image -> P3, <=25% -> P4,
    else P5. First GT wins an occupied cell.
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
        gx = min(int(boxes[n, 0] * gs), gs - 1)
        gy = min(int(boxes[n, 1] * gs), gs - 1)
        t = targets[s]
        if t[gy, gx, 4] == 0:
            t[gy, gx, 0:4] = boxes[n]
            t[gy, gx, 4] = 1.0
            t[gy, gx, 5 + int(class_ids[n])] = 1.0
    return targets


def yolo_loss_anchor_free(predictions, targets, num_classes, img_size,
                          box_weight=5.0, cls_weight=0.5):
    """Multi-scale anchor-free loss: masked CIoU on assigned cells + BCE
    class scores over ALL cells (objectness folded into cls, zeros at
    unassigned cells). Returns (total, bbox, cls)."""
    import optax

    from yolo_from_scratch_tpu.config import STRIDES
    from yolo_from_scratch_tpu.ops.ciou import ciou_loss

    total = bbox_t = cls_t = 0.0
    for pred, tgt, stride in zip(predictions, targets, STRIDES):
        decoded = decode_anchor_free(pred, stride, img_size)
        assigned = tgt[..., 4] > 0.5
        bbox = ciou_loss(decoded[..., 0:4], tgt[..., 0:4], mask=assigned)
        cls_target = tgt[..., 5:] * tgt[..., 4:5]
        cls = jnp.mean(
            optax.sigmoid_binary_cross_entropy(pred[..., 4:], cls_target)
        )
        total = total + box_weight * bbox + cls_weight * cls
        bbox_t = bbox_t + bbox
        cls_t = cls_t + cls
    return total, bbox_t, cls_t
