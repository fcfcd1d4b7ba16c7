"""Complete-IoU loss, elementwise and mask-friendly.

Matches the reference formulation (reference: train.py:634-710): CIoU =
IoU - center_dist/enclose_diag - alpha*v, with alpha treated as a constant
w.r.t. gradients (the reference computes it under torch.no_grad,
train.py:701-702; here `lax.stop_gradient`).

Unlike the reference (which boolean-masks boxes into an (N, 4) tensor —
dynamic shape, hostile to XLA), `ciou` is elementwise over arbitrary
leading dims so the loss layer can compute it densely over every cell and
take a masked mean — numerically identical, statically shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ciou(pred_boxes, target_boxes, eps=1e-7):
    """Elementwise CIoU for center-format boxes. (..., 4) -> (...)."""
    px, py, pw, ph = (pred_boxes[..., i] for i in range(4))
    tx, ty, tw, th = (target_boxes[..., i] for i in range(4))

    px1, py1, px2, py2 = px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2
    tx1, ty1, tx2, ty2 = tx - tw / 2, ty - th / 2, tx + tw / 2, ty + th / 2

    inter_w = jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), 0)
    inter_h = jnp.clip(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1), 0)
    inter = inter_w * inter_h
    union = pw * ph + tw * th - inter
    iou = inter / (union + eps)

    center_dist = jnp.square(px - tx) + jnp.square(py - ty)
    enc_w = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    enc_h = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1)
    enclose_diag = jnp.square(enc_w) + jnp.square(enc_h) + eps
    distance_penalty = center_dist / enclose_diag

    v = (4.0 / (jnp.pi**2)) * jnp.square(
        jnp.arctan(pw / (ph + eps)) - jnp.arctan(tw / (th + eps))
    )
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + eps))

    return iou - distance_penalty - alpha * v


def ciou_loss(pred_boxes, target_boxes, mask=None, eps=1e-7):
    """Mean (1 - CIoU), optionally over a boolean/float mask.

    With `mask=None` this is exactly the reference `ciou_loss` mean
    (reference: train.py:710). With a mask it equals the reference's
    boolean-masked mean (sum over masked cells / count, count >= 1) without
    any dynamic shapes.
    """
    loss = 1.0 - ciou(pred_boxes, target_boxes, eps=eps)
    if mask is None:
        return jnp.mean(loss)
    mask = mask.astype(loss.dtype)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(loss * mask) / count
