"""Box geometry primitives — fully vectorized, jittable.

Replaces the reference's scalar IoU helpers (reference: train.py:928-958
center-format, train.py:1064-1084 corner-format) with broadcasting
implementations that work on arbitrary leading dimensions, so they run on
the VPU instead of in Python loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def center_to_corner(boxes):
    """(..., 4) [cx, cy, w, h] -> [x1, y1, x2, y2]."""
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def corner_to_center(boxes):
    """(..., 4) [x1, y1, x2, y2] -> [cx, cy, w, h]."""
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_iou_corner(a, b, eps=1e-6):
    """Elementwise IoU of corner-format boxes; broadcasts over leading dims."""
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter + eps)


def box_iou_center(a, b, eps=1e-6):
    """Elementwise IoU of center-format boxes (reference: train.py:928-958)."""
    return box_iou_corner(center_to_corner(a), center_to_corner(b), eps=eps)


def pairwise_iou_corner(a, b, eps=1e-6):
    """All-pairs IoU: a (N, 4) x b (M, 4) -> (N, M). Corner format."""
    return box_iou_corner(a[:, None, :], b[None, :, :], eps=eps)


def anchor_iou_wh(box_wh, anchors_wh, eps=1e-16):
    """Shape-only IoU of boxes vs anchors, both centered at the origin
    (reference: train.py:108-131). Broadcasts: box_wh (..., 2) x
    anchors_wh (A, 2) -> (..., A).
    """
    bw, bh = box_wh[..., 0:1], box_wh[..., 1:2]
    aw, ah = anchors_wh[..., 0], anchors_wh[..., 1]
    inter = jnp.minimum(bw, aw) * jnp.minimum(bh, ah)
    union = bw * bh + aw * ah - inter
    return inter / (union + eps)
