"""YOLOv5-style grid decode.

Implements the reference decode formulas (reference: train.py:712-779):

    b_x = ((2*sigmoid(t_x) - 0.5) + c_x) / grid_w
    b_y = ((2*sigmoid(t_y) - 0.5) + c_y) / grid_h
    b_w = (anchor_w / img_size) * (2*sigmoid(t_w))^2
    b_h = (anchor_h / img_size) * (2*sigmoid(t_h))^2

Objectness / class channels pass through unchanged (they stay logits).

TPU notes: the whole decode is elementwise + broadcasted iota, so XLA
fuses it into a single VPU pass over the head output; there is no clone +
in-place-write pattern (the reference's train.py:737 torch idiom) — we
build the output functionally with `concatenate`.

The reference calls this with the default img_size=640 from its loss and
eval paths even when training at other resolutions (reference:
train.py:796, 993 — see SURVEY.md §3.6). We keep `img_size` an explicit
required parameter; the loss layer owns the quirk flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def decode_predictions(raw_preds, anchors, img_size):
    """Decode raw head output to normalized absolute boxes.

    Args:
        raw_preds: (B, H, W, A, 5+nc) raw logits.
        anchors: (A, 2) anchor [w, h] in pixels (at `img_size` scale).
        img_size: image size in pixels used to normalize box dimensions.

    Returns:
        (B, H, W, A, 5+nc) with channels 0:4 replaced by decoded
        [b_x, b_y, b_w, b_h] in normalized [0, 1]-ish range; channels 4:
        are the untouched logits.
    """
    _, h, w, num_anchors, _ = raw_preds.shape
    dtype = raw_preds.dtype

    grid_x = jax.lax.broadcasted_iota(dtype, (1, h, w, 1), 2)
    grid_y = jax.lax.broadcasted_iota(dtype, (1, h, w, 1), 1)

    sxy = jax.nn.sigmoid(raw_preds[..., 0:2])
    bx = ((sxy[..., 0] * 2.0 - 0.5) + grid_x) / w
    by = ((sxy[..., 1] * 2.0 - 0.5) + grid_y) / h

    anchors = jnp.asarray(anchors, dtype=dtype).reshape(1, 1, 1, num_anchors, 2)
    swh = jax.nn.sigmoid(raw_preds[..., 2:4])
    bw = (anchors[..., 0] / img_size) * jnp.square(2.0 * swh[..., 0])
    bh = (anchors[..., 1] / img_size) * jnp.square(2.0 * swh[..., 1])

    boxes = jnp.stack([bx, by, bw, bh], axis=-1)
    return jnp.concatenate([boxes, raw_preds[..., 4:]], axis=-1)
