"""Letterbox preprocessing: aspect-preserving resize + gray pad to square.

Host path uses PIL bilinear (bit-compatible with the reference,
train.py:15-58) for inference parity; `letterbox_device` is the jittable
on-device variant (jax.image.resize + pad) used by the high-throughput
input queue where host decode would starve the TPU.
"""

from __future__ import annotations

import numpy as np

PAD_COLOR = (114, 114, 114)


def letterbox_params(orig_w: int, orig_h: int, target_size: int):
    """Scale and padding used by the letterbox transform
    (reference: train.py:36-53)."""
    scale = min(target_size / orig_w, target_size / orig_h)
    # clamp to >=1px so extreme aspect ratios can't produce a zero-size
    # resample (the reference would crash in PIL resize there)
    new_w = max(1, int(orig_w * scale))
    new_h = max(1, int(orig_h * scale))
    pad_left = (target_size - new_w) // 2
    pad_top = (target_size - new_h) // 2
    return scale, pad_top, pad_left, new_w, new_h


def letterbox_image(pil_img, target_size: int = 640, pad_color=PAD_COLOR):
    """PIL letterbox. Returns (np.uint8 HWC image, scale, pad_top, pad_left)."""
    from PIL import Image

    orig_w, orig_h = pil_img.size
    scale, pad_top, pad_left, new_w, new_h = letterbox_params(
        orig_w, orig_h, target_size
    )
    resample = Image.Resampling.BILINEAR if hasattr(Image, "Resampling") else 2
    resized = pil_img.resize((new_w, new_h), resample)
    canvas = Image.new("RGB", (target_size, target_size), pad_color)
    canvas.paste(resized, (pad_left, pad_top))
    return np.asarray(canvas, dtype=np.uint8), scale, pad_top, pad_left


def letterbox_device(img, orig_w: int, orig_h: int, target_size: int):
    """On-device letterbox for a single HWC uint8/float image.

    `img` may be a fixed-shape staging buffer LARGER than the actual
    content; `orig_w`/`orig_h` (static Python ints — one trace per source
    geometry) give the real content dims in its top-left corner. Static
    output shape (target_size, target_size, 3) float32 in [0, 1]; same
    floor-int scale/pad math as the host letterbox, jax.image bilinear
    resampling.
    """
    import jax
    import jax.numpy as jnp

    orig_w, orig_h = int(orig_w), int(orig_h)
    if orig_h > img.shape[0] or orig_w > img.shape[1]:
        raise ValueError(
            f"content dims ({orig_h}, {orig_w}) exceed buffer {img.shape[:2]}"
        )
    scale, pad_top, pad_left, new_w, new_h = letterbox_params(
        orig_w, orig_h, target_size
    )
    x = img[:orig_h, :orig_w].astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (new_h, new_w, 3), method="bilinear")
    pad_val = jnp.asarray([c / 255.0 for c in PAD_COLOR], jnp.float32)
    canvas = jnp.broadcast_to(pad_val, (target_size, target_size, 3))
    return jax.lax.dynamic_update_slice(canvas, x, (pad_top, pad_left, 0))


def adjust_boxes_for_letterbox(boxes, orig_w, orig_h, scale, pad_top, pad_left,
                               target_size):
    """Map normalized YOLO boxes from original-image coords to letterboxed
    coords (reference: train.py:156-162). boxes: (N, 4) [cx, cy, w, h]."""
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4).copy()
    boxes[:, 0] = (boxes[:, 0] * orig_w * scale + pad_left) / target_size
    boxes[:, 1] = (boxes[:, 1] * orig_h * scale + pad_top) / target_size
    boxes[:, 2] = boxes[:, 2] * orig_w * scale / target_size
    boxes[:, 3] = boxes[:, 3] * orig_h * scale / target_size
    return boxes
