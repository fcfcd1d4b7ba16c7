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


def bucket_shape(h: int, w: int, multiple: int = 256, min_side: int = 256):
    """Static staging-buffer shape for an (h, w) image: each side rounded
    up to `multiple`. Bounded bucket count -> bounded jit trace count,
    regardless of how many distinct source geometries a dataset has."""
    bh = max(min_side, ((h + multiple - 1) // multiple) * multiple)
    bw = max(min_side, ((w + multiple - 1) // multiple) * multiple)
    return bh, bw


def stage_to_bucket(arr: np.ndarray, bucket) -> np.ndarray:
    """Copy an HWC uint8 image into the top-left of a zeroed bucket buffer
    (the zeros are excluded from resampling by the device letterbox's
    weight renormalization)."""
    bh, bw = bucket
    h, w = arr.shape[:2]
    if h > bh or w > bw:
        raise ValueError(f"image ({h}, {w}) exceeds bucket ({bh}, {bw})")
    buf = np.zeros((bh, bw, 3), np.uint8)
    buf[:h, :w] = arr
    return buf


def letterbox_geometry(orig_w: int, orig_h: int, target_size: int):
    """Host-computed geometry row for `letterbox_device_bucketed`:
    [h, w, new_h, new_w, pad_top, pad_left] (float64 floor-int math —
    identical to the host letterbox, so the two paths can never disagree
    on coordinates)."""
    scale, pad_top, pad_left, new_w, new_h = letterbox_params(
        orig_w, orig_h, target_size
    )
    return (
        np.asarray(
            [orig_h, orig_w, new_h, new_w, pad_top, pad_left], np.float32
        ),
        scale, pad_top, pad_left,
    )


def letterbox_device_bucketed(bufs, geoms, target_size: int):
    """Batched on-device letterbox over a fixed-shape staging bucket with
    TRACED per-image geometry — one compiled program per bucket shape, not
    per source image size (the retrace-per-geometry problem of
    `letterbox_device`).

    Args:
        bufs: (B, Hb, Wb, 3) uint8 staging buffers, content in the
            top-left, zeros elsewhere (`stage_to_bucket`).
        geoms: (B, 6) float32 [h, w, new_h, new_w, pad_top, pad_left]
            rows from `letterbox_geometry`.
        target_size: static output side.

    Returns (B, target, target, 3) float32 in [0, 1].

    Resampling is `jax.image.scale_and_translate` (static output shape,
    traced scale/translation — it lowers to two dense weight matmuls, so
    the resize itself runs on the MXU) with antialias, matching PIL's
    antialiased BILINEAR within ~1 uint8 LSB; dividing by the resampled
    content-mask renormalizes edge kernels exactly as PIL clips them.
    """
    import jax
    import jax.numpy as jnp

    bh, bw = bufs.shape[1:3]
    pad_val = jnp.asarray([c / 255.0 for c in PAD_COLOR], jnp.float32)

    def one(buf, geom):
        h, w, new_h, new_w, pad_top, pad_left = (geom[i] for i in range(6))
        rows = jax.lax.broadcasted_iota(jnp.float32, (bh, bw, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (bh, bw, 1), 1)
        mask = ((rows < h) & (cols < w)).astype(jnp.float32)
        x = buf.astype(jnp.float32) / 255.0
        scale_vec = jnp.stack([new_h / h, new_w / w, jnp.float32(1.0)])
        trans_vec = jnp.stack([pad_top, pad_left, jnp.float32(0.0)])
        num = jax.image.scale_and_translate(
            x, (target_size, target_size, 3), (0, 1, 2), scale_vec,
            trans_vec, method="linear", antialias=True,
        )
        den = jax.image.scale_and_translate(
            mask, (target_size, target_size, 1), (0, 1, 2), scale_vec,
            trans_vec, method="linear", antialias=True,
        )
        content = num / jnp.maximum(den, 1e-6)
        return jnp.where(den > 0.5, content, pad_val)

    return jax.vmap(one)(bufs, geoms)


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
