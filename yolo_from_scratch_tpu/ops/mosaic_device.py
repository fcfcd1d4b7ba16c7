"""Device-side 4-image mosaic over compact labels, inside the jitted step.

The host mosaic (data/dataset.py `mosaic_4`, mirroring YOLOv5) needs
sibling samples and OpenCV resizes, so the compact/pre-staged paths
(data/assign_device.py) deliberately exclude it. This module restores
mosaic for those paths ON the TPU: partners are drawn from the in-flight
batch, images compose with a 2x mean-pool downscale + quadrant
concatenation, and the compact labels transform with pure vector math —
zero host work, recompiled never (static shapes).

TPU-idiomatic divergence from the host version: the mosaic center is
FIXED at 0.5 (four equal quadrants) instead of U(0.3, 0.7). A random
center would need dynamic-shape resizes per image — the exact thing XLA
cannot tile (per-quadrant `jax.image.resize` to a traced size retraces
or pads). The scale diversity the random center provides is instead
already covered by `--multi-scale` bucket rotation; what mosaic is FOR
(multi-image context, more objects/step, small-object pressure at 0.5x
scale) survives intact. Partner sampling uses replacement (3 uniform
draws/image vs the host's choice-without-replacement) — a partner
collision merely repeats a quadrant source, harmless as augmentation.

The degenerate-box filter matches the host rule: boxes whose scaled w or
h drops below `min_box` (~2 px at the training resolution) are dropped
(dataset.py mosaic_4's keep mask).

Composition order mirrors the host `__getitem__`: mosaic (p=0.5) first,
then hflip/photometric jitter (ops/augment.py) on the composed result —
in-step the latter operates on the dense maps AFTER on-device
assignment, which is exactly the host's mosaic -> flip -> assign order
because flip commutes with assignment (shape-only anchor match is
flip-invariant; see ops/augment.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_from_scratch_tpu.models.packed import (
    PACK_FACTOR,
    pack_s2d,
    unpack_s2d,
)

MOSAIC_P = 0.5  # matches the host path (dataset.py __getitem__)


def _down2(x):
    """2x mean-pool downscale of (B, S, S, C) images — the fixed-center
    mosaic's per-quadrant resize."""
    b, s, _, c = x.shape
    return x.reshape(b, s // 2, 2, s // 2, 2, c).mean(axis=(2, 4))


def mosaic_compact_batch(key, images, labels, counts, min_box,
                         p: float = MOSAIC_P, packed: bool = False,
                         f: int = PACK_FACTOR):
    """Per-image random 4-mosaic of a batch with compact labels.

    Args:
        key: PRNG key (callers fold the step index in).
        images: (B, S, S, 3) float32 in [0, 1], or the space-to-depth
            packed layout when `packed` (composed in pixel domain via
            unpack/repack — reshapes XLA fuses away).
        labels: (B, K, 5) float32 [class, cx, cy, w, h].
        counts: (B,) int32 valid-row counts.
        min_box: degenerate-box floor on scaled w/h (use 2/img_size).
        p: per-image mosaic probability.

    Returns (images, labels (B, 4K, 5), valid (B, 4K) bool) — labels now
    carry an explicit validity MASK (mosaic interleaves the four sources'
    padding), consumed by `assign_targets_device_masked`.
    """
    b, k = labels.shape[0], labels.shape[1]
    kp, ki = jax.random.split(key)
    do = jax.random.bernoulli(kp, p, (b,))
    idx = jax.random.randint(ki, (3, b), 0, b)

    px = unpack_s2d(images, f) if packed else images
    down = _down2(px)
    quads = [down, down[idx[0]], down[idx[1]], down[idx[2]]]
    canvas = jnp.concatenate(
        [jnp.concatenate([quads[0], quads[1]], axis=2),
         jnp.concatenate([quads[2], quads[3]], axis=2)], axis=1)
    if packed:
        canvas = pack_s2d(canvas, f)
    images_out = jnp.where(do[:, None, None, None], canvas, images)

    ar = jnp.arange(k)
    offsets = [(0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (0.5, 0.5)]
    src_labels = [labels, labels[idx[0]], labels[idx[1]], labels[idx[2]]]
    src_counts = [counts, counts[idx[0]], counts[idx[1]], counts[idx[2]]]
    labs, valids = [], []
    for (ox, oy), lab, cnt in zip(offsets, src_labels, src_counts):
        w = lab[..., 3] * 0.5
        h = lab[..., 4] * 0.5
        labs.append(jnp.stack(
            [lab[..., 0], lab[..., 1] * 0.5 + ox, lab[..., 2] * 0.5 + oy,
             w, h], axis=-1))
        valids.append((ar[None, :] < cnt[:, None])
                      & (w >= min_box) & (h >= min_box))
    m_labels = jnp.concatenate(labs, axis=1)
    m_valid = jnp.concatenate(valids, axis=1)

    # non-mosaic images keep their original labels in the first K rows
    base_labels = jnp.pad(labels, ((0, 0), (0, 3 * k), (0, 0)))
    base_valid = jnp.pad(ar[None, :] < counts[:, None],
                         ((0, 0), (0, 3 * k)))
    labels_out = jnp.where(do[:, None, None], m_labels, base_labels)
    valid_out = jnp.where(do[:, None], m_valid, base_valid)
    return images_out, labels_out, valid_out
