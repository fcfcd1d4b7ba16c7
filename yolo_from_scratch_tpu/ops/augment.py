"""Device-side training augmentation: random horizontal flip (images AND
dense targets, exactly) + photometric jitter, inside the jitted step.

Why on-device: the scanned trainer (`make_train_step_multi`) runs entire
epochs from pre-staged device arrays, so host-side augmentation
(data/dataset.py `augment_image_and_boxes`, which this mirrors — flip
p=0.5, gain U(0.7, 1.3), bias U(-0.08, 0.08)) never sees those batches;
and even in the streaming `fit` path a 1-core host can starve the chip
when it also has to re-augment + re-assign targets per epoch. Flip +
jitter are elementwise/permutation work the TPU does for ~free inside the
existing program.

The flip is exact in dense-target space: a horizontal image flip maps a
GT at normalized center cx to 1-cx, whose grid cell is gs-1-floor(cx*gs)
(for cx*gs non-integer) — i.e. reverse the grid's x axis and rewrite the
cx channel of occupied cells. Shape-only anchor matching (reference:
train.py:108-131) is flip-invariant, so the (scale, anchor) routing of
every GT is unchanged and no re-assignment is needed.

Randomness is derived from `state.step` via `fold_in`, so augmentation is
deterministic given the seed, varies every step/epoch, and adds no
host->device traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_from_scratch_tpu.models.packed import PACK_FACTOR

FLIP_P = 0.5
GAIN_RANGE = (0.7, 1.3)   # matches data/dataset.py augment_image_and_boxes
BIAS_RANGE = (-0.08, 0.08)


def flip_images_lr(imgs, packed: bool = False, f: int = PACK_FACTOR):
    """Horizontal flip of (..., H, W, C) images. For space-to-depth packed
    inputs (models/packed.py layout: channel (a*f + b)*C + c for pixel
    phase (a, b)), flipping the packed W axis also reverses the column
    phase b within the channel axis."""
    x = imgs[..., :, ::-1, :]
    if not packed:
        return x
    *lead, h, w, cc = x.shape
    c = cc // (f * f)
    x = x.reshape(*lead, h, w, f, f, c)[..., :, ::-1, :]
    return x.reshape(*lead, h, w, cc)


def flip_targets_lr(t, x_axis: int):
    """Flip a dense target map along its grid-x axis and rewrite cx -> 1-cx
    on occupied cells. `x_axis`: -3 for anchor targets (gy, gx, A, 5+nc),
    -2 for anchor-free (gy, gx, 4+1+nc) — channel 4 is the occupancy flag
    in both layouts."""
    t = jnp.flip(t, axis=x_axis)
    cx = jnp.where(t[..., 4:5] > 0, 1.0 - t[..., 0:1], t[..., 0:1])
    return jnp.concatenate([cx, t[..., 1:]], axis=-1)


def augment_batch(key, images, targets, packed: bool = False,
                  anchor_free: bool = False, flip_p: float = FLIP_P,
                  jitter: bool = True):
    """Per-image random hflip + brightness/contrast jitter of a batch.

    Args:
        key: PRNG key (callers fold the train step index in).
        images: (B, H, W, C) float32 in [0, 1] (packed or unpacked layout).
        targets: [t_p3, t_p4, t_p5] dense maps with leading batch dim.

    Returns (images, targets).
    """
    b = images.shape[0]
    kf, kg, kb = jax.random.split(key, 3)
    do_flip = jax.random.bernoulli(kf, flip_p, (b,))
    flipped = flip_images_lr(images, packed)
    images = jnp.where(do_flip[:, None, None, None], flipped, images)
    x_axis = -2 if anchor_free else -3
    out_targets = []
    for t in targets:
        mask = do_flip.reshape((b,) + (1,) * (t.ndim - 1))
        out_targets.append(jnp.where(mask, flip_targets_lr(t, x_axis), t))
    if jitter:
        gain = jax.random.uniform(kg, (b, 1, 1, 1), images.dtype,
                                  *GAIN_RANGE)
        bias = jax.random.uniform(kb, (b, 1, 1, 1), images.dtype,
                                  *BIAS_RANGE)
        images = jnp.clip(images * gain + bias, 0.0, 1.0)
    return images, out_targets


def augment_compact_batch(key, images, labels, valid, packed: bool = False,
                          flip_p: float = FLIP_P, jitter: bool = True):
    """Label-level variant of `augment_batch` for paths that carry
    compact labels instead of dense maps (the anchor-free compact
    trainer, where TAL consumes GT lists directly): per-image random
    hflip (images + cx -> 1-cx on valid rows) + photometric jitter.

    Args:
        images: (B, H, W, C) float32 (packed or unpacked layout).
        labels: (B, K, 5) [class, cx, cy, w, h].
        valid: (B, K) bool row mask.

    Returns (images, labels) — `valid` is flip-invariant.
    """
    b = images.shape[0]
    kf, kg, kb = jax.random.split(key, 3)
    do_flip = jax.random.bernoulli(kf, flip_p, (b,))
    flipped = flip_images_lr(images, packed)
    images = jnp.where(do_flip[:, None, None, None], flipped, images)
    cx = jnp.where(do_flip[:, None] & valid, 1.0 - labels[..., 1],
                   labels[..., 1])
    labels = jnp.concatenate(
        [labels[..., 0:1], cx[..., None], labels[..., 2:]], axis=-1)
    if jitter:
        gain = jax.random.uniform(kg, (b, 1, 1, 1), images.dtype,
                                  *GAIN_RANGE)
        bias = jax.random.uniform(kb, (b, 1, 1, 1), images.dtype,
                                  *BIAS_RANGE)
        images = jnp.clip(images * gain + bias, 0.0, 1.0)
    return images, labels


def make_device_augment(cfg, seed: int = 0, jitter: bool = True):
    """Step-indexed augmentation hook for the train steps:
    aug(step, images, targets) -> (images, targets).

    `jitter=False` = geometric-only (hflip) augmentation — photometric
    jitter is label noise whenever class identity is carried by color
    (measured: config 3's color-coded 80-class regime drops 50.9 -> 28.4
    mAP50 with jitter on, see BASELINE.md)."""
    base = jax.random.PRNGKey(seed)
    packed = bool(getattr(cfg, "packed_stem", False))
    anchor_free = cfg.head_type == "anchor_free"

    def aug(step, images, targets):
        key = jax.random.fold_in(base, step)
        return augment_batch(key, images, targets, packed=packed,
                             anchor_free=anchor_free, jitter=jitter)

    return aug
