"""Device-side augmentation (ops/augment.py): the dense-target flip must
be EXACTLY what re-assigning flipped labels would produce, the packed-
layout flip must match flip-then-pack, and the train steps must accept
the device_augment hook."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.data.dataset import assign_targets
from yolo_from_scratch_tpu.models.anchor_free import (
    assign_targets_anchor_free,
)
from yolo_from_scratch_tpu.models.packed import pack_s2d_host
from yolo_from_scratch_tpu.ops.augment import (
    augment_batch,
    flip_images_lr,
    flip_targets_lr,
)


def _random_boxes(rng, n, img_size, gs_max):
    """Random normalized cxcywh boxes whose centers avoid exact grid-cell
    boundaries at every scale (the flip identity holds off boundaries;
    boundaries are measure-zero for real data)."""
    cells = rng.integers(1, gs_max - 1, size=(n, 2))
    centers = (cells + rng.uniform(0.2, 0.8, size=(n, 2))) / gs_max
    wh = rng.uniform(0.05, 0.4, size=(n, 2))
    return np.concatenate([centers, wh], axis=1).astype(np.float32)


def test_flip_targets_matches_reassignment_anchor():
    cfg = YoloConfig(num_classes=3, img_size=128)
    rng = np.random.default_rng(0)
    boxes = _random_boxes(rng, 12, cfg.img_size, cfg.grid_sizes[0])
    classes = rng.integers(0, 3, size=12)

    t = assign_targets(boxes, classes, cfg.anchors_array, cfg.img_size, 3)

    flipped = boxes.copy()
    flipped[:, 0] = 1.0 - flipped[:, 0]
    t_ref = assign_targets(flipped, classes, cfg.anchors_array,
                           cfg.img_size, 3)

    for a, b in zip(t, t_ref):
        got = np.asarray(flip_targets_lr(jnp.asarray(a), x_axis=-3))
        np.testing.assert_allclose(got, b, atol=1e-6)


def test_flip_targets_matches_reassignment_anchor_free():
    rng = np.random.default_rng(1)
    img_size = 128
    boxes = _random_boxes(rng, 10, img_size, img_size // 8)
    classes = rng.integers(0, 5, size=10)

    t = assign_targets_anchor_free(boxes, classes, img_size, 5)
    flipped = boxes.copy()
    flipped[:, 0] = 1.0 - flipped[:, 0]
    t_ref = assign_targets_anchor_free(flipped, classes, img_size, 5)

    for a, b in zip(t, t_ref):
        got = np.asarray(flip_targets_lr(jnp.asarray(a), x_axis=-2))
        np.testing.assert_allclose(got, b, atol=1e-6)


def test_flip_packed_matches_flip_then_pack():
    rng = np.random.default_rng(2)
    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    flipped_then_packed = pack_s2d_host(img[:, :, ::-1])
    packed_then_flipped = np.asarray(
        flip_images_lr(jnp.asarray(pack_s2d_host(img)), packed=True)
    )
    np.testing.assert_array_equal(flipped_then_packed, packed_then_flipped)


def test_flip_unpacked_is_plain_reverse():
    rng = np.random.default_rng(3)
    img = rng.random((2, 8, 8, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(flip_images_lr(jnp.asarray(img))), img[:, :, ::-1]
    )


def test_augment_batch_double_flip_is_identity():
    """flip_p=1, jitter off: augmenting twice restores the input exactly."""
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    t = np.zeros((2, 2, 2, 3, 6), np.float32)
    t[0, 1, 0, 1] = [0.2, 0.6, 0.1, 0.1, 1.0, 1.0]
    tgts = [jnp.asarray(t)] * 3

    key = jax.random.PRNGKey(0)
    once_i, once_t = augment_batch(key, imgs, tgts, flip_p=1.0, jitter=False)
    twice_i, twice_t = augment_batch(key, once_i, once_t, flip_p=1.0,
                                     jitter=False)
    np.testing.assert_allclose(np.asarray(twice_i), np.asarray(imgs))
    for a, b in zip(twice_t, tgts):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # and the single flip really moved the occupied cell + cx
    got = np.asarray(once_t[0])
    assert got[0, 1, 1, 1, 4] == 1.0
    assert got[0, 1, 1, 1, 0] == pytest.approx(0.8)


def test_augment_batch_noop_when_disabled():
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    tgts = [jnp.asarray(np.zeros((2, 2, 2, 3, 6), np.float32))] * 3
    out_i, out_t = augment_batch(jax.random.PRNGKey(0), imgs, tgts,
                                 flip_p=0.0, jitter=False)
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(imgs))


def test_augment_batch_jitter_stays_in_range():
    rng = np.random.default_rng(6)
    imgs = jnp.asarray(rng.random((4, 16, 16, 3)).astype(np.float32))
    tgts = [jnp.asarray(np.zeros((4, 2, 2, 3, 6), np.float32))] * 3
    out_i, _ = jax.jit(
        lambda k, i, t: augment_batch(k, i, t)
    )(jax.random.PRNGKey(1), imgs, tgts)
    out = np.asarray(out_i)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # per-image gains differ (not one global jitter)
    ratios = [out[b].mean() / np.asarray(imgs)[b].mean() for b in range(4)]
    assert np.std(ratios) > 1e-3


def test_train_step_with_device_augment(cfg, shared_train_setup):
    """The step builder wires the hook: loss finite, params update, and the
    augmentation actually varies with state.step (different loss than the
    un-augmented step on the same batch)."""
    from yolo_from_scratch_tpu.train.steps import make_train_step

    model, tx, state0, plain_step = shared_train_setup
    aug_step = make_train_step(model, tx, cfg, donate=False,
                               device_augment=True)

    rng = np.random.default_rng(7)
    images = jnp.asarray(
        rng.random((2, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    )
    tgts = [np.zeros((2, g, g, 3, 6), np.float32) for g in cfg.grid_sizes]
    tgts[0][:, 4, 4, 0] = [0.28, 0.28, 0.1, 0.1, 1.0, 1.0]
    tgts = [jnp.asarray(t) for t in tgts]

    state1, m1 = aug_step(state0, images, tgts)
    assert np.isfinite(float(m1["loss"]))
    _, m_plain = plain_step(state0, images, tgts)
    # photometric jitter guarantees the augmented batch differs
    assert float(m1["loss"]) != pytest.approx(float(m_plain["loss"]),
                                              rel=1e-6)


def test_flip_only_mode_preserves_pixel_values():
    """jitter=False ('flip' mode): every output image is exactly the
    original or its mirror — no photometric change (the mode exists
    because jitter is label noise on color-coded class regimes)."""
    from yolo_from_scratch_tpu.ops.augment import augment_batch

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((4, 16, 16, 3), np.float32))
    t = jnp.zeros((4, 2, 2, 3, 6), jnp.float32)
    out, _ = augment_batch(jax.random.PRNGKey(1), imgs, [t, t, t],
                           jitter=False)
    for i in range(4):
        o, a = np.asarray(out[i]), np.asarray(imgs[i])
        assert (o == a).all() or (o == a[:, ::-1, :]).all()


def test_make_device_augment_flip_mode():
    from yolo_from_scratch_tpu.ops.augment import make_device_augment

    cfg = YoloConfig(num_classes=1, img_size=64, width_mult=0.25)
    aug = make_device_augment(cfg, seed=0, jitter=False)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    t3 = jnp.zeros((2, 8, 8, 3, 6), jnp.float32)
    t4 = jnp.zeros((2, 4, 4, 3, 6), jnp.float32)
    t5 = jnp.zeros((2, 2, 2, 3, 6), jnp.float32)
    out, _ = aug(7, imgs, [t3, t4, t5])
    for i in range(2):
        o, a = np.asarray(out[i]), np.asarray(imgs[i])
        assert (o == a).all() or (o == a[:, ::-1, :]).all()
