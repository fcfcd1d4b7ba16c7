"""Device-side mosaic (ops/mosaic_device.py) over compact labels.

The host mosaic (data/dataset.py mosaic_4) is the semantic model; the
device version fixes the center at 0.5 (static shapes) but must keep the
same label algebra: quadrant offset + 0.5 scale, degenerate-box filter
at ~2 px, p-gated identity, and exact composition with the packed-stem
layout and the masked on-device assignment.
"""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.data.assign_device import (
    assign_targets_device,
    assign_targets_device_masked,
    assign_targets_device_masked_batch,
    pack_labels,
)
from yolo_from_scratch_tpu.ops.mosaic_device import (
    _down2,
    mosaic_compact_batch,
)


def _batch(rng, b=4, s=64, k=8, n=3, nc=3):
    images = rng.random((b, s, s, 3)).astype(np.float32)
    boxes = [
        np.stack([
            rng.uniform(0.2, 0.8, n), rng.uniform(0.2, 0.8, n),
            rng.uniform(0.1, 0.4, n), rng.uniform(0.1, 0.4, n),
        ], axis=1).astype(np.float32)
        for _ in range(b)
    ]
    cls = [rng.integers(0, nc, n) for _ in range(b)]
    labels, counts = pack_labels(boxes, cls, k)
    return images, labels, counts


def test_masked_assignment_matches_count_on_prefix():
    """A prefix mask reproduces the count-based assignment exactly."""
    cfg = YoloConfig(num_classes=3, img_size=128)
    rng = np.random.default_rng(0)
    _, labels, counts = _batch(rng, b=1, k=8)
    a = assign_targets_device(
        jnp.asarray(labels[0]), jnp.asarray(counts[0]), cfg.anchors_array,
        cfg.img_size, cfg.num_classes)
    mask = np.arange(8) < counts[0]
    b = assign_targets_device_masked(
        jnp.asarray(labels[0]), jnp.asarray(mask), cfg.anchors_array,
        cfg.img_size, cfg.num_classes)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_masked_assignment_skips_masked_rows():
    """Holes in the mask (mosaic-style interleaved padding) are ignored;
    the result equals assigning only the surviving rows."""
    cfg = YoloConfig(num_classes=2, img_size=128)
    rng = np.random.default_rng(1)
    _, labels, _ = _batch(rng, b=1, k=8, n=8, nc=2)
    mask = np.array([1, 0, 1, 0, 0, 1, 0, 0], bool)
    a = assign_targets_device_masked(
        jnp.asarray(labels[0]), jnp.asarray(mask), cfg.anchors_array,
        cfg.img_size, cfg.num_classes)
    kept = labels[0][mask]
    packed, counts = pack_labels([kept[:, 1:5]], [kept[:, 0]], 8)
    b = assign_targets_device(
        jnp.asarray(packed[0]), jnp.asarray(counts[0]), cfg.anchors_array,
        cfg.img_size, cfg.num_classes)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _forced_mosaic(key, images, labels, counts, min_box=2.0 / 64,
                   packed=False):
    return mosaic_compact_batch(jax.random.PRNGKey(key), images,
                                jnp.asarray(labels), jnp.asarray(counts),
                                min_box, p=1.0, packed=packed)


def test_mosaic_geometry_and_labels():
    rng = np.random.default_rng(2)
    images, labels, counts = _batch(rng)
    imgs_m, labs_m, valid_m = jax.device_get(
        _forced_mosaic(0, jnp.asarray(images), labels, counts))
    b, s = images.shape[0], images.shape[1]
    k = labels.shape[1]
    # top-left quadrant is the image's own 2x downscale
    own_down = np.asarray(_down2(jnp.asarray(images)))
    np.testing.assert_allclose(imgs_m[:, : s // 2, : s // 2], own_down,
                               atol=1e-6)
    # own labels land in rows [0, K) scaled 0.5 toward the top-left
    for i in range(b):
        n = counts[i]
        np.testing.assert_allclose(labs_m[i, :n, 1:3],
                                   labels[i, :n, 1:3] * 0.5, atol=1e-7)
        np.testing.assert_allclose(labs_m[i, :n, 3:5],
                                   labels[i, :n, 3:5] * 0.5, atol=1e-7)
        np.testing.assert_array_equal(labs_m[i, :n, 0], labels[i, :n, 0])
        # quadrant offsets: rows [K,2K) shift cx by +0.5, [2K,3K) cy,
        # [3K,4K) both — spot-check via the valid rows' coordinate range
        for q, (ox, oy) in enumerate([(0, 0), (0.5, 0), (0, 0.5),
                                      (0.5, 0.5)]):
            rows = labs_m[i, q * k : (q + 1) * k][valid_m[i, q * k :
                                                          (q + 1) * k]]
            if len(rows):
                assert (rows[:, 1] >= ox).all() and \
                    (rows[:, 1] <= ox + 0.5).all()
                assert (rows[:, 2] >= oy).all() and \
                    (rows[:, 2] <= oy + 0.5).all()


def test_mosaic_degenerate_box_filter():
    """Boxes whose halved w/h drop below min_box are masked out."""
    images = np.zeros((2, 64, 64, 3), np.float32)
    boxes = [np.array([[0.5, 0.5, 0.05, 0.5],   # w*0.5=0.025 < 0.03
                       [0.5, 0.5, 0.5, 0.5]], np.float32)] * 2
    cls = [np.array([0, 0])] * 2
    labels, counts = pack_labels(boxes, cls, 4)
    _, labs_m, valid_m = jax.device_get(
        _forced_mosaic(0, jnp.asarray(images), labels, counts,
                       min_box=0.03))
    v = valid_m.reshape(2, 4, 4)  # (B, quadrant, K)
    assert not v[:, :, 0].any()   # thin box dropped in every quadrant
    assert v[:, :, 1].all()       # fat box survives everywhere


def test_mosaic_p_zero_is_identity():
    rng = np.random.default_rng(3)
    images, labels, counts = _batch(rng)
    imgs_m, labs_m, valid_m = jax.device_get(mosaic_compact_batch(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(labels),
        jnp.asarray(counts), 2.0 / 64, p=0.0))
    k = labels.shape[1]
    np.testing.assert_array_equal(imgs_m, images)
    np.testing.assert_array_equal(labs_m[:, :k], labels)
    assert not valid_m[:, k:].any()
    np.testing.assert_array_equal(
        valid_m[:, :k], np.arange(k)[None] < counts[:, None])


def test_mosaic_packed_matches_unpacked():
    """Mosaic on the space-to-depth packed layout == pack(mosaic on the
    pixel layout)."""
    from yolo_from_scratch_tpu.models.packed import pack_s2d_host

    rng = np.random.default_rng(4)
    images, labels, counts = _batch(rng, s=64)
    imgs_u, labs_u, valid_u = jax.device_get(
        _forced_mosaic(7, jnp.asarray(images), labels, counts))
    imgs_p, labs_p, valid_p = jax.device_get(
        _forced_mosaic(7, jnp.asarray(pack_s2d_host(images)), labels,
                       counts, packed=True))
    np.testing.assert_allclose(imgs_p, pack_s2d_host(imgs_u), atol=1e-6)
    np.testing.assert_array_equal(labs_p, labs_u)
    np.testing.assert_array_equal(valid_p, valid_u)


def test_unpack_s2d_roundtrip():
    from yolo_from_scratch_tpu.models.packed import (
        pack_s2d_host,
        unpack_s2d,
    )

    rng = np.random.default_rng(5)
    x = rng.random((2, 16, 16, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(unpack_s2d(jnp.asarray(pack_s2d_host(x)))), x)


def test_mosaic_train_step_runs():
    """make_train_step(device_mosaic=True) compiles and produces a finite
    loss on compact inputs (uint8 images)."""
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_train_step,
        set_learning_rate,
    )

    cfg = YoloConfig(num_classes=2, img_size=128, width_mult=0.25,
                     depth_mult=0.33)
    rng = np.random.default_rng(6)
    imgs_u8 = rng.integers(0, 256, (4, 128, 128, 3)).astype(np.uint8)
    boxes = [np.array([[0.5, 0.5, 0.3, 0.3]], np.float32)] * 4
    cls = [np.array([1])] * 4
    labels, counts = pack_labels(boxes, cls, 8)

    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3,
                                          batch_size=1)
    state = set_learning_rate(state, 1e-3)
    step = make_train_step(model, tx, cfg, donate=False,
                           compact_targets=True, device_mosaic=True,
                           device_augment="flip")
    _, metrics = step(state, jnp.asarray(imgs_u8),
                      (jnp.asarray(labels), jnp.asarray(counts)))
    assert np.isfinite(float(metrics["loss"]))


def test_label_flip_commutes_with_assignment():
    """The af-compact augmentation path flips LABELS (ops/augment.
    augment_compact_batch) while the anchor paths flip DENSE maps
    (flip_targets_lr). Both must be the same transform: assigning flipped
    labels == flipping the assigned maps (shape-only anchor matching is
    flip-invariant, so routing cannot change)."""
    from yolo_from_scratch_tpu.ops.augment import flip_targets_lr

    cfg = YoloConfig(num_classes=3, img_size=128)
    rng = np.random.default_rng(7)
    _, labels, counts = _batch(rng, b=1, k=8, nc=3)
    lab = labels[0].copy()
    n = counts[0]
    # avoid centers whose cx*gs is integral: 1-cx then lands on a cell
    # boundary where truncation breaks the mirror identity (measure-zero
    # for real data; the random draw above never hits it)
    flipped = lab.copy()
    flipped[:n, 1] = 1.0 - flipped[:n, 1]

    direct = assign_targets_device(
        jnp.asarray(flipped), jnp.asarray(counts[0]), cfg.anchors_array,
        cfg.img_size, cfg.num_classes)
    via_dense = [
        flip_targets_lr(t, x_axis=-3)
        for t in assign_targets_device(
            jnp.asarray(lab), jnp.asarray(counts[0]), cfg.anchors_array,
            cfg.img_size, cfg.num_classes)
    ]
    for a, b in zip(direct, via_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
