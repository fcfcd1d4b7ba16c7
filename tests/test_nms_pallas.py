"""Pallas NMS kernel vs the pure-lax oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.ops.nms import (
    NEG_INF,
    batched_nms_fixed,
    nms_keep_mask,
)
from yolo_from_scratch_tpu.ops.nms_pallas import (
    batched_nms_fixed_pallas,
    nms_keep_mask_pallas,
)


def _random_boxes(seed, n, spread=60):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, spread, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [17, 128, 300])
def test_pallas_matches_lax_oracle(seed, n):
    boxes, scores = _random_boxes(seed, n)
    thr = 0.5
    expected = np.asarray(nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                        thr))
    got = np.asarray(
        nms_keep_mask_pallas(jnp.asarray(boxes), jnp.asarray(scores), thr,
                             interpret=True)
    )
    np.testing.assert_array_equal(got, expected)


def test_pallas_padding_rows_never_kept():
    boxes, scores = _random_boxes(0, 32)
    scores[10:] = NEG_INF
    keep = np.asarray(
        nms_keep_mask_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                             interpret=True)
    )
    assert not keep[10:].any()


def test_pallas_max_keep_cap():
    # widely separated boxes: nothing suppressed, cap must truncate
    boxes = np.zeros((16, 4), np.float32)
    for i in range(16):
        boxes[i] = [i * 100, 0, i * 100 + 10, 10]
    scores = np.linspace(1.0, 0.1, 16).astype(np.float32)
    keep = np.asarray(
        nms_keep_mask_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                             max_keep=5, interpret=True)
    )
    assert keep.sum() == 5
    assert keep[:5].all()  # the 5 highest-scored


def test_batched_pallas_matches_lax(seed=4):
    boxes, scores = _random_boxes(seed, 200)
    rng = np.random.default_rng(seed)
    classes = rng.integers(0, 3, 200).astype(np.int32)
    a = batched_nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(classes), 0.4, max_outputs=64)
    b = batched_nms_fixed_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                 jnp.asarray(classes), 0.4, max_outputs=64,
                                 interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_batched_grid_matches_per_image_lax():
    """The batch-gridded kernel (one grid step per image) must bit-match
    the lax oracle run per image."""
    from yolo_from_scratch_tpu.ops.nms_pallas import (
        nms_keep_mask_pallas_batched,
    )

    b, n = 5, 200
    boxes = np.stack([_random_boxes(s, n)[0] for s in range(b)])
    scores = np.stack([_random_boxes(s, n)[1] for s in range(b)])
    scores[2, 150:] = NEG_INF  # one image with padding rows
    got = np.asarray(
        nms_keep_mask_pallas_batched(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, interpret=True
        )
    )
    for i in range(b):
        exp = np.asarray(
            nms_keep_mask(jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.5)
        )
        np.testing.assert_array_equal(got[i], exp)


def test_presorted_fast_path_matches_unsorted():
    """presorted=True on score-sorted input must equal the sorting path
    (the serving chain feeds lax.top_k output straight to the kernel)."""
    from yolo_from_scratch_tpu.ops.nms_pallas import (
        nms_keep_mask_pallas_batched,
    )

    b, n = 3, 200
    boxes = np.stack([_random_boxes(s + 20, n)[0] for s in range(b)])
    scores = np.stack([_random_boxes(s + 20, n)[1] for s in range(b)])
    scores[1, 170:] = NEG_INF  # padding rows sort to the tail
    order = np.argsort(-scores, axis=1)
    boxes_s = np.take_along_axis(boxes, order[..., None], axis=1)
    scores_s = np.take_along_axis(scores, order, axis=1)
    fast = np.asarray(nms_keep_mask_pallas_batched(
        jnp.asarray(boxes_s), jnp.asarray(scores_s), 0.5, interpret=True,
        presorted=True,
    ))
    slow = np.asarray(nms_keep_mask_pallas_batched(
        jnp.asarray(boxes_s), jnp.asarray(scores_s), 0.5, interpret=True,
    ))
    np.testing.assert_array_equal(fast, slow)


def test_batched_images_class_aware_matches_lax():
    from yolo_from_scratch_tpu.ops.nms_pallas import (
        batched_nms_fixed_pallas_images,
    )

    b, n = 3, 160
    rng = np.random.default_rng(7)
    boxes = np.stack([_random_boxes(s + 10, n)[0] for s in range(b)])
    scores = np.stack([_random_boxes(s + 10, n)[1] for s in range(b)])
    classes = rng.integers(0, 4, (b, n)).astype(np.int32)
    got = batched_nms_fixed_pallas_images(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.4,
        max_outputs=32, interpret=True,
    )
    for i in range(b):
        exp = batched_nms_fixed(
            jnp.asarray(boxes[i]), jnp.asarray(scores[i]),
            jnp.asarray(classes[i]), 0.4, max_outputs=32,
        )
        for x, y in zip(exp, (g[i] for g in got)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
