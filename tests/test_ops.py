"""Unit tests for geometry / decode / NMS primitives.

Ports the reference's invariants for decode (tests/test_loss.py:245-315),
IoU helpers (tests/test_utils.py), and NMS semantics
(tests/test_inference.py:16-109) onto the vectorized implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.ops.boxes import (
    anchor_iou_wh,
    box_iou_center,
    box_iou_corner,
    center_to_corner,
    pairwise_iou_corner,
)
from yolo_from_scratch_tpu.ops.ciou import ciou, ciou_loss
from yolo_from_scratch_tpu.ops.decode import decode_predictions
from yolo_from_scratch_tpu.ops.nms import NEG_INF, batched_nms_fixed, nms_keep_mask


# ---------------- IoU helpers ----------------


def test_identical_boxes_iou_one():
    b = jnp.array([0.5, 0.5, 0.2, 0.3])
    assert float(box_iou_center(b, b)) == pytest.approx(1.0, abs=1e-4)


def test_disjoint_boxes_iou_zero():
    a = jnp.array([0.2, 0.2, 0.1, 0.1])
    b = jnp.array([0.8, 0.8, 0.1, 0.1])
    assert float(box_iou_center(a, b)) == pytest.approx(0.0, abs=1e-6)


def test_containment_iou_is_area_ratio():
    # reference: tests/test_utils.py containment property
    outer = jnp.array([0.5, 0.5, 0.4, 0.4])
    inner = jnp.array([0.5, 0.5, 0.2, 0.2])
    assert float(box_iou_center(outer, inner)) == pytest.approx(0.25, abs=1e-3)


def test_corner_half_overlap_is_one_third():
    # reference: tests/test_utils.py:82-90 — 50% linear overlap -> IoU 1/3
    a = jnp.array([0.0, 0.0, 1.0, 1.0])
    b = jnp.array([0.5, 0.0, 1.5, 1.0])
    assert float(box_iou_corner(a, b)) == pytest.approx(1.0 / 3.0, abs=1e-3)


def test_center_to_corner_roundtrip():
    boxes = jnp.array([[0.5, 0.4, 0.2, 0.1], [0.1, 0.9, 0.05, 0.3]])
    corners = center_to_corner(boxes)
    assert np.all(np.asarray(corners[:, 2]) > np.asarray(corners[:, 0]))
    from yolo_from_scratch_tpu.ops.boxes import corner_to_center

    np.testing.assert_allclose(corner_to_center(corners), boxes, atol=1e-6)


def test_anchor_iou_perfect_match():
    anchors = jnp.array([[10.0, 13.0], [16.0, 30.0], [33.0, 23.0]])
    iou = anchor_iou_wh(jnp.array([16.0, 30.0]), anchors)
    assert int(jnp.argmax(iou)) == 1
    assert float(iou[1]) == pytest.approx(1.0, abs=1e-4)


def test_pairwise_iou_shape():
    a = jnp.zeros((4, 4)).at[:, 2:].set(1.0)
    b = jnp.zeros((6, 4)).at[:, 2:].set(1.0)
    assert pairwise_iou_corner(a, b).shape == (4, 6)


# ---------------- CIoU ----------------


def test_ciou_perfect_boxes_loss_near_zero():
    boxes = jnp.array([[0.5, 0.5, 0.2, 0.3], [0.3, 0.3, 0.1, 0.1]])
    assert float(ciou_loss(boxes, boxes)) == pytest.approx(0.0, abs=1e-4)


def test_ciou_disjoint_loss_above_one():
    a = jnp.array([[0.1, 0.1, 0.1, 0.1]])
    b = jnp.array([[0.9, 0.9, 0.1, 0.1]])
    assert float(ciou_loss(a, b)) > 1.0


def test_ciou_partial_overlap_between_zero_and_disjoint():
    a = jnp.array([[0.5, 0.5, 0.2, 0.2]])
    b = jnp.array([[0.55, 0.55, 0.2, 0.2]])
    val = float(ciou_loss(a, b))
    assert 0.0 < val < 1.0


def test_ciou_aspect_ratio_penalty():
    # same IoU-ish overlap, mismatched aspect ratio penalized more
    tgt = jnp.array([[0.5, 0.5, 0.2, 0.2]])
    same_aspect = jnp.array([[0.5, 0.5, 0.24, 0.24]])
    diff_aspect = jnp.array([[0.5, 0.5, 0.288, 0.2]])  # same area, other AR
    assert float(ciou_loss(diff_aspect, tgt)) > float(ciou_loss(same_aspect, tgt))


def test_ciou_masked_mean_matches_subset():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(0.2, 0.8, (10, 4)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0.2, 0.8, (10, 4)), jnp.float32)
    mask = jnp.asarray(rng.random(10) > 0.5)
    dense = float(ciou_loss(pred, tgt, mask=mask))
    subset = float(ciou_loss(pred[np.asarray(mask)], tgt[np.asarray(mask)]))
    assert dense == pytest.approx(subset, rel=1e-5)


def test_ciou_gradients_flow():
    tgt = jnp.array([[0.5, 0.5, 0.2, 0.2]])
    g = jax.grad(lambda p: ciou_loss(p, tgt))(jnp.array([[0.4, 0.4, 0.3, 0.1]]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


# ---------------- decode ----------------


@pytest.fixture(scope="module")
def raw_preds():
    rng = np.random.default_rng(42)
    return jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3, 6)), jnp.float32)


ANCHORS_P3 = jnp.array([[10.0, 13.0], [16.0, 30.0], [33.0, 23.0]])


def test_decode_shape_preserved(raw_preds):
    out = decode_predictions(raw_preds, ANCHORS_P3, 128)
    assert out.shape == raw_preds.shape


def test_decode_centers_in_range(raw_preds):
    # b_x in [(-0.5 + cx)/w, (1.5 + cx)/w] -> overall (-0.5/16, 16.5/16)
    out = decode_predictions(raw_preds, ANCHORS_P3, 128)
    assert float(out[..., 0].min()) >= -0.5 / 16 - 1e-6
    assert float(out[..., 0].max()) <= 16.5 / 16 + 1e-6
    assert float(out[..., 1].min()) >= -0.5 / 16 - 1e-6


def test_decode_dims_positive_and_bounded(raw_preds):
    # b_w in (0, 4*anchor/img]
    out = decode_predictions(raw_preds, ANCHORS_P3, 128)
    bw = np.asarray(out[..., 2])
    assert (bw > 0).all()
    max_allowed = 4.0 * 33.0 / 128.0
    assert bw.max() <= max_allowed + 1e-6


def test_decode_logits_untouched(raw_preds):
    out = decode_predictions(raw_preds, ANCHORS_P3, 128)
    np.testing.assert_array_equal(np.asarray(out[..., 4:]),
                                  np.asarray(raw_preds[..., 4:]))


def test_decode_exact_formula_single_cell():
    # hand-check one cell against the published formulas
    raw = np.zeros((1, 4, 4, 3, 6), np.float32)
    raw[0, 2, 1, 0, 0] = 0.7  # tx
    raw[0, 2, 1, 0, 1] = -0.3  # ty
    raw[0, 2, 1, 0, 2] = 0.2  # tw
    raw[0, 2, 1, 0, 3] = 0.1  # th
    anchors = np.array([[20.0, 30.0], [1, 1], [1, 1]], np.float32)
    out = np.asarray(decode_predictions(jnp.asarray(raw), jnp.asarray(anchors), 64))

    sig = lambda v: 1 / (1 + np.exp(-v))
    # cell (i=2 row -> grid_y=2, j=1 col -> grid_x=1)
    assert out[0, 2, 1, 0, 0] == pytest.approx(((2 * sig(0.7) - 0.5) + 1) / 4, abs=1e-6)
    assert out[0, 2, 1, 0, 1] == pytest.approx(((2 * sig(-0.3) - 0.5) + 2) / 4, abs=1e-6)
    assert out[0, 2, 1, 0, 2] == pytest.approx((20 / 64) * (2 * sig(0.2)) ** 2, abs=1e-6)
    assert out[0, 2, 1, 0, 3] == pytest.approx((30 / 64) * (2 * sig(0.1)) ** 2, abs=1e-6)


def test_decode_img_size_scaling(raw_preds):
    out640 = decode_predictions(raw_preds, ANCHORS_P3, 640)
    out128 = decode_predictions(raw_preds, ANCHORS_P3, 128)
    np.testing.assert_allclose(
        np.asarray(out128[..., 2]) / np.asarray(out640[..., 2]), 5.0, rtol=1e-4
    )


def test_decode_differentiable(raw_preds):
    g = jax.grad(lambda r: jnp.sum(decode_predictions(r, ANCHORS_P3, 128)[..., :4]))(
        raw_preds
    )
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------- NMS ----------------


def test_nms_keeps_highest_and_suppresses_overlap():
    boxes = jnp.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(nms_keep_mask(boxes, scores, 0.4))
    assert keep.tolist() == [True, False, True]


def test_nms_no_suppression_below_threshold():
    boxes = jnp.array([[0, 0, 10, 10], [8, 8, 18, 18]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    keep = np.asarray(nms_keep_mask(boxes, scores, 0.5))
    assert keep.tolist() == [True, True]


def test_nms_chain_suppression_is_greedy():
    # b overlaps a (suppressed); c overlaps b but NOT a -> c survives,
    # because greedy NMS only suppresses vs kept boxes
    boxes = jnp.array(
        [[0, 0, 10, 10], [4, 0, 14, 10], [9, 0, 19, 10]], jnp.float32
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(nms_keep_mask(boxes, scores, 0.3))
    assert keep.tolist() == [True, False, True]


def test_batched_nms_classes_dont_suppress_each_other():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    classes = jnp.array([0, 1])
    _, out_scores, out_classes, valid = batched_nms_fixed(
        boxes, scores, classes, 0.5, max_outputs=2
    )
    assert np.asarray(valid).sum() == 2


def test_batched_nms_output_sorted_and_padded():
    boxes = jnp.array(
        [[0, 0, 10, 10], [20, 20, 30, 30], [0, 0, 10, 10]], jnp.float32
    )
    scores = jnp.array([0.5, 0.9, 0.95])
    classes = jnp.array([0, 0, 0])
    b, s, c, valid = batched_nms_fixed(boxes, scores, classes, 0.5, max_outputs=3)
    s, valid = np.asarray(s), np.asarray(valid)
    assert valid.tolist() == [True, True, False]  # 0.5 box suppressed by 0.95
    assert s[0] >= s[1]


def test_nms_padding_rows_never_kept():
    boxes = jnp.zeros((8, 4), jnp.float32)
    scores = jnp.full((8,), NEG_INF)
    scores = scores.at[0].set(0.9)
    keep = np.asarray(nms_keep_mask(boxes, scores, 0.5))
    assert keep.sum() == 1 and keep[0]


def _greedy_nms_oracle(boxes, scores, thr):
    """Plain-Python greedy NMS (torchvision semantics: suppress IoU > thr)."""

    def iou(a, b):
        ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
        ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / ua if ua > 0 else 0.0

    order = sorted(range(len(scores)), key=lambda i: -scores[i])
    keep = []
    for i in order:
        if all(iou(boxes[i], boxes[j]) <= thr for j in keep):
            keep.append(i)
    return sorted(keep)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_nms_matches_python_greedy_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 100
    xy = rng.uniform(0, 60, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    thr = 0.5
    keep = np.asarray(nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), thr))
    got = sorted(np.nonzero(keep)[0].tolist())
    expected = _greedy_nms_oracle(boxes.tolist(), scores.tolist(), thr)
    assert got == expected


def test_nms_post_suppression_pairwise_iou_below_threshold():
    # reference invariant: all surviving pairs have IoU < threshold
    # (tests/test_inference.py:176-179)
    rng = np.random.default_rng(7)
    n = 64
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(5, 30, (n, 2))
    boxes = jnp.asarray(
        np.concatenate([xy, xy + wh], axis=1), jnp.float32
    )
    scores = jnp.asarray(rng.uniform(0.1, 1.0, n), jnp.float32)
    classes = jnp.zeros(n, jnp.int32)
    thr = 0.4
    b, s, c, valid = batched_nms_fixed(boxes, scores, classes, thr, max_outputs=n)
    kept = np.asarray(b)[np.asarray(valid)]
    ious = np.array(pairwise_iou_corner(jnp.asarray(kept), jnp.asarray(kept)))
    np.fill_diagonal(ious, 0.0)
    assert ious.max() <= thr + 1e-6
