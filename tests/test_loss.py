"""Loss-layer tests (port of reference tests/test_loss.py invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.ops.losses import (
    BOX_WEIGHT,
    CLS_WEIGHT,
    OBJ_SCALE_WEIGHTS,
    yolo_loss,
    yolo_loss_multiscale,
)

ANCHORS = np.asarray(
    [[[10, 13], [16, 30], [33, 23]],
     [[30, 61], [62, 45], [59, 119]],
     [[116, 90], [156, 198], [373, 326]]],
    np.float32,
)
GS = (16, 8, 4)  # grids at img_size 128


def _preds(rng, nc=1):
    return [
        jnp.asarray(rng.normal(0, 0.5, (2, g, g, 3, 5 + nc)), jnp.float32)
        for g in GS
    ]


def _targets_empty(nc=1):
    return [jnp.zeros((2, g, g, 3, 5 + nc), jnp.float32) for g in GS]


def _targets_with_objects(nc=1):
    tgts = [np.zeros((2, g, g, 3, 5 + nc), np.float32) for g in GS]
    for s, g in enumerate(GS):
        tgts[s][0, g // 2, g // 2, 1, 0:4] = [0.5, 0.5, 0.2, 0.3]
        tgts[s][0, g // 2, g // 2, 1, 4] = 1.0
        tgts[s][0, g // 2, g // 2, 1, 5] = 1.0
    return [jnp.asarray(t) for t in tgts]


def test_loss_no_objects_bbox_cls_zero():
    rng = np.random.default_rng(0)
    pred = _preds(rng)[0]
    tgt = _targets_empty()[0]
    total, bbox, obj, cls = yolo_loss(pred, tgt, ANCHORS[0], 1, 128)
    assert float(bbox) == 0.0
    assert float(cls) == 0.0
    assert float(obj) > 0.0
    assert float(total) == pytest.approx(float(obj), rel=1e-6)


def test_loss_weight_identity():
    # reference: tests/test_loss.py:128 exact 0.05/1.0/0.5 identity
    rng = np.random.default_rng(1)
    pred = _preds(rng)[0]
    tgt = _targets_with_objects()[0]
    total, bbox, obj, cls = yolo_loss(pred, tgt, ANCHORS[0], 1, 128)
    expected = BOX_WEIGHT * float(bbox) + 1.0 * float(obj) + CLS_WEIGHT * float(cls)
    assert float(total) == pytest.approx(expected, rel=1e-5)


def test_loss_all_finite_nonnegative():
    rng = np.random.default_rng(2)
    preds = _preds(rng)
    tgts = _targets_with_objects()
    total, bbox, obj, cls = yolo_loss_multiscale(preds, tgts, ANCHORS, 1, 128)
    for v in (total, bbox, obj, cls):
        assert np.isfinite(float(v))
    assert float(obj) >= 0 and float(cls) >= 0


def test_multiscale_weight_identity():
    # total = sum_s 0.05*bbox_s + w_s*obj_s + 0.5*cls_s with w=[4,1,0.4]
    rng = np.random.default_rng(3)
    preds = _preds(rng)
    tgts = _targets_with_objects()
    total, _, _, _ = yolo_loss_multiscale(preds, tgts, ANCHORS, 1, 128)
    expected = 0.0
    for s in range(3):
        _, bbox, obj, cls = yolo_loss(preds[s], tgts[s], ANCHORS[s], 1, 128)
        expected += (
            BOX_WEIGHT * float(bbox)
            + OBJ_SCALE_WEIGHTS[s] * float(obj)
            + CLS_WEIGHT * float(cls)
        )
    assert float(total) == pytest.approx(expected, rel=1e-5)


def test_multiscale_components_are_unweighted_sums():
    rng = np.random.default_rng(4)
    preds = _preds(rng)
    tgts = _targets_with_objects()
    _, bbox_t, obj_t, cls_t = yolo_loss_multiscale(preds, tgts, ANCHORS, 1, 128)
    b = o = c = 0.0
    for s in range(3):
        _, bbox, obj, cls = yolo_loss(preds[s], tgts[s], ANCHORS[s], 1, 128)
        b, o, c = b + float(bbox), o + float(obj), c + float(cls)
    assert float(bbox_t) == pytest.approx(b, rel=1e-5)
    assert float(obj_t) == pytest.approx(o, rel=1e-5)
    assert float(cls_t) == pytest.approx(c, rel=1e-5)


def test_loss_multiclass():
    rng = np.random.default_rng(5)
    preds = _preds(rng, nc=3)
    tgts = [np.zeros((2, g, g, 3, 8), np.float32) for g in GS]
    tgts[0][0, 4, 4, 0, 0:4] = [0.28, 0.28, 0.1, 0.1]
    tgts[0][0, 4, 4, 0, 4] = 1.0
    tgts[0][0, 4, 4, 0, 5 + 2] = 1.0  # one-hot class 2
    tgts = [jnp.asarray(t) for t in tgts]
    total, bbox, obj, cls = yolo_loss_multiscale(preds, tgts, ANCHORS, 3, 128)
    assert np.isfinite(float(total))
    assert float(cls) > 0.0


def test_loss_gradients_flow_through_all_channels():
    rng = np.random.default_rng(6)
    preds = _preds(rng)
    tgts = _targets_with_objects()

    def scalar_loss(p):
        total, _, _, _ = yolo_loss_multiscale(p, tgts, ANCHORS, 1, 128)
        return total

    grads = jax.grad(scalar_loss)(preds)
    for g in grads:
        arr = np.asarray(g)
        assert np.all(np.isfinite(arr))
        assert np.abs(arr).sum() > 0


def test_quirk_640_changes_only_wh_decode_scale():
    rng = np.random.default_rng(7)
    preds = _preds(rng)
    tgts = _targets_with_objects()
    t_correct, *_ = yolo_loss_multiscale(preds, tgts, ANCHORS, 1, 128,
                                         quirk_640=False)
    t_quirk, *_ = yolo_loss_multiscale(preds, tgts, ANCHORS, 1, 128,
                                       quirk_640=True)
    # at img_size != 640 the quirk path must differ (bbox decode scale)
    assert float(t_correct) != pytest.approx(float(t_quirk), rel=1e-6)
    # at img_size == 640 the quirk is a no-op
    t_a, *_ = yolo_loss_multiscale(preds, tgts, ANCHORS, 1, 640, quirk_640=False)
    t_b, *_ = yolo_loss_multiscale(preds, tgts, ANCHORS, 1, 640, quirk_640=True)
    assert float(t_a) == pytest.approx(float(t_b), rel=1e-7)


def test_perfect_prediction_low_loss():
    """Predictions matching targets should give much lower loss than noise."""
    nc, g = 1, 16
    tgt = np.zeros((1, g, g, 3, 6), np.float32)
    gx, gy, a = 5, 7, 0
    anchor_w, anchor_h = ANCHORS[0][a]
    # choose a target box exactly representable by the decode formulas:
    # center at cell center, wh = anchor*(2*sigmoid(0))^2 = anchor
    cx, cy = (gx + 0.5) / g, (gy + 0.5) / g
    w, h = anchor_w / 128, anchor_h / 128
    tgt[0, gy, gx, a] = [cx, cy, w, h, 1.0, 1.0]

    pred = np.zeros((1, g, g, 3, 6), np.float32)
    pred[..., 4] = -10.0  # low objectness everywhere
    pred[0, gy, gx, a, 0:4] = 0.0  # sigmoid(0) -> center of cell, wh = anchor
    pred[0, gy, gx, a, 4] = 10.0  # confident objectness
    pred[0, gy, gx, a, 5] = 10.0  # confident class

    total_good, bbox_good, _, _ = yolo_loss(
        jnp.asarray(pred), jnp.asarray(tgt), ANCHORS[0], 1, 128
    )
    rng = np.random.default_rng(8)
    noise = jnp.asarray(rng.normal(0, 1, pred.shape), jnp.float32)
    total_bad, *_ = yolo_loss(noise, jnp.asarray(tgt), ANCHORS[0], 1, 128)
    assert float(bbox_good) == pytest.approx(0.0, abs=1e-3)
    assert float(total_good) < float(total_bad)
