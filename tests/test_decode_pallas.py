"""Fused Pallas decode kernel vs the XLA postprocess math (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.ops.decode import decode_predictions
from yolo_from_scratch_tpu.ops.decode_pallas import fused_decode_scale
from yolo_from_scratch_tpu.ops.nms import NEG_INF

ANCHORS = jnp.array([[10.0, 13.0], [16.0, 30.0], [33.0, 23.0]])


def _xla_reference(raw, anchors, img_size, scale, pad_top, pad_left,
                   conf_threshold):
    """The exact math of infer/predict.py's per-scale postprocess."""
    nc = raw.shape[-1] - 5
    decoded = decode_predictions(raw, anchors, img_size)
    flat = decoded.reshape(-1, 5 + nc)
    boxes_n = flat[:, 0:4]
    obj = jax.nn.sigmoid(flat[:, 4])
    cls = jax.nn.sigmoid(flat[:, 5:])
    cls_prob = jnp.max(cls, axis=1)
    cls_id = jnp.argmax(cls, axis=1).astype(jnp.int32)
    conf = obj * cls_prob
    score = jnp.where(obj > conf_threshold, conf, NEG_INF)
    cx, cy = boxes_n[:, 0] * img_size, boxes_n[:, 1] * img_size
    w, h = boxes_n[:, 2] * img_size, boxes_n[:, 3] * img_size
    x1 = (cx - w / 2 - pad_left) / scale
    y1 = (cy - h / 2 - pad_top) / scale
    x2 = (cx + w / 2 - pad_left) / scale
    y2 = (cy + h / 2 - pad_top) / scale
    return jnp.stack([x1, y1, x2, y2], 1), score, cls_id


@pytest.mark.parametrize("nc", [1, 4])
@pytest.mark.parametrize("hw", [(16, 16), (8, 8)])
def test_fused_decode_matches_xla(nc, hw):
    h, w = hw
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(0, 2, (1, h, w, 3, 5 + nc)), jnp.float32)
    args = (128, 0.8, 4.0, 6.0, 0.3)  # img_size, scale, pad_top, pad_left, thr
    img_size, scale, pt, plft, thr = args

    b1, s1, c1 = fused_decode_scale(raw, ANCHORS, img_size, scale, pt, plft,
                                    conf_threshold=thr, interpret=True)
    b2, s2, c2 = _xla_reference(raw, ANCHORS, img_size, scale, pt, plft, thr)

    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-3)
    live = np.asarray(s2) > NEG_INF / 2
    np.testing.assert_allclose(np.asarray(s1)[live], np.asarray(s2)[live],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(s1) > NEG_INF / 2, live)
    np.testing.assert_array_equal(np.asarray(c1)[live], np.asarray(c2)[live])


def test_fused_decode_gate_semantics():
    # objectness exactly at threshold is NOT kept (strict >)
    raw = np.full((1, 4, 4, 3, 6), -10.0, np.float32)
    raw[0, 0, 0, 0, 4] = 0.0  # sigmoid = 0.5
    b, s, c = fused_decode_scale(
        jnp.asarray(raw), ANCHORS, 128, 1.0, 0.0, 0.0, conf_threshold=0.5,
        interpret=True,
    )
    assert (np.asarray(s) < NEG_INF / 2).all()
