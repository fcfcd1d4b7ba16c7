"""Inference-path tests (port of reference tests/test_inference.py:112-309)."""

import numpy as np
import pytest

from yolo_from_scratch_tpu.infer.predict import Predictor, default_topk
from yolo_from_scratch_tpu.ops.boxes import pairwise_iou_corner


@pytest.fixture(scope="module")
def sample_image(temp_dataset_dir):
    return str(next((temp_dataset_dir / "val" / "images").glob("*.jpg")))


@pytest.fixture(scope="module")
def rect_image(tmp_path_factory):
    """Non-square image to exercise letterbox coordinate round-trip."""
    from PIL import Image

    p = tmp_path_factory.mktemp("imgs") / "rect.jpg"
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((60, 200, 3)) * 255).astype(np.uint8)).save(p)
    return str(p)


def test_default_topk_scales_with_resolution():
    assert default_topk(640) == 4096
    assert default_topk(128) == 3 * (16 * 16 + 8 * 8 + 4 * 4)


def test_predict_returns_empty_at_extreme_threshold(
    cfg, model_and_vars, sample_image
):
    _, variables = model_and_vars
    predictor = Predictor(variables, cfg, conf_threshold=0.9999)
    assert predictor(sample_image) == []


def test_predict_format_and_geometry(cfg, model_and_vars, sample_image):
    _, variables = model_and_vars
    # very low threshold so the untrained model produces detections
    predictor = Predictor(variables, cfg, conf_threshold=1e-4)
    dets = predictor(sample_image)
    assert len(dets) > 0
    for d in dets:
        assert len(d) == 6
        x1, y1, x2, y2, conf, cls = d
        assert x2 > x1 and y2 > y1
        assert 0.0 <= conf <= 1.0
        assert cls == 0
        for v in (x1, y1, x2, y2):
            assert abs(v) < 10000  # reference sanity bound


def test_predict_conf_threshold_monotone(cfg, model_and_vars, sample_image):
    _, variables = model_and_vars
    many = len(Predictor(variables, cfg, conf_threshold=1e-4)(sample_image))
    few = len(Predictor(variables, cfg, conf_threshold=1e-2)(sample_image))
    assert few <= many


def test_predict_post_nms_pairwise_iou(cfg, model_and_vars, sample_image):
    # reference invariant: post-NMS same-class pairs IoU < threshold
    _, variables = model_and_vars
    iou_thr = 0.4
    predictor = Predictor(variables, cfg, conf_threshold=1e-4,
                          iou_threshold=iou_thr)
    dets = predictor(sample_image)
    boxes = np.array([d[:4] for d in dets], np.float32)
    if len(boxes) >= 2:
        import jax.numpy as jnp

        ious = np.array(
            pairwise_iou_corner(jnp.asarray(boxes), jnp.asarray(boxes))
        )
        np.fill_diagonal(ious, 0.0)
        assert ious.max() <= iou_thr + 1e-5


def test_predict_multiclass_class_range(cfg_multiclass, temp_dataset_multiclass):
    import jax

    from yolo_from_scratch_tpu.models.yolo import init_model

    _, variables = init_model(jax.random.PRNGKey(0), cfg_multiclass)
    img = str(next(
        (temp_dataset_multiclass / "val" / "images").glob("*.jpg")
    ))
    dets = Predictor(variables, cfg_multiclass, conf_threshold=1e-4)(img)
    for d in dets:
        assert 0 <= d[5] < 3


def test_predict_rect_image_coords_in_original_frame(
    cfg, model_and_vars, rect_image
):
    """Detections on a 200x60 image must come back in that frame, not in
    letterboxed coords."""
    _, variables = model_and_vars
    dets = Predictor(variables, cfg, conf_threshold=1e-4)(rect_image)
    assert len(dets) > 0
    xs = [d[2] for d in dets]
    # letterboxed coords would cap near img_size * (orig/scale); original
    # frame means boxes can legitimately reach x ~ 200 but centers of the
    # padded band map outside [0, 60] in y. Just require a sane envelope
    # well beyond the 128px letterbox frame is NOT exceeded wildly:
    assert max(xs) < 1000
    # at least one detection should sit in the right half of the wide image
    assert any(d[0] > 60 for d in dets)


def test_predictor_reuse_multiple_images(cfg, model_and_vars, temp_dataset_dir):
    _, variables = model_and_vars
    predictor = Predictor(variables, cfg, conf_threshold=1e-3)
    imgs = sorted((temp_dataset_dir / "val" / "images").glob("*.jpg"))[:2]
    r1, r2 = predictor(str(imgs[0])), predictor(str(imgs[1]))
    assert isinstance(r1, list) and isinstance(r2, list)


def test_uint8_ingress_matches_f32(cfg, model_and_vars):
    """The serving programs accept uint8 images (4x fewer link bytes)
    and normalize on-device with config.INV255 — bit-identical results
    to feeding the host-normalized f32 image into the same program."""
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.config import INV255
    from yolo_from_scratch_tpu.infer.predict import make_postprocess
    from yolo_from_scratch_tpu.models.yolo import YOLO

    model, variables = model_and_vars
    post = make_postprocess(YOLO(cfg), cfg, conf_threshold=0.01)
    rng = np.random.default_rng(3)
    img_u8 = rng.integers(0, 256, (1, cfg.img_size, cfg.img_size, 3),
                          dtype=np.uint8)
    out_u8 = post(variables, jnp.asarray(img_u8), 1.0, 0.0, 0.0)
    out_f32 = post(variables,
                   jnp.asarray(img_u8.astype(np.float32) * INV255),
                   1.0, 0.0, 0.0)
    for a, b in zip(out_u8, out_f32):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
