"""Batched serving inference: vmapped postprocess == single-image path."""

import numpy as np
import pytest

from yolo_from_scratch_tpu.infer.predict import BatchPredictor, Predictor


def test_batch_predict_matches_single(cfg, model_and_vars, temp_dataset_dir):
    _, variables = model_and_vars
    imgs = sorted((temp_dataset_dir / "val" / "images").glob("*.jpg"))[:3]
    imgs = [str(p) for p in imgs]

    single = Predictor(variables, cfg, conf_threshold=1e-3)
    batched = BatchPredictor(variables, cfg, conf_threshold=1e-3,
                             max_outputs=512)

    per_image_single = [single(p) for p in imgs]
    per_image_batched = batched(imgs)

    assert len(per_image_batched) == 3
    for ds, db in zip(per_image_single, per_image_batched):
        assert len(ds) == len(db)
        a = np.asarray(sorted(ds))
        b = np.asarray(sorted(db))
        if len(a):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_batch_predict_empty_at_high_threshold(cfg, model_and_vars,
                                               temp_dataset_dir):
    _, variables = model_and_vars
    imgs = [str(next((temp_dataset_dir / "val" / "images").glob("*.jpg")))]
    batched = BatchPredictor(variables, cfg, conf_threshold=0.9999)
    assert batched(imgs) == [[]]


def test_batch_predict_mixed_sizes(cfg, model_and_vars, tmp_path):
    """Different original sizes letterbox independently per image."""
    from PIL import Image

    _, variables = model_and_vars
    rng = np.random.default_rng(0)
    p1 = tmp_path / "wide.jpg"
    p2 = tmp_path / "tall.jpg"
    Image.fromarray((rng.random((50, 200, 3)) * 255).astype(np.uint8)).save(p1)
    Image.fromarray((rng.random((200, 50, 3)) * 255).astype(np.uint8)).save(p2)
    batched = BatchPredictor(variables, cfg, conf_threshold=1e-3)
    out = batched([str(p1), str(p2)])
    assert len(out) == 2
    for dets in out:
        for d in dets:
            assert abs(d[0]) < 10000 and abs(d[3]) < 10000


def test_dense_scene_nms_capacity_1280():
    """Capacity plan under candidate overload (VERDICT r2 #4): at 1280^2
    the raw prediction count is 100,800 but the static NMS prefilter
    admits default_topk = 4096. The reference's batched_nms sees EVERY
    above-threshold box (reference: train.py:1225-1233); this pins the
    framework's guarantee when more than 4096 candidates pass the
    confidence gate: the prefilter keeps the HIGHEST-scored candidates,
    so real detections (which outscore the background chatter that
    floods the gate) survive.

    Constructed worst case: every P3 cell fires above threshold (76,800
    candidates, 18.8x capacity) at obj~0.73 while 100 planted objects
    fire at obj~0.998 on a sparse lattice. All 100 planted detections
    must come back, at their exact cell centers."""
    import jax
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.config import YoloConfig
    from yolo_from_scratch_tpu.infer.predict import (
        default_topk,
        make_postprocess,
    )

    cfg = YoloConfig(num_classes=2, img_size=1280)
    g3 = 1280 // 8
    assert default_topk(1280) == 4096

    obj_bg, obj_hit, cls_fg = 1.0, 6.0, 4.0
    p3 = np.zeros((1, g3, g3, 3, 7), np.float32)
    p3[..., 4] = obj_bg          # every P3 anchor passes conf 0.5
    p3[..., 5] = cls_fg          # class 0 dominant
    p3[..., 6] = -cls_fg
    # 100 planted objects on a 10x10 lattice, anchor 0, box at the cell
    # center with anchor-sized wh (tx=ty=tw=th=0 decodes to exactly that)
    lat = np.arange(8, 160, 16)[:10]
    for i in lat:
        for j in lat:
            p3[0, i, j, 0, 4] = obj_hit
    n_above = int((1 / (1 + np.exp(-p3[..., 4])) > 0.5).sum())
    assert n_above == 76800 > 4096  # the gate is genuinely flooded

    def fake_forward(variables, img):
        return [
            jnp.asarray(p3),
            jnp.full((1, 80, 80, 3, 7), -10.0, jnp.float32),
            jnp.full((1, 40, 40, 3, 7), -10.0, jnp.float32),
        ]

    post = make_postprocess(None, cfg, conf_threshold=0.5,
                            max_outputs=150, use_pallas_nms=False,
                            apply_fn=fake_forward)
    boxes, scores, classes, valid = jax.device_get(post(
        {}, jnp.zeros((1, 1280, 1280, 3), jnp.float32),
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0)))
    kept = boxes[valid.astype(bool)]
    kept_scores = scores[valid.astype(bool)]

    hit_score = 1 / (1 + np.exp(-obj_hit)) * 1 / (1 + np.exp(-cls_fg))
    planted = kept_scores > hit_score - 1e-3
    assert planted.sum() == 100, planted.sum()
    # every planted detection is at its cell center (scale 1, no pad)
    centers = {(round((j + 0.5) * 8), round((i + 0.5) * 8))
               for i in lat for j in lat}
    got = {(round(float((b[0] + b[2]) / 2)), round(float((b[1] + b[3]) / 2)))
           for b in kept[planted]}
    assert got == centers


def test_dense_scene_approx_topk_keeps_planted():
    """`approx_topk=True` swaps the exact lax.top_k prefilter for the
    TPU-native binned `lax.approx_max_k` (recall_target 0.95). The bin
    reduction keeps the max of each contiguous score bin, so a real
    detection is only at risk if ANOTHER higher-scored candidate lands in
    its bin — background chatter cannot evict it. Planted objects spaced
    >= 48 flat indices apart (bin width ~ 100800/4096 ~ 25) must all
    survive, same construction as the exact-top-k capacity test above."""
    import jax
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.config import YoloConfig
    from yolo_from_scratch_tpu.infer.predict import make_postprocess

    cfg = YoloConfig(num_classes=2, img_size=1280)
    g3 = 1280 // 8
    obj_bg, obj_hit, cls_fg = 1.0, 6.0, 4.0
    p3 = np.zeros((1, g3, g3, 3, 7), np.float32)
    p3[..., 4] = obj_bg
    p3[..., 5] = cls_fg
    p3[..., 6] = -cls_fg
    lat = np.arange(8, 160, 16)[:10]
    for i in lat:
        for j in lat:
            p3[0, i, j, 0, 4] = obj_hit

    def fake_forward(variables, img):
        return [
            jnp.asarray(p3),
            jnp.full((1, 80, 80, 3, 7), -10.0, jnp.float32),
            jnp.full((1, 40, 40, 3, 7), -10.0, jnp.float32),
        ]

    post = make_postprocess(None, cfg, conf_threshold=0.5,
                            max_outputs=150, use_pallas_nms=False,
                            apply_fn=fake_forward, approx_topk=True)
    boxes, scores, classes, valid = jax.device_get(post(
        {}, jnp.zeros((1, 1280, 1280, 3), jnp.float32),
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0)))
    kept_scores = scores[valid.astype(bool)]
    hit_score = 1 / (1 + np.exp(-obj_hit)) * 1 / (1 + np.exp(-cls_fg))
    assert (kept_scores > hit_score - 1e-3).sum() == 100
