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
