"""Frozen serving artifacts (infer/export.py): a jax.export StableHLO
artifact with baked-in weights must reproduce the live BatchPredictor."""

import numpy as np
import pytest

from yolo_from_scratch_tpu.infer.export import (
    MAGIC,
    load_serving_artifact,
    save_serving_artifact,
)
from yolo_from_scratch_tpu.infer.predict import BatchPredictor


@pytest.fixture(scope="module")
def artifact_path(cfg, model_and_vars, tmp_path_factory):
    _, variables = model_and_vars
    path = tmp_path_factory.mktemp("export") / "model.yexp"
    save_serving_artifact(path, variables, cfg, batch_size=2,
                          conf_threshold=1e-3, max_outputs=512)
    return path


def test_artifact_matches_live_predictor(cfg, model_and_vars,
                                         temp_dataset_dir, artifact_path):
    _, variables = model_and_vars
    imgs = sorted((temp_dataset_dir / "val" / "images").glob("*.jpg"))[:2]
    imgs = [str(p) for p in imgs]

    live = BatchPredictor(variables, cfg, conf_threshold=1e-3,
                          max_outputs=512)
    art = load_serving_artifact(artifact_path)

    for ds, db in zip(live(imgs), art(imgs)):
        assert len(ds) == len(db)
        a, b = np.asarray(sorted(ds)), np.asarray(sorted(db))
        if len(a):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_artifact_partial_batch_padding(cfg, model_and_vars,
                                        temp_dataset_dir, artifact_path):
    """One image through a batch-2 artifact: padded lane is dropped."""
    _, variables = model_and_vars
    img = str(next((temp_dataset_dir / "val" / "images").glob("*.jpg")))
    live = BatchPredictor(variables, cfg, conf_threshold=1e-3,
                          max_outputs=512)
    art = load_serving_artifact(artifact_path)
    out = art([img])
    assert len(out) == 1
    ref = live([img])[0]
    assert len(out[0]) == len(ref)


def test_artifact_rejects_oversize_batch(temp_dataset_dir, artifact_path):
    imgs = [str(p) for p in
            sorted((temp_dataset_dir / "val" / "images").glob("*.jpg"))[:3]]
    art = load_serving_artifact(artifact_path)
    with pytest.raises(ValueError, match="frozen batch size"):
        art(imgs)


def test_artifact_meta_roundtrip(cfg, artifact_path):
    art = load_serving_artifact(artifact_path)
    m = art.meta
    assert m["batch_size"] == 2
    assert m["img_size"] == cfg.img_size
    assert m["num_classes"] == cfg.num_classes
    assert m["head_type"] == cfg.head_type
    assert m["packed_stem"] == bool(cfg.packed_stem)
    assert m["pallas_nms"] is False  # portable lax path off-TPU


def test_bad_magic_rejected(tmp_path):
    bad = tmp_path / "junk.yexp"
    bad.write_bytes(b"NOTANARTIFACT" + b"\0" * 64)
    with pytest.raises(ValueError, match="bad magic"):
        load_serving_artifact(bad)


def test_artifact_is_selfcontained(artifact_path, temp_dataset_dir):
    """Loader never touches checkpoint/model-construction code: the file
    alone + jax must serve. Guard: header claims match the program by
    actually executing it."""
    raw = artifact_path.read_bytes()
    assert raw[: len(MAGIC)] == MAGIC
    art = load_serving_artifact(artifact_path)
    img = str(next((temp_dataset_dir / "val" / "images").glob("*.jpg")))
    out = art([img])
    assert isinstance(out, list) and len(out) == 1


def test_int8_artifact_roundtrip(cfg, model_and_vars, temp_dataset_dir,
                                 tmp_path):
    """A quantized frozen artifact serves and matches the live int8
    BatchPredictor."""
    from yolo_from_scratch_tpu.infer.predict import BatchPredictor

    _, variables = model_and_vars
    imgs = [str(p) for p in
            sorted((temp_dataset_dir / "val" / "images").glob("*.jpg"))[:2]]
    path = tmp_path / "int8.yexp"
    save_serving_artifact(path, variables, cfg, batch_size=2,
                          conf_threshold=1e-3, max_outputs=512,
                          quantize_calib=imgs)
    art = load_serving_artifact(path)
    assert art.meta["int8"] is True
    live = BatchPredictor(variables, cfg, conf_threshold=1e-3,
                          max_outputs=512, quantize_calib=imgs)
    for ds, db in zip(live(imgs), art(imgs)):
        assert len(ds) == len(db)
        a, b = np.asarray(sorted(ds)), np.asarray(sorted(db))
        if len(a):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
