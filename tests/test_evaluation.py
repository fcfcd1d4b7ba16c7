"""Evaluation-metric tests (port of reference tests/test_evaluation.py plus
exact-rule unit checks of the grid-aligned counter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.data.dataset import YoloDataset
from yolo_from_scratch_tpu.data.loader import DataLoader
from yolo_from_scratch_tpu.train.loop import eval_epoch
from yolo_from_scratch_tpu.train.metrics import grid_metric_counts, prf1
from yolo_from_scratch_tpu.train.steps import create_train_state, make_eval_step

ANCHORS_P3 = np.array([[10, 13], [16, 30], [33, 23]], np.float32)


def _logit(p):
    return float(np.log(p / (1 - p)))


def _make_pred_target(img_size=128, g=16):
    """One cell with a controllable pred/target pair; everything else off."""
    pred = np.full((1, g, g, 3, 6), -10.0, np.float32)  # obj sigmoid ~ 0
    tgt = np.zeros((1, g, g, 3, 6), np.float32)
    return pred, tgt


def _exact_pred_for(tgt_box, gx, gy, g, anchor, img_size):
    """Raw (tx, ty, tw, th) that decodes exactly to tgt_box."""
    cx, cy, w, h = tgt_box
    sx = ((cx * g) - gx + 0.5) / 2.0
    sy = ((cy * g) - gy + 0.5) / 2.0
    inv_sig = lambda s: np.log(s / (1 - s))
    sw = np.sqrt(w * img_size / anchor[0]) / 2.0
    sh = np.sqrt(h * img_size / anchor[1]) / 2.0
    return [inv_sig(sx), inv_sig(sy), inv_sig(sw), inv_sig(sh)]


def test_counts_true_positive():
    g, img_size = 16, 128
    pred, tgt = _make_pred_target(img_size, g)
    box = [ (5 + 0.5) / g, (7 + 0.5) / g, 20 / img_size, 26 / img_size ]
    tgt[0, 7, 5, 1] = box + [1.0, 1.0]
    pred[0, 7, 5, 1, 0:4] = _exact_pred_for(box, 5, 7, g, ANCHORS_P3[1], img_size)
    pred[0, 7, 5, 1, 4] = _logit(0.9)
    tp, fp, fn = grid_metric_counts(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(ANCHORS_P3), img_size
    )
    assert (int(tp), int(fp), int(fn)) == (1, 0, 0)


def test_counts_fp_when_both_confident_but_low_iou():
    # reference rule: both above threshold but IoU <= thr -> FP only, NO FN
    # (reference: train.py:1009-1018)
    g, img_size = 16, 128
    pred, tgt = _make_pred_target(img_size, g)
    tgt[0, 7, 5, 1] = [0.34, 0.47, 0.15, 0.2, 1.0, 1.0]
    pred[0, 7, 5, 1, 0:4] = [0.0, 0.0, -3.0, -3.0]  # tiny box elsewhere in cell
    pred[0, 7, 5, 1, 4] = _logit(0.9)
    tp, fp, fn = grid_metric_counts(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(ANCHORS_P3), img_size
    )
    assert (int(tp), int(fp), int(fn)) == (0, 1, 0)


def test_counts_fp_when_pred_only():
    g, img_size = 16, 128
    pred, tgt = _make_pred_target(img_size, g)
    pred[0, 2, 2, 0, 4] = _logit(0.95)
    tp, fp, fn = grid_metric_counts(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(ANCHORS_P3), img_size
    )
    assert (int(tp), int(fp), int(fn)) == (0, 1, 0)


def test_counts_fn_when_target_only():
    g, img_size = 16, 128
    pred, tgt = _make_pred_target(img_size, g)
    tgt[0, 3, 3, 2] = [0.22, 0.22, 0.1, 0.1, 1.0, 1.0]
    tp, fp, fn = grid_metric_counts(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(ANCHORS_P3), img_size
    )
    assert (int(tp), int(fp), int(fn)) == (0, 0, 1)


def test_counts_conf_threshold_boundary():
    # strictly-greater semantics on both pred and target thresholds
    g, img_size = 16, 128
    pred, tgt = _make_pred_target(img_size, g)
    pred[0, 2, 2, 0, 4] = _logit(0.5)  # exactly 0.5, NOT > 0.5
    tp, fp, fn = grid_metric_counts(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(ANCHORS_P3), img_size,
        conf_threshold=0.5,
    )
    assert (int(tp), int(fp), int(fn)) == (0, 0, 0)


def test_counts_per_image_vector():
    g, img_size = 16, 128
    pred = np.full((3, g, g, 3, 6), -10.0, np.float32)
    tgt = np.zeros((3, g, g, 3, 6), np.float32)
    pred[1, 2, 2, 0, 4] = _logit(0.9)  # FP on image 1 only
    tp, fp, fn = grid_metric_counts(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(ANCHORS_P3), img_size,
        per_image=True,
    )
    assert np.asarray(fp).tolist() == [0, 1, 0]


def test_f1_identity():
    # reference: tests/test_evaluation.py:93-95
    p, r, f1 = prf1(10, 5, 3)
    assert f1 == pytest.approx(2 * p * r / (p + r), rel=1e-9)


def test_prf1_zero_divisions():
    assert prf1(0, 0, 0) == (0.0, 0.0, 0.0)


def test_eval_epoch_ranges(cfg, temp_dataset_dir, model_and_vars):
    model, variables = model_and_vars
    eval_step = make_eval_step(model, cfg)
    ds = YoloDataset(str(temp_dataset_dir / "val" / "images"), 1,
                     img_size=cfg.img_size)
    loader = DataLoader(ds, batch_size=5, prefetch=0)
    loss, p, r, f1 = eval_epoch(eval_step, variables["params"],
                                variables["batch_stats"], loader)
    assert np.isfinite(loss) and loss >= 0
    for v in (p, r, f1):
        assert 0.0 <= v <= 100.0


def test_eval_epoch_empty_labels(cfg, tmp_path, model_and_vars):
    from PIL import Image

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            (rng.random((cfg.img_size, cfg.img_size, 3)) * 255).astype(np.uint8)
        ).save(tmp_path / "images" / f"{i}.jpg")
        (tmp_path / "labels" / f"{i}.txt").write_text("")
    model, variables = model_and_vars
    eval_step = make_eval_step(model, cfg)
    ds = YoloDataset(str(tmp_path / "images"), 1, img_size=cfg.img_size)
    loader = DataLoader(ds, batch_size=2, prefetch=0)
    loss, p, r, f1 = eval_epoch(eval_step, variables["params"],
                                variables["batch_stats"], loader)
    # untrained model with -4.6 obj bias predicts nothing -> all metrics 0
    assert r == 0.0 and np.isfinite(loss)


def test_iou_threshold_monotonicity():
    # lenient threshold admits >= TPs of strict threshold
    g, img_size = 16, 128
    pred, tgt = _make_pred_target(img_size, g)
    box = [(5 + 0.5) / g, (7 + 0.5) / g, 20 / img_size, 26 / img_size]
    tgt[0, 7, 5, 1] = box + [1.0, 1.0]
    shifted = [box[0] + 0.01, box[1], box[2], box[3]]
    pred[0, 7, 5, 1, 0:4] = _exact_pred_for(shifted, 5, 7, g, ANCHORS_P3[1],
                                            img_size)
    pred[0, 7, 5, 1, 4] = _logit(0.9)
    tp_len, *_ = grid_metric_counts(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(ANCHORS_P3), img_size,
        iou_threshold=0.3,
    )
    tp_strict, *_ = grid_metric_counts(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(ANCHORS_P3), img_size,
        iou_threshold=0.95,
    )
    assert int(tp_len) >= int(tp_strict)
