"""COCO-style mAP evaluator tests (hand-computable cases)."""

import numpy as np
import pytest

from yolo_from_scratch_tpu.train.map_eval import (
    average_precision,
    coco_map,
    evaluate_map,
)


def test_perfect_detections_ap_one():
    gts = [[(0, 10, 10, 50, 50)], [(0, 20, 20, 80, 80)]]
    dets = [[(10, 10, 50, 50, 0.9, 0)], [(20, 20, 80, 80, 0.8, 0)]]
    mAP, aps = average_precision(dets, gts, 0.5, 1)
    assert mAP == pytest.approx(1.0)


def test_no_detections_ap_zero():
    gts = [[(0, 10, 10, 50, 50)]]
    dets = [[]]
    mAP, _ = average_precision(dets, gts, 0.5, 1)
    assert mAP == 0.0


def test_false_positive_lowers_ap():
    gts = [[(0, 10, 10, 50, 50)]]
    # high-conf FP ranked above the TP
    dets = [[(200, 200, 240, 240, 0.95, 0), (10, 10, 50, 50, 0.9, 0)]]
    mAP, _ = average_precision(dets, gts, 0.5, 1)
    assert 0.0 < mAP < 1.0


def test_duplicate_detection_counts_once():
    gts = [[(0, 10, 10, 50, 50)]]
    dets = [[(10, 10, 50, 50, 0.9, 0), (11, 11, 51, 51, 0.8, 0)]]
    mAP, _ = average_precision(dets, gts, 0.5, 1)
    # second detection of the same GT is an FP; AP stays 1.0 at the 101-pt
    # interpolation since the TP is ranked first (precision envelope)
    assert mAP == pytest.approx(1.0)


def test_wrong_class_not_matched():
    gts = [[(1, 10, 10, 50, 50)]]
    dets = [[(10, 10, 50, 50, 0.9, 0)]]  # predicted class 0, GT class 1
    mAP, aps = average_precision(dets, gts, 0.5, 2)
    assert mAP == 0.0
    assert 1 in aps and aps[1] == 0.0
    assert 0 not in aps  # class 0 has no GT -> skipped


def test_map_strict_iou_lower():
    gts = [[(0, 10, 10, 50, 50)]]
    dets = [[(14, 14, 54, 54, 0.9, 0)]]  # IoU ~0.68
    m_50, _ = average_precision(dets, gts, 0.5, 1)
    m_75, _ = average_precision(dets, gts, 0.75, 1)
    assert m_50 == pytest.approx(1.0)
    assert m_75 == 0.0


def test_coco_map_structure():
    gts = [[(0, 10, 10, 50, 50)]]
    dets = [[(10, 10, 50, 50, 0.9, 0)]]
    out = coco_map(dets, gts, 1)
    assert out["map50"] == pytest.approx(1.0)
    assert out["map"] == pytest.approx(1.0)  # exact boxes match at all IoUs
    assert out["per_class_ap50"][0] == pytest.approx(1.0)


def test_evaluate_map_over_dataset(cfg, model_and_vars, temp_dataset_dir):
    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.infer.predict import Predictor

    _, variables = model_and_vars
    ds = YoloDataset(str(temp_dataset_dir / "val" / "images"), 1,
                     img_size=cfg.img_size)
    predictor = Predictor(variables, cfg, conf_threshold=1e-3)
    out = evaluate_map(predictor, ds, max_images=2, num_classes=1)
    assert 0.0 <= out["map50"] <= 1.0
    assert 0.0 <= out["map"] <= out["map50"] + 1e-9


def test_overlapping_gts_both_matched():
    """COCO matching: a detection whose argmax GT is already claimed must
    match the next unused GT above threshold (not become an FP)."""
    gts = [[(0, 10, 10, 50, 50), (0, 14, 14, 54, 54)]]  # heavy overlap
    dets = [[(10, 10, 50, 50, 0.9, 0),   # matches GT A exactly
             (12, 12, 52, 52, 0.8, 0)]]  # argmax is A (used) but IoU(B)>0.5
    mAP, _ = average_precision(dets, gts, 0.5, 1)
    assert mAP == pytest.approx(1.0)


def test_evaluate_map_batched_matches_single(cfg, model_and_vars,
                                             temp_dataset_dir):
    """BatchPredictor-driven evaluate_map (padded fixed-shape chunks) must
    produce the same mAP as the per-image Predictor path."""
    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.infer.predict import BatchPredictor, Predictor

    _, variables = model_and_vars
    ds = YoloDataset(str(temp_dataset_dir / "val" / "images"), 1,
                     img_size=cfg.img_size)
    single = Predictor(variables, cfg, conf_threshold=1e-3, max_outputs=64)
    batched = BatchPredictor(variables, cfg, conf_threshold=1e-3,
                             max_outputs=64)
    a = evaluate_map(single, ds, max_images=3, num_classes=1)
    # batch_size 2 with 3 images exercises the padded final chunk
    b = evaluate_map(batched, ds, max_images=3, num_classes=1, batch_size=2)
    assert b["map50"] == pytest.approx(a["map50"], abs=1e-6)
    assert b["map"] == pytest.approx(a["map"], abs=1e-6)


def test_detection_prf1_operating_point():
    """Detection-level P/R/F1 at conf 0.5: one TP, one low-conf detection
    (ignored), one high-conf FP, one missed GT."""
    from yolo_from_scratch_tpu.train.map_eval import detection_prf1

    dets = [[
        (10, 10, 20, 20, 0.9, 0),    # matches gt0 -> TP
        (50, 50, 60, 60, 0.4, 0),    # below conf threshold -> ignored
        (80, 80, 90, 90, 0.8, 0),    # no gt there -> FP
    ]]
    gts = [[
        (0, 10, 10, 20, 20),         # matched
        (0, 50, 50, 60, 60),         # only covered below threshold -> FN
    ]]
    p, r, f1 = detection_prf1(dets, gts)
    assert p == 50.0 and r == 50.0 and f1 == 50.0
    # class-aware: same box, wrong class, must not match
    p2, _, _ = detection_prf1([[(10, 10, 20, 20, 0.9, 1)]],
                              [[(0, 10, 10, 20, 20)]])
    assert p2 == 0.0


def test_det_counts_shard_additivity(cfg, model_and_vars,
                                     temp_dataset_dir):
    """Per-shard detection counts sum to the whole-set counts — the
    property that makes --val-det exact under --distributed (each
    process scores its shard, counts are summed globally)."""
    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.infer.predict import Predictor
    from yolo_from_scratch_tpu.train.map_eval import evaluate_det_counts
    from yolo_from_scratch_tpu.train.metrics import prf1

    _, variables = model_and_vars
    ds = YoloDataset(str(temp_dataset_dir / "val" / "images"), 1,
                     cfg.anchors_array, cfg.img_size)
    pred = Predictor(variables, cfg, conf_threshold=1e-3)
    whole = evaluate_det_counts(pred, ds)
    n = len(ds)
    half = n // 2
    a = evaluate_det_counts(pred, ds, indices=range(half))
    b = evaluate_det_counts(pred, ds, indices=range(half, n))
    assert tuple(x + y for x, y in zip(a, b)) == tuple(whole)
    # and prf1 over the summed counts is the global metric
    assert prf1(*whole) == prf1(*(x + y for x, y in zip(a, b)))
