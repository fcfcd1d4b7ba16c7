"""Numerical parity vs the ACTUAL reference implementation.

Imports /root/reference/train.py (read-only, torch-CPU) and compares our
JAX implementations on identical random inputs: decode formulas, CIoU,
composite losses, target assignment, letterbox geometry, NMS keep sets,
and the LR schedule. Skipped when the reference isn't mounted.

This pins the parity claims in SURVEY.md §6 (box IoU >= 0.99, identical
P/R/F1) at the level of individual operators with tight tolerances.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REF_PATH = Path("/root/reference/train.py")

pytestmark = pytest.mark.skipif(
    not REF_PATH.exists(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref():
    import torch  # noqa: F401  (ensure torch importable)

    spec = importlib.util.spec_from_file_location("reference_train", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["reference_train"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch():
    import torch

    return torch


ANCHORS_P3 = [[10.0, 13.0], [16.0, 30.0], [33.0, 23.0]]


def test_decode_parity(ref, torch):
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.ops.decode import decode_predictions

    rng = np.random.default_rng(0)
    raw = rng.normal(0, 2, (2, 16, 16, 3, 6)).astype(np.float32)
    ours = np.asarray(
        decode_predictions(jnp.asarray(raw), jnp.asarray(ANCHORS_P3), 640)
    )
    theirs = (
        ref.decode_predictions(
            torch.from_numpy(raw), torch.tensor(ANCHORS_P3), 640
        )
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_ciou_parity(ref, torch):
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.ops.ciou import ciou_loss

    rng = np.random.default_rng(1)
    pred = rng.uniform(0.1, 0.9, (64, 4)).astype(np.float32)
    tgt = rng.uniform(0.1, 0.9, (64, 4)).astype(np.float32)
    ours = float(ciou_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    theirs = float(
        ref.ciou_loss(torch.from_numpy(pred), torch.from_numpy(tgt))
    )
    assert ours == pytest.approx(theirs, rel=1e-5)


def _random_pred_target(rng, g, nc, batch=2, n_obj=5):
    pred = rng.normal(0, 1, (batch, g, g, 3, 5 + nc)).astype(np.float32)
    tgt = np.zeros((batch, g, g, 3, 5 + nc), np.float32)
    for _ in range(n_obj):
        b, gy, gx, a = (rng.integers(0, m) for m in (batch, g, g, 3))
        tgt[b, gy, gx, a, 0:4] = rng.uniform(0.2, 0.8, 4)
        tgt[b, gy, gx, a, 4] = 1.0
        tgt[b, gy, gx, a, 5 + int(rng.integers(0, nc))] = 1.0
    return pred, tgt


@pytest.mark.parametrize("nc", [1, 3])
def test_single_scale_loss_parity(ref, torch, nc):
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.ops.losses import yolo_loss

    rng = np.random.default_rng(2)
    pred, tgt = _random_pred_target(rng, 16, nc)
    # our loss with the reference's 640 decode default (quirk path)
    ours = yolo_loss(jnp.asarray(pred), jnp.asarray(tgt),
                     jnp.asarray(ANCHORS_P3), nc, 640)
    theirs = ref.yolo_loss(torch.from_numpy(pred), torch.from_numpy(tgt),
                           torch.tensor(ANCHORS_P3), nc)
    for o, t in zip(ours, theirs):
        assert float(o) == pytest.approx(float(t), rel=1e-4, abs=1e-6)


def test_multiscale_loss_parity(ref, torch):
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.config import DEFAULT_ANCHORS
    from yolo_from_scratch_tpu.ops.losses import yolo_loss_multiscale

    rng = np.random.default_rng(3)
    preds, tgts = [], []
    for g in (16, 8, 4):
        p, t = _random_pred_target(rng, g, 1, n_obj=3)
        preds.append(p)
        tgts.append(t)
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    ours = yolo_loss_multiscale(
        [jnp.asarray(p) for p in preds], [jnp.asarray(t) for t in tgts],
        anchors, 1, 640, quirk_640=True,
    )
    theirs = ref.yolo_loss_multiscale(
        [torch.from_numpy(p) for p in preds],
        [torch.from_numpy(t) for t in tgts],
        [torch.from_numpy(a) for a in anchors], 1,
    )
    for o, t in zip(ours, theirs):
        assert float(o) == pytest.approx(float(t), rel=1e-4, abs=1e-6)


def test_target_assignment_parity(ref, tmp_path):
    """Same image + labels through both datasets -> identical dense targets."""
    from PIL import Image

    from yolo_from_scratch_tpu.data.dataset import YoloDataset

    rng = np.random.default_rng(4)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    arr = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(tmp_path / "images" / "x.png")  # lossless
    lines = []
    for _ in range(6):
        w, h = rng.uniform(0.05, 0.5, 2)
        cx = rng.uniform(w / 2, 1 - w / 2)
        cy = rng.uniform(h / 2, 1 - h / 2)
        cls = int(rng.integers(0, 3))
        lines.append(f"{cls} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
    (tmp_path / "labels" / "x.txt").write_text("\n".join(lines))

    ours_ds = YoloDataset(str(tmp_path / "images"), num_classes=3,
                          img_size=640, backend="pil")
    img_o, tgts_o = ours_ds[0]
    ref_ds = ref.YOLODataset(str(tmp_path / "images"), num_classes=3,
                             img_size=640)
    img_r, tgts_r = ref_ds[0]

    # image: ours NHWC [0,1]; reference CHW [0,1]
    np.testing.assert_allclose(
        img_o, img_r.permute(1, 2, 0).numpy(), atol=1e-6
    )
    for o, r in zip(tgts_o, tgts_r):
        np.testing.assert_allclose(o, r.numpy(), atol=1e-6)


def test_letterbox_geometry_parity(ref):
    from PIL import Image

    from yolo_from_scratch_tpu.data.letterbox import letterbox_image

    rng = np.random.default_rng(5)
    arr = (rng.random((123, 457, 3)) * 255).astype(np.uint8)
    pil = Image.fromarray(arr)
    ours_img, s_o, pt_o, pl_o = letterbox_image(pil, 320)
    ref_img, s_r, pt_r, pl_r = ref.letterbox_resize(pil, 320)
    assert (s_o, pt_o, pl_o) == (s_r, pt_r, pl_r)
    np.testing.assert_array_equal(ours_img, np.asarray(ref_img))


def test_nms_parity_reference_python(ref):
    """Our keep set vs the reference's pure-Python nms (which suppresses
    IoU >= threshold -> suppress_equal=True)."""
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.ops.nms import nms_keep_mask

    rng = np.random.default_rng(6)
    n = 80
    xy = rng.uniform(0, 60, (n, 2))
    wh = rng.uniform(5, 30, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    dets = [tuple(boxes[i]) + (float(scores[i]), 0) for i in range(n)]

    kept_ref = ref.nms(dets, 0.5)
    kept_ref_set = {tuple(np.round(d[:4], 4)) for d in kept_ref}

    keep = np.asarray(
        nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                      suppress_equal=True)
    )
    kept_ours_set = {
        tuple(np.round(boxes[i], 4)) for i in np.nonzero(keep)[0]
    }
    assert kept_ours_set == kept_ref_set


def test_lr_schedule_parity(ref):
    from yolo_from_scratch_tpu.train.schedule import get_lr_lambda

    ours = get_lr_lambda(3, 100, 1e-2, 1e-4)
    theirs = ref.get_lr_lambda(3, 100, 1e-2, 1e-4)
    for epoch in range(0, 101, 7):
        assert ours(epoch) == pytest.approx(theirs(epoch), rel=1e-9)


def test_eval_metric_parity(ref, torch):
    """Grid-aligned TP/FP/FN counting: our dense counter vs the reference's
    quadruple loop, on the same random preds/targets (both using the
    reference's 640-decode quirk)."""
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.train.metrics import grid_metric_counts

    rng = np.random.default_rng(7)
    g = 8
    pred, tgt = _random_pred_target(rng, g, 1, batch=2, n_obj=6)
    # make some predictions confident so every branch is exercised
    pred[..., 4] = rng.normal(0, 3, pred[..., 4].shape)

    tp, fp, fn = grid_metric_counts(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(ANCHORS_P3),
        img_size=640, conf_threshold=0.5, iou_threshold=0.5,
    )

    # reference counting loop (as in train.py:1002-1024)
    tpred = torch.from_numpy(pred)
    ttgt = torch.from_numpy(tgt)
    decoded = ref.decode_predictions(tpred, torch.tensor(ANCHORS_P3))
    peval = decoded.clone()
    peval[..., 4] = torch.sigmoid(tpred[..., 4])
    TP = FP = FN = 0
    for b in range(2):
        for i in range(g):
            for j in range(g):
                for a in range(3):
                    po = peval[b, i, j, a, 4].item()
                    to = ttgt[b, i, j, a, 4].item()
                    if po > 0.5 and to > 0.5:
                        iou = ref.compute_box_iou(peval[b, i, j, a, 0:4],
                                                  ttgt[b, i, j, a, 0:4])
                        if iou > 0.5:
                            TP += 1
                        else:
                            FP += 1
                    elif po > 0.5:
                        FP += 1
                    elif to > 0.5:
                        FN += 1
    assert (int(tp), int(fp), int(fn)) == (TP, FP, FN)


# ---------------------------------------------------------------------------
# Fuzz sweep (VERDICT r2 #8): the fixed-seed single cases above pin the
# operators at 640/nc<=3; these sweep img_size x nc x seed (and the quirk
# flag where the reference has an analogue) so resolution- or
# class-count-dependent divergence can't hide.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("img_size", [416, 640, 1280])
@pytest.mark.parametrize("nc", [1, 80])
def test_decode_parity_fuzz(ref, torch, img_size, nc):
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.ops.decode import decode_predictions

    rng = np.random.default_rng(img_size * 131 + nc)
    g = img_size // 32
    raw = rng.normal(0, 2, (2, g, g, 3, 5 + nc)).astype(np.float32)
    ours = np.asarray(decode_predictions(
        jnp.asarray(raw), jnp.asarray(ANCHORS_P3), img_size))
    theirs = ref.decode_predictions(
        torch.from_numpy(raw), torch.tensor(ANCHORS_P3), img_size).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


@pytest.mark.parametrize("img_size", [416, 1280])
@pytest.mark.parametrize("nc", [1, 80])
def test_single_scale_loss_parity_fuzz(ref, torch, img_size, nc):
    """The reference loss decodes at 640 REGARDLESS of the true train
    resolution (train.py:796 — the SURVEY §3.6 quirk), so the parity
    comparison is our quirk path; quirk-off behavior is pinned separately
    below."""
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.ops.losses import yolo_loss

    rng = np.random.default_rng(img_size * 17 + nc)
    g = img_size // 64
    pred, tgt = _random_pred_target(rng, g, nc, n_obj=7)
    ours = yolo_loss(jnp.asarray(pred), jnp.asarray(tgt),
                     jnp.asarray(ANCHORS_P3), nc, 640)
    theirs = ref.yolo_loss(torch.from_numpy(pred), torch.from_numpy(tgt),
                           torch.tensor(ANCHORS_P3), nc)
    for o, t in zip(ours, theirs):
        assert float(o) == pytest.approx(float(t), rel=1e-4, abs=1e-6)


@pytest.mark.parametrize("nc", [1, 80])
def test_multiscale_loss_parity_fuzz(ref, torch, nc):
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.config import DEFAULT_ANCHORS
    from yolo_from_scratch_tpu.ops.losses import yolo_loss_multiscale

    rng = np.random.default_rng(23 + nc)
    preds, tgts = [], []
    for g in (20, 10, 5):
        p, t = _random_pred_target(rng, g, nc, n_obj=4)
        preds.append(p)
        tgts.append(t)
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    ours = yolo_loss_multiscale(
        [jnp.asarray(p) for p in preds], [jnp.asarray(t) for t in tgts],
        anchors, nc, 640, quirk_640=True)
    theirs = ref.yolo_loss_multiscale(
        [torch.from_numpy(p) for p in preds],
        [torch.from_numpy(t) for t in tgts],
        [torch.from_numpy(a) for a in anchors], nc)
    for o, t in zip(ours, theirs):
        assert float(o) == pytest.approx(float(t), rel=1e-4, abs=1e-6)


def test_loss_quirk_flag_semantics():
    """quirk_640 off == on at 640 (the quirk is only observable away from
    640); away from 640 the two paths genuinely differ, and quirk-on
    ignores img_size entirely — exactly the reference's behavior."""
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.config import DEFAULT_ANCHORS
    from yolo_from_scratch_tpu.ops.losses import yolo_loss_multiscale

    rng = np.random.default_rng(9)
    preds, tgts = [], []
    for g in (16, 8, 4):
        p, t = _random_pred_target(rng, g, 1, n_obj=4)
        preds.append(jnp.asarray(p))
        tgts.append(jnp.asarray(t))
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    loss = lambda size, quirk: float(yolo_loss_multiscale(
        preds, tgts, anchors, 1, size, quirk_640=quirk)[0])
    assert loss(640, True) == pytest.approx(loss(640, False), rel=1e-6)
    # quirk on ignores img_size entirely: identical to the 640 value
    assert loss(1280, True) == pytest.approx(loss(640, True), rel=1e-6)
    assert abs(loss(1280, False) - loss(1280, True)) > 1e-5


@pytest.mark.parametrize("img_size,nc", [(416, 1), (640, 80), (1280, 3)])
def test_target_assignment_parity_fuzz(ref, tmp_path, img_size, nc):
    """Same image + labels through both datasets at every resolution and
    class count -> identical dense targets at all three scales."""
    from PIL import Image

    from yolo_from_scratch_tpu.data.dataset import YoloDataset

    rng = np.random.default_rng(img_size + nc)
    d = tmp_path / f"{img_size}_{nc}"
    (d / "images").mkdir(parents=True)
    (d / "labels").mkdir()
    arr = (rng.random((img_size // 2, img_size, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(d / "images" / "x.png")
    lines = []
    for _ in range(8):
        w, h = rng.uniform(0.03, 0.5, 2)
        cx = rng.uniform(w / 2, 1 - w / 2)
        cy = rng.uniform(h / 2, 1 - h / 2)
        lines.append(f"{int(rng.integers(0, nc))} {cx:.6f} {cy:.6f} "
                     f"{w:.6f} {h:.6f}")
    (d / "labels" / "x.txt").write_text("\n".join(lines))

    ours_ds = YoloDataset(str(d / "images"), num_classes=nc,
                          img_size=img_size, backend="pil")
    img_o, tgts_o = ours_ds[0]
    ref_ds = ref.YOLODataset(str(d / "images"), num_classes=nc,
                             img_size=img_size)
    img_r, tgts_r = ref_ds[0]
    np.testing.assert_allclose(
        img_o, img_r.permute(1, 2, 0).numpy(), atol=1e-6)
    for o, r in zip(tgts_o, tgts_r):
        np.testing.assert_allclose(o, r.numpy(), atol=1e-6)
