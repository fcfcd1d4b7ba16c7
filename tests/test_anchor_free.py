"""Anchor-free decoupled head (BASELINE config 5 stretch): model, decode,
assignment, loss, training step, and predict through the shared NMS API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.models.anchor_free import (
    MAX_GT,
    REG_MAX,
    assign_targets_anchor_free,
    decode_anchor_free,
    yolo_loss_anchor_free,
)
from yolo_from_scratch_tpu.models.yolo import init_model


@pytest.fixture(scope="module")
def cfg_af():
    return YoloConfig(num_classes=3, img_size=128, width_mult=0.25,
                      head_type="anchor_free")


@pytest.fixture(scope="module")
def model_vars_af(cfg_af):
    return init_model(jax.random.PRNGKey(0), cfg_af)


def test_head_output_shapes(cfg_af, model_vars_af):
    model, variables = model_vars_af
    x = jnp.zeros((2, 128, 128, 3))
    outs = model.apply(variables, x, train=False)
    # 4*REG_MAX DFL distribution + nc class channels, one pred per cell
    d = 4 * REG_MAX + 3
    assert outs[0].shape == (2, 16, 16, d)
    assert outs[1].shape == (2, 8, 8, d)
    assert outs[2].shape == (2, 4, 4, d)


def test_decode_geometry():
    # one-hot DFL distributions: edge distance = the hot bin index
    raw = np.zeros((1, 4, 4, 4 * REG_MAX + 2), np.float32)
    for edge, k in enumerate((3, 1, 2, 5)):  # l, t, r, b in stride units
        raw[0, 1, 2, edge * REG_MAX + k] = 30.0  # ~delta distribution
    out = np.asarray(decode_anchor_free(jnp.asarray(raw), 32, 128))
    # cell (row 1, col 2), stride 32, img 128: center of the cell is
    # ((2.5*32)/128, (1.5*32)/128); box spans center -(l,t) .. +(r,b)
    su = 32 / 128
    cx, cy = 2.5 * su, 1.5 * su
    x1, y1, x2, y2 = cx - 3 * su, cy - 1 * su, cx + 2 * su, cy + 5 * su
    assert out[0, 1, 2, 0] == pytest.approx((x1 + x2) / 2, abs=1e-4)
    assert out[0, 1, 2, 1] == pytest.approx((y1 + y2) / 2, abs=1e-4)
    assert out[0, 1, 2, 2] == pytest.approx(x2 - x1, abs=1e-4)
    assert out[0, 1, 2, 3] == pytest.approx(y2 - y1, abs=1e-4)
    # class logits pass through
    np.testing.assert_array_equal(out[..., 4:], raw[..., 4 * REG_MAX:])
    # zero logits -> uniform distribution -> expectation (REG_MAX-1)/2
    raw0 = np.zeros((1, 4, 4, 4 * REG_MAX + 2), np.float32)
    out0 = np.asarray(decode_anchor_free(jnp.asarray(raw0), 32, 128))
    assert out0[0, 0, 0, 2] == pytest.approx((REG_MAX - 1) * su, abs=1e-4)


def test_decode_boxes_positive():
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 4 * REG_MAX + 2)),
                      jnp.float32)
    out = np.asarray(decode_anchor_free(raw, 8, 128))
    assert (out[..., 2] > 0).all() and (out[..., 3] > 0).all()


def test_assignment_by_size():
    boxes = np.array(
        [[0.3, 0.3, 0.05, 0.05],   # small -> P3
         [0.5, 0.5, 0.2, 0.2],     # medium -> P4
         [0.7, 0.7, 0.6, 0.6]],    # large -> P5
        np.float32,
    )
    tgts = assign_targets_anchor_free(boxes, np.array([0, 1, 0]), 128, 3)
    assert tgts[0].shape == (16, 16, 8)
    assert tgts[0][..., 4].sum() == 1.0
    assert tgts[1][..., 4].sum() == 1.0
    assert tgts[2][..., 4].sum() == 1.0
    # class one-hot for the P4 box (class 1)
    iy, ix = np.argwhere(tgts[1][..., 4] == 1.0)[0]
    assert tgts[1][iy, ix, 6] == 1.0


def test_loss_finite_and_grads(cfg_af):
    rng = np.random.default_rng(1)
    preds = [
        jnp.asarray(rng.normal(0, 1, (2, g, g, 4 * REG_MAX + 3)), jnp.float32)
        for g in (16, 8, 4)
    ]
    t = assign_targets_anchor_free(
        np.array([[0.5, 0.5, 0.2, 0.2]], np.float32), np.array([1]), 128, 3
    )
    tgts = [jnp.asarray(np.stack([x, x])) for x in t]
    total, bbox, cls = yolo_loss_anchor_free(preds, tgts, 3, 128)
    assert np.isfinite(float(total))

    g = jax.grad(
        lambda p: yolo_loss_anchor_free(p, tgts, 3, 128)[0]
    )(preds)
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
        assert np.abs(np.asarray(gi)).sum() > 0


def test_train_step_anchor_free(cfg_af, temp_dataset_multiclass):
    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.data.loader import DataLoader
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_train_step,
        set_learning_rate,
    )

    cfg = cfg_af
    ds = YoloDataset(str(temp_dataset_multiclass / "train" / "images"), 3,
                     img_size=cfg.img_size, head_type="anchor_free")
    loader = DataLoader(ds, batch_size=4, prefetch=0)
    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3)
    step = make_train_step(model, tx, cfg, donate=False)
    state = set_learning_rate(state, 1e-3)
    images, targets = next(iter(loader))
    assert targets[0].shape == (4, 16, 16, 8)
    state, metrics = step(state, jnp.asarray(images),
                          [jnp.asarray(t) for t in targets])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["obj"]) == 0.0  # folded into cls


def test_eval_step_anchor_free(cfg_af, temp_dataset_multiclass):
    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.data.loader import DataLoader
    from yolo_from_scratch_tpu.train.loop import eval_epoch
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_eval_step,
    )

    cfg = cfg_af
    ds = YoloDataset(str(temp_dataset_multiclass / "val" / "images"), 3,
                     img_size=cfg.img_size, head_type="anchor_free")
    loader = DataLoader(ds, batch_size=4, prefetch=0)
    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3)
    eval_step = make_eval_step(model, cfg)
    loss, p, r, f1 = eval_epoch(eval_step, state.params, state.batch_stats,
                                loader)
    assert np.isfinite(loss)
    for v in (p, r, f1):
        assert 0.0 <= v <= 100.0


def test_predict_anchor_free(cfg_af, model_vars_af, temp_dataset_multiclass):
    from yolo_from_scratch_tpu.infer.predict import Predictor

    _, variables = model_vars_af
    img = str(next((temp_dataset_multiclass / "val" / "images").glob("*.jpg")))
    dets = Predictor(variables, cfg_af, conf_threshold=1e-4)(img)
    assert len(dets) > 0
    for d in dets:
        assert len(d) == 6
        assert d[2] > d[0] and d[3] > d[1]
        assert 0 <= d[5] < 3


def test_checkpoint_roundtrip_anchor_free(cfg_af, model_vars_af, tmp_path):
    from yolo_from_scratch_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    _, variables = model_vars_af
    p = tmp_path / "af.ckpt"
    save_checkpoint(p, jax.device_get(variables), cfg_af, epoch=1)
    loaded, cfg2, meta = load_checkpoint(p)
    assert cfg2.head_type == "anchor_free"
    assert cfg2.num_classes == 3


def test_gather_gt_roundtrip():
    """The padded GT set extracted from the dense transport maps matches
    the original boxes/classes."""
    from yolo_from_scratch_tpu.models.anchor_free import _gather_gt

    boxes = np.array(
        [[0.3, 0.3, 0.05, 0.05], [0.5, 0.5, 0.2, 0.2], [0.7, 0.7, 0.6, 0.6]],
        np.float32,
    )
    cls_ids = np.array([0, 1, 2])
    t = assign_targets_anchor_free(boxes, cls_ids, 128, 3)
    tgts = [jnp.asarray(x[None]) for x in t]
    gt_boxes, gt_cls, gt_valid = _gather_gt(tgts, 3)
    assert gt_boxes.shape == (1, MAX_GT, 4)
    assert int(gt_valid.sum()) == 3
    got = {tuple(np.round(np.asarray(b), 4)) for b, v in
           zip(np.asarray(gt_boxes[0]), np.asarray(gt_valid[0])) if v}
    want = {tuple(np.round(b, 4)) for b in boxes}
    assert got == want
    for b, c, v in zip(np.asarray(gt_boxes[0]), np.asarray(gt_cls[0]),
                       np.asarray(gt_valid[0])):
        if v:
            i = [tuple(np.round(x, 4)) for x in boxes].index(
                tuple(np.round(b, 4)))
            assert c[cls_ids[i]] == 1.0


def test_tal_assigns_well_predicted_cell():
    """A cell inside the GT whose prediction matches the GT box and class
    must be assigned foreground with the top target score."""
    from yolo_from_scratch_tpu.models.anchor_free import (
        _anchor_points,
        tal_assign,
    )

    img = 128
    pts, _ = _anchor_points(img)
    a = pts.shape[0]
    nc = 2
    gt = np.zeros((1, MAX_GT, 4), np.float32)
    gt[0, 0] = [0.5, 0.5, 0.3, 0.3]
    gt_cls = np.zeros((1, MAX_GT, nc), np.float32)
    gt_cls[0, 0, 1] = 1.0
    gt_valid = np.zeros((1, MAX_GT), np.float32)
    gt_valid[0, 0] = 1.0

    # all cells predict a bad box except the one nearest the GT center
    pred_xyxy = np.tile(np.array([0.0, 0.0, 0.01, 0.01], np.float32),
                        (1, a, 1))
    scores = np.full((1, a, nc), 0.01, np.float32)
    best = int(np.argmin(np.sum((pts - [0.5, 0.5]) ** 2, axis=1)))
    pred_xyxy[0, best] = [0.35, 0.35, 0.65, 0.65]
    scores[0, best, 1] = 0.9

    out = tal_assign(jnp.asarray(scores), jnp.asarray(pred_xyxy),
                     jnp.asarray(pts), jnp.asarray(gt), jnp.asarray(gt_cls),
                     jnp.asarray(gt_valid))
    fg = np.asarray(out["fg"][0])
    assert fg[best] == 1.0
    ts = np.asarray(out["target_scores"][0])
    assert ts[best, 1] == ts[..., 1].max() > 0.5
    assert ts[:, 0].max() == 0.0  # only the GT's class gets mass
    tb = np.asarray(out["target_boxes"][0, best])
    np.testing.assert_allclose(tb, gt[0, 0], atol=1e-6)
    # candidate cap respected
    assert fg.sum() <= 10


def test_tal_no_gt_all_background():
    from yolo_from_scratch_tpu.models.anchor_free import (
        _anchor_points,
        tal_assign,
    )

    pts, _ = _anchor_points(64)
    a = pts.shape[0]
    out = tal_assign(
        jnp.full((1, a, 1), 0.5), jnp.zeros((1, a, 4)), jnp.asarray(pts),
        jnp.zeros((1, MAX_GT, 4)), jnp.zeros((1, MAX_GT, 1)),
        jnp.zeros((1, MAX_GT)),
    )
    assert float(out["fg"].sum()) == 0.0
    assert float(out["target_scores"].sum()) == 0.0


def test_dfl_loss_prefers_correct_bins():
    from yolo_from_scratch_tpu.models.anchor_free import _dfl_loss

    target = jnp.asarray([[2.0, 3.5, 0.0, 14.9]])
    good = np.zeros((1, 4, REG_MAX), np.float32)
    good[0, 0, 2] = 10.0
    good[0, 1, 3] = 10.0
    good[0, 1, 4] = 10.0  # 3.5 -> split between bins 3 and 4
    good[0, 2, 0] = 10.0
    good[0, 3, 15] = 10.0
    bad = np.roll(good, 5, axis=-1)
    l_good = float(_dfl_loss(jnp.asarray(good), target)[0])
    l_bad = float(_dfl_loss(jnp.asarray(bad), target)[0])
    assert l_good < l_bad


def test_tal_loss_learns_synthetic(cfg_af):
    """A few gradient steps on a fixed batch must reduce the TAL loss."""
    import optax

    rng = np.random.default_rng(0)
    preds_shapes = [(1, 16, 16, 4 * REG_MAX + 3), (1, 8, 8, 4 * REG_MAX + 3),
                    (1, 4, 4, 4 * REG_MAX + 3)]
    params = [jnp.asarray(rng.normal(0, 0.1, s), jnp.float32)
              for s in preds_shapes]
    t = assign_targets_anchor_free(
        np.array([[0.5, 0.5, 0.25, 0.25]], np.float32), np.array([1]), 128, 3
    )
    tgts = [jnp.asarray(x[None]) for x in t]

    def loss(ps):
        return yolo_loss_anchor_free(ps, tgts, 3, 128)[0]

    tx = optax.adam(0.05)
    opt = tx.init(params)
    l0 = float(loss(params))
    step = jax.jit(lambda ps, op: (lambda g: tx.update(g, op, ps))(
        jax.grad(loss)(ps)))
    for _ in range(20):
        updates, opt = step(params, opt)
        params = optax.apply_updates(params, updates)
    l1 = float(loss(params))
    assert l1 < l0 * 0.5, (l0, l1)


def test_af_loss_from_gt_matches_dense_transport(cfg_af):
    """Compact labels fed to yolo_loss_anchor_free_from_gt produce the
    same loss as the dense-transport wrapper on the same GTs (TAL is
    order-invariant over the GT set; only the padding layout differs)."""
    from yolo_from_scratch_tpu.data.assign_device import pack_labels
    from yolo_from_scratch_tpu.models.anchor_free import (
        yolo_loss_anchor_free_from_gt,
    )

    nc, img = cfg_af.num_classes, cfg_af.img_size
    rng = np.random.default_rng(0)
    b = 2
    boxes = [
        np.stack([
            rng.uniform(0.2, 0.8, 3), rng.uniform(0.2, 0.8, 3),
            rng.uniform(0.1, 0.4, 3), rng.uniform(0.1, 0.4, 3),
        ], axis=1).astype(np.float32)
        for _ in range(b)
    ]
    cls_ids = [rng.integers(0, nc, 3) for _ in range(b)]

    # plausible random predictions (same for both paths)
    key = jax.random.PRNGKey(1)
    preds = []
    for s in (8, 16, 32):
        g = img // s
        key, k = jax.random.split(key)
        preds.append(jax.random.normal(k, (b, g, g, 4 * REG_MAX + nc)))

    dense = [
        np.stack([assign_targets_anchor_free(bx, ci, img, nc)[s]
                  for bx, ci in zip(boxes, cls_ids)])
        for s in range(3)
    ]
    l_dense = yolo_loss_anchor_free(
        preds, [jnp.asarray(t) for t in dense], nc, img)

    labels, counts = pack_labels(boxes, cls_ids, 8)
    valid = (np.arange(8)[None] < counts[:, None])
    gt_cls = np.eye(nc, dtype=np.float32)[
        labels[..., 0].astype(int)] * valid[..., None]
    l_gt = yolo_loss_anchor_free_from_gt(
        preds, jnp.asarray(labels[..., 1:5]), jnp.asarray(gt_cls),
        jnp.asarray(valid.astype(np.float32)), nc, img)
    for a, c in zip(l_dense, l_gt):
        np.testing.assert_allclose(float(a), float(c), rtol=1e-5)


def test_af_compact_train_step_runs(cfg_af):
    """make_train_step(compact_targets=True) on the anchor-free head:
    compact labels feed TAL directly (no dense transport); with mosaic
    and label-level augmentation on, the step compiles and the loss is
    finite."""
    from yolo_from_scratch_tpu.data.assign_device import pack_labels
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_train_step,
        set_learning_rate,
    )

    rng = np.random.default_rng(2)
    imgs_u8 = rng.integers(0, 256, (4, 128, 128, 3)).astype(np.uint8)
    boxes = [np.array([[0.5, 0.5, 0.3, 0.3]], np.float32)] * 4
    cls = [np.array([1])] * 4
    labels, counts = pack_labels(boxes, cls, 8)

    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg_af,
                                          1e-3, batch_size=1)
    state = set_learning_rate(state, 1e-3)
    step = make_train_step(model, tx, cfg_af, donate=False,
                           compact_targets=True, device_mosaic=True,
                           device_augment="flip")
    _, metrics = step(state, jnp.asarray(imgs_u8),
                      (jnp.asarray(labels), jnp.asarray(counts)))
    assert np.isfinite(float(metrics["loss"]))


def test_af_grid_metric_ignores_dfl_logits():
    """Regression: confidence must come from the CLASS logits (after the
    4*REG_MAX DFL channels), not the distribution logits — a cell with
    hot DFL logits but strongly negative class logits is NOT a predicted
    positive."""
    from yolo_from_scratch_tpu.train.metrics import (
        grid_metric_counts_anchor_free,
    )

    nc, img, stride = 3, 128, 8
    g = img // stride
    pred = np.zeros((1, g, g, 4 * REG_MAX + nc), np.float32)
    pred[..., : 4 * REG_MAX] = 5.0   # sigmoid ~1 on every DFL logit
    pred[..., 4 * REG_MAX:] = -10.0  # class scores ~0 everywhere
    target = np.zeros((1, g, g, 4 + 1 + nc), np.float32)
    tp, fp, fn = grid_metric_counts_anchor_free(
        jnp.asarray(pred), jnp.asarray(target), stride, img)
    assert int(fp) == 0 and int(tp) == 0 and int(fn) == 0

    # and a genuinely confident class cell still counts
    target[0, 4, 4, 0:4] = [0.28, 0.28, 0.1, 0.1]
    target[0, 4, 4, 4] = 1.0
    pred[0, 4, 4, 4 * REG_MAX + 1] = 10.0
    tp, fp, fn = grid_metric_counts_anchor_free(
        jnp.asarray(pred), jnp.asarray(target), stride, img)
    assert int(tp) + int(fp) + int(fn) >= 1
    assert int(fp) <= 1  # only the one hot cell can be a predicted positive


def test_af_device_assignment_matches_host():
    """assign_targets_anchor_free_device == the host assignment on the
    same valid labels: same size-routed scale, truncating cell index,
    first-GT-wins collisions, padding rows ignored."""
    from yolo_from_scratch_tpu.data.assign_device import pack_labels
    from yolo_from_scratch_tpu.models.anchor_free import (
        assign_targets_anchor_free_device_batch,
    )

    nc, img = 5, 128
    rng = np.random.default_rng(3)
    b, k = 4, 8
    boxes, cls_ids = [], []
    for i in range(b):
        n = int(rng.integers(1, k))
        bx = np.stack([
            rng.uniform(0.05, 0.95, n), rng.uniform(0.05, 0.95, n),
            rng.uniform(0.02, 0.5, n), rng.uniform(0.02, 0.5, n),
        ], axis=1).astype(np.float32)
        if n >= 2:  # force a same-cell collision: first GT must win
            bx[1, :2] = bx[0, :2]
            bx[1, 2:] = bx[0, 2:]
        boxes.append(bx)
        cls_ids.append(rng.integers(0, nc, n))

    labels, counts = pack_labels(boxes, cls_ids, k)
    dev = assign_targets_anchor_free_device_batch(
        jnp.asarray(labels), jnp.asarray(counts), img, nc)
    for i in range(b):
        host = assign_targets_anchor_free(boxes[i], cls_ids[i], img, nc)
        for s in range(3):
            np.testing.assert_array_equal(np.asarray(dev[s][i]), host[s])


def test_af_compact_eval_step_matches_dense(cfg_af, model_vars_af):
    """make_eval_step(compact_targets=True) on the anchor-free head
    produces the same grid TP/FP/FN as the dense val path on identical
    images + GTs (the loss may differ: from_gt vs dense-transport keeps
    colliding GTs)."""
    from yolo_from_scratch_tpu.data.assign_device import pack_labels
    from yolo_from_scratch_tpu.train.steps import make_eval_step

    model, variables = model_vars_af
    nc, img = cfg_af.num_classes, cfg_af.img_size
    rng = np.random.default_rng(4)
    b = 2
    imgs_u8 = rng.integers(0, 256, (b, img, img, 3)).astype(np.uint8)
    imgs_f32 = imgs_u8.astype(np.float32) / 255.0
    boxes = [np.array([[0.4, 0.4, 0.2, 0.25], [0.7, 0.7, 0.08, 0.08]],
                      np.float32)] * b
    cls_ids = [np.array([1, 2])] * b

    dense = [
        jnp.asarray(np.stack([
            assign_targets_anchor_free(bx, ci, img, nc)[s]
            for bx, ci in zip(boxes, cls_ids)
        ]))
        for s in range(3)
    ]
    step_dense = make_eval_step(model, cfg_af)
    l_d, tp_d, fp_d, fn_d = step_dense(
        variables["params"], variables["batch_stats"],
        jnp.asarray(imgs_f32), dense)

    labels, counts = pack_labels(boxes, cls_ids, 8)
    step_c = make_eval_step(model, cfg_af, compact_targets=True)
    l_c, tp_c, fp_c, fn_c = step_c(
        variables["params"], variables["batch_stats"],
        jnp.asarray(imgs_u8), (jnp.asarray(labels), jnp.asarray(counts)))

    np.testing.assert_array_equal(np.asarray(tp_d), np.asarray(tp_c))
    np.testing.assert_array_equal(np.asarray(fp_d), np.asarray(fp_c))
    np.testing.assert_array_equal(np.asarray(fn_d), np.asarray(fn_c))
    assert np.isfinite(float(l_c))
