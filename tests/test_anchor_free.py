"""Anchor-free decoupled head (BASELINE config 5 stretch): model, decode,
assignment, loss, training step, and predict through the shared NMS API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.models.anchor_free import (
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
    # 4 box + nc class channels, one prediction per cell
    assert outs[0].shape == (2, 16, 16, 7)
    assert outs[1].shape == (2, 8, 8, 7)
    assert outs[2].shape == (2, 4, 4, 7)


def test_decode_geometry():
    raw = np.zeros((1, 4, 4, 6), np.float32)
    raw[0, 1, 2, 0:4] = [1.0, 1.0, 1.0, 1.0]  # softplus(1) ~ 1.3133 strides
    out = np.asarray(decode_anchor_free(jnp.asarray(raw), 32, 128))
    sp1 = np.log1p(np.exp(1.0))
    # cell (row 1, col 2), stride 32, img 128: center = ((2.5*32)/128, (1.5*32)/128)
    assert out[0, 1, 2, 0] == pytest.approx(2.5 * 32 / 128, abs=1e-5)
    assert out[0, 1, 2, 1] == pytest.approx(1.5 * 32 / 128, abs=1e-5)
    assert out[0, 1, 2, 2] == pytest.approx(2 * sp1 * 32 / 128, abs=1e-4)
    # class logits pass through
    np.testing.assert_array_equal(out[..., 4:], raw[..., 4:])


def test_decode_boxes_positive():
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 6)), jnp.float32)
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
        jnp.asarray(rng.normal(0, 1, (2, g, g, 7)), jnp.float32)
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
