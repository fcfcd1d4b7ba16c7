"""Coverage of the BASELINE.json workload configs + jit-vs-eager parity
and NaN-guarding (the framework's analogue of sanitizers — SURVEY.md §5.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.data.dataset import assign_targets
from yolo_from_scratch_tpu.infer.predict import default_topk
from yolo_from_scratch_tpu.models.yolo import init_model
from yolo_from_scratch_tpu.ops.losses import yolo_loss_multiscale

ANCHORS = YoloConfig().anchors_array


def test_config2_416_multiclass_shapes():
    """BASELINE config 2: 416x416, nc=5 — stride/anchor rescale path."""
    cfg = YoloConfig(num_classes=5, img_size=416, width_mult=0.25)
    assert cfg.grid_sizes == (52, 26, 13)
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    outs = model.apply(variables, jnp.zeros((1, 416, 416, 3)), train=False)
    assert outs[0].shape == (1, 52, 52, 3, 10)
    assert outs[2].shape == (1, 13, 13, 3, 10)


def test_config4_1280_capacity_planning():
    """BASELINE config 4: 1280² small-object regime — fixed-shape NMS
    capacity and target geometry (no model compile; shapes only)."""
    cfg = YoloConfig(num_classes=1, img_size=1280)
    assert cfg.grid_sizes == (160, 80, 40)
    # 3 * (160² + 80² + 40²) = 100,800 raw candidates -> capped static top-k
    assert default_topk(1280) == 4096
    boxes = np.array([[0.5, 0.5, 0.01, 0.01]], np.float32)  # tiny object
    targets = assign_targets(boxes, np.array([0]), ANCHORS, 1280, 1)
    assert targets[0].shape == (160, 160, 3, 6)
    assert targets[0][..., 4].sum() == 1.0  # tiny box lands on P3


def test_config3_coco80_head_and_predict():
    """BASELINE config 3: COCO-80 class count through model + NMS predict."""
    from PIL import Image

    from yolo_from_scratch_tpu.infer.predict import Predictor

    cfg = YoloConfig(num_classes=80, img_size=96, width_mult=0.25)
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    outs = model.apply(variables, jnp.zeros((1, 96, 96, 3)), train=False)
    assert outs[0].shape == (1, 12, 12, 3, 85)

    rng = np.random.default_rng(0)
    pil = Image.fromarray((rng.random((96, 96, 3)) * 255).astype(np.uint8))
    dets = Predictor(variables, cfg, conf_threshold=1e-4)(pil)
    for d in dets:
        assert 0 <= d[5] < 80


def test_jit_vs_eager_loss_parity(cfg, model_and_vars):
    """SURVEY.md §5.2: jit-vs-eager numerical parity on the loss path."""
    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, cfg.img_size, cfg.img_size, 3)),
                    jnp.float32)
    tgts = [jnp.zeros((1, g, g, 3, 6), jnp.float32) for g in cfg.grid_sizes]
    tgts[0] = tgts[0].at[:, 4, 4, 0].set(
        jnp.asarray([0.28, 0.28, 0.1, 0.1, 1.0, 1.0])
    )
    anchors = cfg.anchors_array

    def loss(variables, x):
        preds = model.apply(variables, x, train=False)
        return yolo_loss_multiscale(preds, tgts, anchors, 1, cfg.img_size)[0]

    jitted = float(jax.jit(loss)(variables, x))
    with jax.disable_jit():
        eager = float(loss(variables, x))
    assert jitted == pytest.approx(eager, rel=1e-4)


def test_nan_guard_debug_nans(cfg, model_and_vars):
    """The loss path raises under jax_debug_nans when fed NaN input —
    the NaN guard actually guards."""
    model, variables = model_and_vars
    x = jnp.full((1, cfg.img_size, cfg.img_size, 3), jnp.nan)
    tgts = [jnp.zeros((1, g, g, 3, 6), jnp.float32) for g in cfg.grid_sizes]
    anchors = cfg.anchors_array

    @jax.jit
    def loss(variables, x):
        preds = model.apply(variables, x, train=False)
        return yolo_loss_multiscale(preds, tgts, anchors, 1, cfg.img_size)[0]

    with jax.debug_nans(True):
        with pytest.raises(Exception):
            float(loss(variables, x))


def test_clean_input_no_nans_under_guard(cfg, model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, cfg.img_size, cfg.img_size, 3)),
                    jnp.float32)
    tgts = [jnp.zeros((1, g, g, 3, 6), jnp.float32) for g in cfg.grid_sizes]
    tgts[1] = tgts[1].at[:, 2, 2, 1].set(
        jnp.asarray([0.3, 0.3, 0.2, 0.3, 1.0, 1.0])
    )
    anchors = cfg.anchors_array

    @jax.jit
    def loss(variables, x):
        preds = model.apply(variables, x, train=False)
        return yolo_loss_multiscale(preds, tgts, anchors, 1, cfg.img_size)[0]

    with jax.debug_nans(True):
        val = float(loss(variables, x))
    assert np.isfinite(val)
