"""Checkpoint schema + roundtrip tests (reference checkpoint contract:
train.py:1533-1540, loaded at 1410/1431/1456)."""

import jax
import numpy as np
import pytest

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.models.yolo import init_model
from yolo_from_scratch_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def saved(tmp_path_factory, cfg):
    _, variables = init_model(jax.random.PRNGKey(0), cfg)
    path = tmp_path_factory.mktemp("ckpt") / "model.ckpt"
    save_checkpoint(path, jax.device_get(variables), cfg, epoch=7)
    return path, variables, cfg


def test_roundtrip_params_identical(saved):
    path, variables, cfg = saved
    loaded, cfg2, meta = load_checkpoint(path)
    orig = jax.tree.leaves(jax.device_get(variables))
    back = jax.tree.leaves(loaded)
    assert len(orig) == len(back)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_schema_fields(saved):
    path, _, cfg = saved
    _, cfg2, meta = load_checkpoint(path)
    assert cfg2.num_classes == cfg.num_classes
    assert cfg2.img_size == cfg.img_size
    assert cfg2.width_mult == cfg.width_mult
    assert cfg2.depth_mult == cfg.depth_mult
    assert meta["epoch"] == 7
    np.testing.assert_array_equal(cfg2.anchors_array, cfg.anchors_array)


def test_loaded_model_same_outputs(saved):
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.models.yolo import YOLO

    path, variables, cfg = saved
    loaded, cfg2, _ = load_checkpoint(path)
    model = YOLO(cfg2)
    x = jnp.ones((1, cfg.img_size, cfg.img_size, 3)) * 0.5
    out_orig = model.apply(jax.device_get(variables), x, train=False)
    out_load = model.apply(loaded, x, train=False)
    for a, b in zip(out_orig, out_load):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_custom_anchors_roundtrip(tmp_path):
    anchors = (
        ((5, 6), (7, 8), (9, 10)),
        ((20, 21), (22, 23), (24, 25)),
        ((50, 51), (52, 53), (54, 55)),
    )
    cfg = YoloConfig(num_classes=2, img_size=96, width_mult=0.25,
                     anchors=anchors)
    _, variables = init_model(jax.random.PRNGKey(0), cfg)
    p = tmp_path / "a.ckpt"
    save_checkpoint(p, jax.device_get(variables), cfg)
    _, cfg2, _ = load_checkpoint(p)
    np.testing.assert_array_equal(cfg2.anchors_array,
                                  np.asarray(anchors, np.float32))


def test_checkpoint_write_is_atomic(tmp_path, cfg):
    """save_checkpoint must not leave a truncated file if interrupted —
    it writes to a temp file and os.replace()s. Verify the temp protocol:
    after a successful save no .tmp remains and the file loads."""
    import jax

    from yolo_from_scratch_tpu.models.yolo import init_model

    _, variables = init_model(jax.random.PRNGKey(0), cfg)
    p = tmp_path / "atomic.ckpt"
    save_checkpoint(p, jax.device_get(variables), cfg, epoch=1)
    save_checkpoint(p, jax.device_get(variables), cfg, epoch=2)  # overwrite
    assert not (tmp_path / "atomic.ckpt.tmp").exists()
    _, _, meta = load_checkpoint(p)
    assert meta["epoch"] == 2


def test_none_bias_checkpoint_repaired_with_warning(cfg, tmp_path, capsys):
    """A checkpoint missing a detection-head bias is repaired on load with
    the objectness-prior init + a warning (reference behavior:
    train.py:543-549, tests/test_model.py:226-246)."""
    import math

    import numpy as np

    from yolo_from_scratch_tpu.models.yolo import init_model

    _, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = jax.device_get(variables["params"])
    del params["head_p3"]["pred"]["bias"]
    p = tmp_path / "nobias.ckpt"
    save_checkpoint(
        p, {"params": params,
            "batch_stats": jax.device_get(variables["batch_stats"])}, cfg
    )
    restored, cfg2, _ = load_checkpoint(p)
    out = capsys.readouterr().out
    assert "Warning: Detection head bias was None" in out
    bias = np.asarray(restored["params"]["head_p3"]["pred"]["bias"])
    assert bias.shape == (3 * (5 + cfg.num_classes),)
    prior = -math.log((1.0 - 0.01) / 0.01)
    per_anchor = bias.reshape(3, 5 + cfg.num_classes)
    np.testing.assert_allclose(per_anchor[:, 4], prior, rtol=1e-6)
    assert (per_anchor[:, :4] == 0).all() and (per_anchor[:, 5:] == 0).all()
