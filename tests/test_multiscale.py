"""Multi-scale training (fit(multi_scale=...)) — epoch-rotated
resolution buckets, one compiled step per bucket, one shared TrainState.

No reference analogue (the reference trains at one fixed size); the
contract tested is the framework's own: the fully-convolutional
parameter tree is size-independent, every bucket's epoch produces
finite losses, and the saved checkpoint carries the BASE img_size.
"""

import jax
import numpy as np
import pytest

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.data.dataset import YoloDataset
from yolo_from_scratch_tpu.data.loader import DataLoader
from yolo_from_scratch_tpu.models.yolo import YOLO
from yolo_from_scratch_tpu.train.loop import fit
from yolo_from_scratch_tpu.train.steps import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

SIZES = (64, 96)


@pytest.fixture(scope="module")
def ms_setup(temp_dataset_dir):
    cfg = YoloConfig(num_classes=1, img_size=SIZES[-1], width_mult=0.25,
                     depth_mult=0.33)
    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3)
    schedule = []
    for s in SIZES:
        cfg_s = cfg.with_(img_size=s)
        ds = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                         img_size=s)
        loader = DataLoader(ds, batch_size=5, prefetch=0)
        step = make_train_step(YOLO(cfg_s) if s != cfg.img_size else model,
                               tx, cfg_s, donate=False)
        schedule.append((step, loader))
    val = DataLoader(
        YoloDataset(str(temp_dataset_dir / "val" / "images"), 1,
                    img_size=cfg.img_size), batch_size=5, prefetch=0)
    return cfg, model, tx, state, schedule, val


def test_multi_scale_fit_covers_buckets(ms_setup, tmp_path, capsys):
    """Two epochs over two buckets: both sizes train, losses finite,
    checkpoint stores the base img_size and loads back."""
    cfg, model, tx, state, schedule, val = ms_setup
    eval_step = make_eval_step(model, cfg)
    ckpt = tmp_path / "ms.ckpt"
    logs = []
    state, path = fit(
        state, schedule[-1][0], eval_step, schedule[-1][1], val, cfg,
        epochs=2, initial_lr=1e-3, save_path=str(ckpt),
        log=lambda m: logs.append(m), multi_scale=schedule,
    )
    assert len(logs) == 2
    for line in logs:
        loss = float(line.split("Loss: ")[1].split(" ")[0])
        assert np.isfinite(loss)

    from yolo_from_scratch_tpu.utils.checkpoint import load_checkpoint

    variables, cfg_loaded, _ = load_checkpoint(str(ckpt))
    assert cfg_loaded.img_size == cfg.img_size  # base size, not a bucket
    # the checkpoint params run at BOTH bucket sizes (fully convolutional)
    for s in SIZES:
        out = YOLO(cfg.with_(img_size=s)).apply(
            variables, np.zeros((1, s, s, 3), np.float32), train=False)
        assert out[0].shape[1] == s // 8


def test_multi_scale_param_tree_size_independent():
    """init at two sizes produces identical parameter trees."""
    base = dict(num_classes=1, width_mult=0.25, depth_mult=0.33)
    va = YOLO(YoloConfig(img_size=64, **base)).init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32),
        train=False)
    vb = YOLO(YoloConfig(img_size=96, **base)).init(
        jax.random.PRNGKey(0), np.zeros((1, 96, 96, 3), np.float32),
        train=False)
    sa = jax.tree.map(lambda a: a.shape, va["params"])
    sb = jax.tree.map(lambda a: a.shape, vb["params"])
    assert sa == sb
