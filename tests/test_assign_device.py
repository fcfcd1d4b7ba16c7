"""On-device target assignment (data/assign_device.py) vs the host path.

The device assignment must be bit-identical to data/dataset.assign_targets
— same shape-only anchor match (reference: train.py:108-131), same
truncate+clamp grid cell (train.py:184-189), same sequential first-GT-wins
slot rule (train.py:193), same class one-hot layout (train.py:201-205).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.data.assign_device import (
    assign_targets_device,
    assign_targets_device_batch,
    pack_labels,
)
from yolo_from_scratch_tpu.data.dataset import assign_targets


def _random_labels(rng, n, num_classes):
    boxes = np.stack(
        [
            rng.uniform(0.05, 0.95, n),
            rng.uniform(0.05, 0.95, n),
            rng.uniform(0.01, 0.6, n),
            rng.uniform(0.01, 0.6, n),
        ],
        axis=1,
    ).astype(np.float32)
    cls = rng.integers(0, num_classes, n)
    return boxes, cls


def _host(boxes, cls, cfg):
    return assign_targets(boxes, cls, cfg.anchors_array, cfg.img_size,
                          cfg.num_classes)


def _device(boxes, cls, cfg, capacity=16):
    labels, counts = pack_labels([boxes], [cls], capacity)
    out = assign_targets_device(
        jnp.asarray(labels[0]), jnp.asarray(counts[0]), cfg.anchors_array,
        cfg.img_size, cfg.num_classes,
    )
    return [np.asarray(t) for t in out]


@pytest.mark.parametrize("num_classes,img_size", [(1, 128), (5, 128),
                                                  (80, 256)])
def test_parity_random(num_classes, img_size):
    cfg = YoloConfig(num_classes=num_classes, img_size=img_size)
    rng = np.random.default_rng(0)
    for trial in range(5):
        boxes, cls = _random_labels(rng, int(rng.integers(0, 12)),
                                    num_classes)
        host = _host(boxes, cls, cfg)
        dev = _device(boxes, cls, cfg)
        for h, d in zip(host, dev):
            np.testing.assert_array_equal(h, d)


def test_first_wins_duplicate_slot():
    """Two GTs that land on the SAME (scale, cell, anchor) slot: the first
    (file order) must win, exactly as the host/reference rule."""
    cfg = YoloConfig(num_classes=3, img_size=128)
    # identical wh -> same anchor; nearly identical centers -> same cell
    boxes = np.array(
        [[0.503, 0.503, 0.2, 0.2], [0.504, 0.504, 0.2, 0.2]], np.float32
    )
    cls = np.array([1, 2])
    host = _host(boxes, cls, cfg)
    dev = _device(boxes, cls, cfg)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h, d)
    # and the winner is class 1 (the first box)
    occupied = [t[t[..., 4] > 0] for t in host if (t[..., 4] > 0).any()]
    assert len(occupied) == 1 and occupied[0].shape[0] == 1
    assert occupied[0][0, 5 + 1] == 1.0 and occupied[0][0, 5 + 2] == 0.0


def test_out_of_range_centers_clamped():
    """Malformed labels (untrusted input): centers outside [0,1) clamp to
    the grid on both paths."""
    cfg = YoloConfig(num_classes=1, img_size=128)
    boxes = np.array(
        [[-0.4, 0.5, 0.1, 0.1], [1.7, 0.99, 0.3, 0.3]], np.float32
    )
    cls = np.array([0, 0])
    host = _host(boxes, cls, cfg)
    dev = _device(boxes, cls, cfg)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h, d)


def test_empty_and_padding_rows_ignored():
    cfg = YoloConfig(num_classes=5, img_size=128)
    labels = np.zeros((8, 5), np.float32)
    labels[3:] = 7.7  # garbage beyond count
    out = assign_targets_device(
        jnp.asarray(labels), jnp.asarray(0, jnp.int32), cfg.anchors_array,
        cfg.img_size, cfg.num_classes,
    )
    for t in out:
        assert float(np.abs(np.asarray(t)).sum()) == 0.0


def test_batched_matches_single_and_jits():
    cfg = YoloConfig(num_classes=5, img_size=128)
    rng = np.random.default_rng(1)
    boxes_list, cls_list = zip(
        *[_random_labels(rng, int(rng.integers(1, 10)), 5) for _ in range(4)]
    )
    labels, counts = pack_labels(list(boxes_list), list(cls_list), 16)

    fn = jax.jit(
        lambda lab, cnt: assign_targets_device_batch(
            lab, cnt, cfg.anchors_array, cfg.img_size, cfg.num_classes
        )
    )
    batched = fn(jnp.asarray(labels), jnp.asarray(counts))
    for b in range(4):
        host = _host(boxes_list[b], cls_list[b], cfg)
        for h, d in zip(host, batched):
            np.testing.assert_array_equal(h, np.asarray(d[b]))


def test_capacity_truncation_keeps_first_k():
    """More GTs than capacity: the first K (file order) are kept — the
    same boxes the host path would have assigned first."""
    cfg = YoloConfig(num_classes=1, img_size=128)
    rng = np.random.default_rng(2)
    boxes, cls = _random_labels(rng, 9, 1)
    host = _host(boxes[:4], cls[:4], cfg)
    dev = _device(boxes, cls, cfg, capacity=4)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h, d)


def test_compact_trainer_matches_dense(tmp_path):
    """One scanned step through make_train_step_multi_compact (uint8
    images + compact labels) lands on the same loss as the dense trainer
    fed host-assigned targets of the same data."""
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_train_step_multi,
        make_train_step_multi_compact,
        set_learning_rate,
    )

    cfg = YoloConfig(num_classes=2, img_size=128)
    rng = np.random.default_rng(3)
    batch, n_scan = 2, 2
    imgs_u8 = rng.integers(0, 256, (n_scan, batch, 128, 128, 3)).astype(
        np.uint8
    )
    boxes_list, cls_list, dense = [], [], []
    for i in range(n_scan * batch):
        b, c = _random_labels(rng, 3, 2)
        boxes_list.append(b)
        cls_list.append(c)
        dense.append(_host(b, c, cfg))
    labels, counts = pack_labels(boxes_list, cls_list, 8)
    labels = labels.reshape(n_scan, batch, 8, 5)
    counts = counts.reshape(n_scan, batch)
    t3, t4, t5 = (
        np.stack([d[s] for d in dense]).reshape(
            (n_scan, batch) + dense[0][s].shape
        )
        for s in range(3)
    )
    imgs_f32 = imgs_u8.astype(np.float32) / 255.0

    model, tx, state0 = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3,
                                           batch_size=1)
    dense_step = make_train_step_multi(model, tx, cfg, donate=False)
    compact_step = make_train_step_multi_compact(model, tx, cfg,
                                                 donate=False)
    state0 = set_learning_rate(state0, 1e-3)

    _, m_dense = dense_step(state0, jnp.asarray(imgs_f32), jnp.asarray(t3),
                            jnp.asarray(t4), jnp.asarray(t5))
    _, m_compact = compact_step(state0, jnp.asarray(imgs_u8),
                                jnp.asarray(labels), jnp.asarray(counts))
    # inputs are bit-identical (target parity is pinned exactly above);
    # the residual is f32 fusion-order noise between two structurally
    # different XLA programs, amplified once through the sequential
    # param update of the 2-step scan (observed ~5e-5 rel on CPU)
    np.testing.assert_allclose(float(m_dense["loss"]),
                               float(m_compact["loss"]), rtol=5e-4)


def test_streaming_compact_path_on_2d_mesh(tmp_path):
    """The full product streaming path (--compact-targets): a
    DataLoader(compact=K) batch rides the DeviceQueue onto a 2-D
    data x space mesh (labels/counts must shard batch-only —
    parallel.mesh.batch_sharding_for — while images still split rows on
    `space`) and one step of make_train_step(compact_targets=True) lands
    on the dense streaming step's loss."""
    from yolo_from_scratch_tpu.data.device_queue import DeviceQueue
    from yolo_from_scratch_tpu.data.loader import DataLoader
    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.parallel.mesh import make_mesh_2d
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_train_step,
        set_learning_rate,
    )
    from yolo_from_scratch_tpu.utils.synth import make_dataset

    make_dataset(str(tmp_path), 4, 1, 128, seed=0, num_classes=2)
    cfg = YoloConfig(num_classes=2, img_size=128, width_mult=0.25,
                     depth_mult=0.33)
    ds = lambda: YoloDataset(f"{tmp_path}/train/images", 2,
                             cfg.anchors_array, img_size=128, backend="pil")
    mesh = make_mesh_2d(2)  # 4 data x 2 space over the virtual 8-CPU mesh

    model, tx, state0 = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3,
                                           batch_size=1)
    state0 = set_learning_rate(state0, 1e-3)
    losses = {}
    for mode, compact in (("dense", 0), ("compact", 8)):
        step = make_train_step(model, tx, cfg, donate=False,
                               compact_targets=bool(compact))
        loader = DataLoader(ds(), batch_size=4, compact=compact)
        for images, targets, valid in DeviceQueue(loader, mesh):
            assert valid == 4
            _, metrics = step(state0, images, targets)
            losses[mode] = float(metrics["loss"])
    np.testing.assert_allclose(losses["compact"], losses["dense"],
                               rtol=1e-5)


def test_compact_eval_step_matches_dense():
    """make_eval_step(compact_targets=True) on uint8 images + compact
    labels reproduces the dense eval step's loss and exact TP/FP/FN
    counts (the inputs are bit-identical after on-device expansion)."""
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_eval_step,
    )

    cfg = YoloConfig(num_classes=2, img_size=128, width_mult=0.25,
                     depth_mult=0.33)
    rng = np.random.default_rng(4)
    batch = 2
    imgs_u8 = rng.integers(0, 256, (batch, 128, 128, 3)).astype(np.uint8)
    boxes_list, cls_list, dense = [], [], []
    for _ in range(batch):
        b, c = _random_labels(rng, 3, 2)
        boxes_list.append(b)
        cls_list.append(c)
        dense.append(_host(b, c, cfg))
    labels, counts = pack_labels(boxes_list, cls_list, 8)
    targets = [np.stack([d[s] for d in dense]) for s in range(3)]

    model, _, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3,
                                         batch_size=1)
    dense_step = make_eval_step(model, cfg)
    compact_step = make_eval_step(model, cfg, compact_targets=True)

    l1, tp1, fp1, fn1 = jax.device_get(dense_step(
        state.params, state.batch_stats,
        jnp.asarray(imgs_u8.astype(np.float32) / 255.0),
        [jnp.asarray(t) for t in targets],
    ))
    l2, tp2, fp2, fn2 = jax.device_get(compact_step(
        state.params, state.batch_stats, jnp.asarray(imgs_u8),
        (jnp.asarray(labels), jnp.asarray(counts)),
    ))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_array_equal(tp1, tp2)
    np.testing.assert_array_equal(fp1, fp2)
    np.testing.assert_array_equal(fn1, fn2)


def test_dataset_load_batch_compact(tmp_path):
    """YoloDataset.load_batch_compact labels reproduce the dense targets
    of load_batch through the device assignment."""
    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.utils.synth import make_dataset

    make_dataset(str(tmp_path), 4, 1, 128, seed=0, num_classes=3)
    cfg = YoloConfig(num_classes=3, img_size=128)
    ds = YoloDataset(f"{tmp_path}/train/images", 3, img_size=128,
                     backend="pil")
    imgs_u8, labels, counts = ds.load_batch_compact([0, 1, 2, 3],
                                                    capacity=16)
    assert imgs_u8.dtype == np.uint8
    imgs_dense, targets_dense = ds.load_batch([0, 1, 2, 3])
    np.testing.assert_allclose(imgs_u8.astype(np.float32) / 255.0,
                               imgs_dense, atol=1e-7)
    dev = assign_targets_device_batch(
        jnp.asarray(labels), jnp.asarray(counts), cfg.anchors_array,
        cfg.img_size, cfg.num_classes,
    )
    for h, d in zip(targets_dense, dev):
        np.testing.assert_array_equal(h, np.asarray(d))
