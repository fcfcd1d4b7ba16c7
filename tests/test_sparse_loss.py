"""Sparse (gather-based) loss == dense loss on the dense maps built from
the same labels (ops/losses_sparse.py vs data/assign_device.py +
ops/losses.py). Differences are float-summation-order only.

Test style mirrors test_assign_device.py: random labels with forced
slot collisions, padding rows, and out-of-range classes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.data.assign_device import (
    assign_targets_device_masked_batch,
)
from yolo_from_scratch_tpu.ops.losses import yolo_loss_multiscale
from yolo_from_scratch_tpu.ops.losses_sparse import (
    yolo_loss_multiscale_sparse,
)

B, K = 3, 16


def _random_batch(nc, img_size, seed=0, with_collisions=True):
    """(preds, labels, valid) with a few deliberate same-slot collisions
    and padding rows."""
    rng = np.random.default_rng(seed)
    cfg = YoloConfig(num_classes=nc, img_size=img_size)
    preds = [
        jnp.asarray(rng.standard_normal((B, g, g, 3, 5 + nc)), jnp.float32)
        for g in cfg.grid_sizes
    ]
    labels = np.zeros((B, K, 5), np.float32)
    counts = rng.integers(3, K, size=B)
    for b in range(B):
        n = counts[b]
        labels[b, :n, 0] = rng.integers(0, nc, size=n)
        labels[b, :n, 1:3] = rng.uniform(0.05, 0.95, size=(n, 2))
        labels[b, :n, 3:5] = rng.uniform(0.03, 0.4, size=(n, 2))
        if with_collisions and n >= 4:
            labels[b, 2] = labels[b, 1]  # exact duplicate -> same slot
            labels[b, 3, 1:] = labels[b, 0, 1:]  # same box, other class
    valid = np.arange(K)[None, :] < counts[:, None]
    return cfg, preds, jnp.asarray(labels), jnp.asarray(valid)


def _dense_loss(cfg, preds, labels, valid, quirk):
    targets = assign_targets_device_masked_batch(
        labels, valid, cfg.anchors_array, cfg.img_size, cfg.num_classes)
    return yolo_loss_multiscale(
        preds, targets, cfg.anchors_array, cfg.num_classes, cfg.img_size,
        quirk_640=quirk)


def _sparse_loss(cfg, preds, labels, valid, quirk):
    return yolo_loss_multiscale_sparse(
        preds, labels, valid, cfg.anchors_array, cfg.num_classes,
        cfg.img_size, quirk_640=quirk)


@pytest.mark.parametrize("nc,img_size", [(1, 128), (3, 128), (80, 128)])
@pytest.mark.parametrize("quirk", [False, True])
def test_sparse_matches_dense(nc, img_size, quirk):
    cfg, preds, labels, valid = _random_batch(nc, img_size)
    dense = _dense_loss(cfg, preds, labels, valid, quirk)
    sparse = _sparse_loss(cfg, preds, labels, valid, quirk)
    for name, d, s in zip(("total", "bbox", "obj", "cls"), dense, sparse):
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(s), rtol=2e-5, atol=1e-6,
            err_msg=f"{name} diverged (nc={nc}, quirk={quirk})")


def test_sparse_matches_dense_no_objects():
    cfg, preds, labels, _ = _random_batch(3, 128)
    valid = jnp.zeros((B, K), bool)
    dense = _dense_loss(cfg, preds, labels, valid, False)
    sparse = _sparse_loss(cfg, preds, labels, valid, False)
    for d, s in zip(dense, sparse):
        np.testing.assert_allclose(np.asarray(d), np.asarray(s),
                                   rtol=2e-5, atol=1e-6)


def test_sparse_out_of_range_class_rows():
    cfg, preds, labels, valid = _random_batch(3, 128, seed=1)
    labels = labels.at[:, 1, 0].set(99.0)  # out-of-range class id
    dense = _dense_loss(cfg, preds, labels, valid, False)
    sparse = _sparse_loss(cfg, preds, labels, valid, False)
    for d, s in zip(dense, sparse):
        np.testing.assert_allclose(np.asarray(d), np.asarray(s),
                                   rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("nc", [1, 80])
def test_sparse_gradients_match_dense(nc):
    cfg, preds, labels, valid = _random_batch(nc, 128, seed=2)

    def dtot(preds):
        return _dense_loss(cfg, preds, labels, valid, False)[0]

    def stot(preds):
        return _sparse_loss(cfg, preds, labels, valid, False)[0]

    gd = jax.grad(dtot)(preds)
    gs = jax.grad(stot)(preds)
    for s, (d, sp) in enumerate(zip(gd, gs)):
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(sp), rtol=1e-4, atol=1e-7,
            err_msg=f"grad diverged at scale {s} (nc={nc})")


def test_compact_trainer_sparse_matches_dense():
    """Two jitted compact train steps — dense transport vs sparse loss —
    stay parameter-equivalent over a few steps (same data, same init)."""
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_train_step_multi_compact,
    )

    cfg = YoloConfig(num_classes=3, img_size=128, width_mult=0.25,
                     depth_mult=0.33)
    rng = np.random.default_rng(0)
    n_steps, batch = 2, 2
    images = rng.random((n_steps, batch, 128, 128, 3)).astype(np.float32)
    labels = np.zeros((n_steps, batch, 8, 5), np.float32)
    labels[..., 0] = rng.integers(0, 3, labels.shape[:-1])
    labels[..., 1:3] = rng.uniform(0.2, 0.8, labels.shape[:-1] + (2,))
    labels[..., 3:5] = rng.uniform(0.05, 0.3, labels.shape[:-1] + (2,))
    counts = np.full((n_steps, batch), 5, np.int32)

    outs = {}
    for sparse in (False, True):
        model_i, tx_i, state = create_train_state(jax.random.PRNGKey(0),
                                                  cfg, 1e-3)
        step = make_train_step_multi_compact(
            model_i, tx_i, cfg, donate=False, sparse_loss=sparse)
        state, metrics = step(state, jnp.asarray(images),
                              jnp.asarray(labels), jnp.asarray(counts))
        outs[sparse] = (state, metrics)

    # Adam normalizes each gradient coordinate (bias-corrected m/sqrt(v)
    # has magnitude ~1 whatever the gradient size), so the two paths'
    # float-summation-order differences become full ±lr direction flips
    # on parameters whose true gradient is ~0 — the analytic worst case
    # is 2*lr per step, not a numerical-parity tolerance (the grad tests
    # above pin the real equivalence at rtol 1e-4).
    sd, ss = outs[False][0], outs[True][0]
    for pd, ps in zip(jax.tree.leaves(sd.params), jax.tree.leaves(ss.params)):
        np.testing.assert_allclose(np.asarray(pd), np.asarray(ps),
                                   atol=n_steps * 2.1e-3)
    md, ms = outs[False][1], outs[True][1]
    np.testing.assert_allclose(float(md["loss"]), float(ms["loss"]),
                               rtol=1e-4, atol=1e-6)
