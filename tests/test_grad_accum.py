"""Gradient accumulation: n_accum micro-batches == one big batch (for the
all-cells BCE obj term; masked terms match when positives are balanced)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.train.steps import (
    create_train_state,
    make_train_step,
    make_train_step_accum,
    set_learning_rate,
)


def test_accum_grads_match_big_batch(cfg, shared_train_setup):
    """With identical micro-batches, accumulated update == single-batch
    update (denominators are equal across micro-batches)."""
    model, tx, state, single = shared_train_setup
    state = set_learning_rate(state, 1e-3)
    accum = make_train_step_accum(model, tx, cfg, n_accum=2, donate=False)

    rng = np.random.default_rng(0)
    img = rng.random((2, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    tgts = [np.zeros((2, g, g, 3, 6), np.float32) for g in cfg.grid_sizes]
    tgts[0][:, 4, 4, 0] = [0.28, 0.28, 0.1, 0.1, 1.0, 1.0]

    s1, m1 = single(state, jnp.asarray(img), [jnp.asarray(t) for t in tgts])

    imgs2 = jnp.asarray(np.stack([img, img]))
    t2 = [jnp.asarray(np.stack([t, t])) for t in tgts]
    s2, m2 = accum(state, imgs2, *t2)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_accum_step_counts_once(cfg):
    model, tx, state = create_train_state(jax.random.PRNGKey(1), cfg, 1e-3)
    state = set_learning_rate(state, 1e-3)
    accum = make_train_step_accum(model, tx, cfg, n_accum=3, donate=False)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((3, 1, cfg.img_size, cfg.img_size, 3)),
                       jnp.float32)
    tgts = [jnp.zeros((3, 1, g, g, 3, 6), jnp.float32) for g in cfg.grid_sizes]
    new_state, metrics = accum(state, imgs, *tgts)
    assert int(new_state.step) == 1  # one optimizer update
    assert np.isfinite(float(metrics["loss"]))
