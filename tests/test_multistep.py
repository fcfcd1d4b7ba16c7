"""Scanned multi-step trainer: N updates per dispatch must equal N
individual dispatches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.train.steps import (
    create_train_state,
    make_train_step,
    make_train_step_multi,
    set_learning_rate,
)


def test_multi_step_matches_sequential(cfg, shared_train_setup):
    model, tx, state0, single = shared_train_setup
    state0 = set_learning_rate(state0, 1e-3)
    multi = make_train_step_multi(model, tx, cfg, donate=False)

    rng = np.random.default_rng(0)
    n = 3
    images = rng.random((n, 2, cfg.img_size, cfg.img_size, 3)).astype(
        np.float32
    )
    tgts = [np.zeros((n, 2, g, g, 3, 6), np.float32) for g in cfg.grid_sizes]
    tgts[0][:, :, 4, 4, 0] = [0.28, 0.28, 0.1, 0.1, 1.0, 1.0]

    # sequential
    s = state0
    losses = []
    for k in range(n):
        s, m = single(s, jnp.asarray(images[k]),
                      [jnp.asarray(t[k]) for t in tgts])
        losses.append(float(m["loss"]))

    # scanned
    s2, m2 = multi(state0, jnp.asarray(images), *[jnp.asarray(t) for t in tgts])

    assert float(m2["loss"]) == pytest.approx(np.mean(losses), rel=1e-4)
    assert int(s2.step) == n
    # Exact param equality across the two compilations is unattainable:
    # Adam's m/sqrt(v) is scale-invariant, so on near-zero-gradient leaves
    # ulp-level fusion differences flip updates at full lr scale. Bound the
    # divergence by the theoretical max update magnitude (~lr per step).
    max_dev = 3 * 2e-3  # n steps x ~2x lr (bias-corrected Adam early steps)
    for a, b in zip(jax.tree.leaves(jax.device_get(s.params)),
                    jax.tree.leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=max_dev)


def test_multi_step_uint8_staging_matches_f32(cfg, shared_train_setup):
    """uint8-staged scanned epochs (the bench/stream staging format) must
    equal f32 staging of the same content: both the host loader and the
    in-step normalize multiply by the same f32 reciprocal
    (config.INV255), so the conv inputs are bit-identical. (A /255.0 on
    either side breaks this: XLA strength-reduces a constant divide to a
    reciprocal-multiply ~1 ulp off numpy's true divide.)"""
    model, tx, state0, _ = shared_train_setup
    state0 = set_learning_rate(state0, 1e-3)
    multi = make_train_step_multi(model, tx, cfg, donate=False)

    rng = np.random.default_rng(1)
    n = 2
    images_u8 = rng.integers(
        0, 256, (n, 2, cfg.img_size, cfg.img_size, 3), dtype=np.uint8
    )
    tgts = [np.zeros((n, 2, g, g, 3, 6), np.float32) for g in cfg.grid_sizes]
    tgts[0][:, :, 4, 4, 0] = [0.28, 0.28, 0.1, 0.1, 1.0, 1.0]
    tj = [jnp.asarray(t) for t in tgts]

    from yolo_from_scratch_tpu.config import INV255

    s_f32, m_f32 = multi(
        state0, jnp.asarray(images_u8.astype(np.float32) * INV255), *tj
    )
    s_u8, m_u8 = multi(state0, jnp.asarray(images_u8), *tj)

    assert float(m_u8["loss"]) == pytest.approx(float(m_f32["loss"]), rel=1e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(s_f32.params)),
                    jax.tree.leaves(jax.device_get(s_u8.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
