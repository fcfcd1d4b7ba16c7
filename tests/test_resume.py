"""Checkpoint-resume tests (new capability over the reference — SURVEY.md
§5.3: the reference saves every epoch but has no resume path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.train.loop import restore_train_state
from yolo_from_scratch_tpu.train.steps import (
    create_train_state,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)
from yolo_from_scratch_tpu.utils.checkpoint import save_checkpoint


def test_resume_restores_params_opt_state_epoch(cfg, tmp_path,
                                                shared_train_setup):
    model, tx, state, train_step = shared_train_setup
    state = set_learning_rate(state, 1e-3)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, cfg.img_size, cfg.img_size, 3)),
                         jnp.float32)
    targets = [jnp.zeros((2, g, g, 3, 6), jnp.float32) for g in cfg.grid_sizes]
    state, _ = train_step(state, images, targets)

    p = tmp_path / "resume.ckpt"
    save_checkpoint(
        p,
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
        cfg, epoch=4, opt_state=state.opt_state,
    )

    tx2 = make_optimizer(1e-3)
    restored, cfg2, start_epoch, _ = restore_train_state(p, tx2)
    assert start_epoch == 5
    assert cfg2.img_size == cfg.img_size

    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Adam moments restored exactly
    for a, b in zip(jax.tree.leaves(jax.device_get(state.opt_state)),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resumed_step_matches_uninterrupted(cfg, tmp_path,
                                             shared_train_setup):
    """step; save; restore; step == two uninterrupted steps."""
    model, tx, state, train_step = shared_train_setup
    state = set_learning_rate(state, 1e-3)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.random((2, cfg.img_size, cfg.img_size, 3)),
                         jnp.float32)
    targets = [jnp.zeros((2, g, g, 3, 6), jnp.float32) for g in cfg.grid_sizes]
    targets[0] = targets[0].at[:, 4, 4, 0].set(
        jnp.asarray([0.28, 0.28, 0.1, 0.1, 1.0, 1.0])
    )

    s1, _ = train_step(state, images, targets)
    s2_direct, m_direct = train_step(s1, images, targets)

    p = tmp_path / "mid.ckpt"
    save_checkpoint(
        p,
        {"params": jax.device_get(s1.params),
         "batch_stats": jax.device_get(s1.batch_stats)},
        cfg, epoch=0, opt_state=s1.opt_state,
    )
    restored, _, _, _ = restore_train_state(p, make_optimizer(1e-3))
    restored = set_learning_rate(restored, 1e-3)
    s2_resumed, m_resumed = train_step(restored, images, targets)

    assert float(m_direct["loss"]) == pytest.approx(
        float(m_resumed["loss"]), rel=1e-6
    )
    for a, b in zip(jax.tree.leaves(jax.device_get(s2_direct.params)),
                    jax.tree.leaves(jax.device_get(s2_resumed.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_resume_from_ema_checkpoint_uses_raw_params(cfg, tmp_path,
                                                    shared_train_setup):
    """EMA checkpoints hold averaged weights as 'model' but --resume must
    restore the RAW trajectory (matching the saved Adam moments) and the
    step counter."""
    import numpy as np

    from yolo_from_scratch_tpu.train.loop import restore_train_state

    model, tx, state, train_step = shared_train_setup
    raw = jax.device_get(state.params)
    fake_ema = jax.tree.map(lambda p: np.asarray(p) * 0.5, raw)
    p = tmp_path / "ema_resume.ckpt"
    save_checkpoint(
        p, {"params": fake_ema, "batch_stats": jax.device_get(state.batch_stats)},
        cfg, epoch=2, opt_state=state.opt_state,
        extra={"raw_params": raw, "step": 123,
               "raw_batch_stats": jax.device_get(state.batch_stats)},
    )
    restored, _, start, _ = restore_train_state(p, make_optimizer(1e-3))
    assert start == 3
    assert int(restored.step) == 123
    for a, b in zip(jax.tree.leaves(raw), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

def test_resume_returns_ema_vars_for_continuation(cfg, tmp_path,
                                                  shared_train_setup):
    """An EMA checkpoint's averaged deployment weights come back as
    ema_vars so fit(initial_ema=...) continues the average rather than
    re-pinning it to the raw resume-point snapshot (advisor finding)."""
    model, tx, state, train_step = shared_train_setup
    raw = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    fake_ema = jax.tree.map(lambda p: np.asarray(p) * 0.5, raw)
    p = tmp_path / "ema_cont.ckpt"
    save_checkpoint(
        p, {"params": fake_ema, "batch_stats": stats},
        cfg, epoch=2, opt_state=state.opt_state,
        extra={"raw_params": raw, "step": 123, "raw_batch_stats": stats},
    )
    _, _, _, ema_vars = restore_train_state(p, make_optimizer(1e-3))
    assert ema_vars is not None
    for a, b in zip(jax.tree.leaves(fake_ema),
                    jax.tree.leaves(ema_vars["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # non-EMA checkpoint -> no ema_vars
    p2 = tmp_path / "plain.ckpt"
    save_checkpoint(p2, {"params": raw, "batch_stats": stats}, cfg, epoch=0)
    _, _, _, ema_vars2 = restore_train_state(p2, make_optimizer(1e-3))
    assert ema_vars2 is None
