"""EMA weight averaging tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.train.ema import ema_init, ema_update


def test_ema_init_copies():
    params = {"w": jnp.ones((3,))}
    ema = ema_init(params)
    np.testing.assert_array_equal(np.asarray(ema["w"]), 1.0)


def test_ema_warmup_tracks_fast_then_slow():
    params0 = {"w": jnp.zeros((1,))}
    params1 = {"w": jnp.ones((1,))}
    ema = ema_init(params0)
    # very early step: effective decay ~ decay*(1-exp(-1/2000)) ~ 0 ->
    # EMA jumps almost fully to the new params
    early = ema_update(ema, params1, jnp.asarray(0), decay=0.9999, tau=2000.0)
    assert float(early["w"][0]) > 0.99
    # late step: effective decay ~ 0.9999 -> EMA barely moves
    late = ema_update(ema, params1, jnp.asarray(10_000_000), decay=0.9999,
                      tau=2000.0)
    assert float(late["w"][0]) < 0.001 + 1e-4 + 0.0002


def test_ema_converges_to_constant():
    params = {"w": jnp.full((2,), 5.0)}
    ema = ema_init({"w": jnp.zeros((2,))})
    for step in range(200):
        ema = ema_update(ema, params, jnp.asarray(step), decay=0.9,
                         tau=10.0)
    np.testing.assert_allclose(np.asarray(ema["w"]), 5.0, atol=1e-4)


def test_ema_inside_jit_with_train_step(cfg):
    from yolo_from_scratch_tpu.train.ema import wrap_train_step_with_ema
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_train_step,
        set_learning_rate,
    )

    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3)
    state = set_learning_rate(state, 1e-3)
    base = make_train_step(model, tx, cfg, donate=False)
    stepped = jax.jit(wrap_train_step_with_ema(base, decay=0.99, tau=10.0))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((1, cfg.img_size, cfg.img_size, 3)),
                         jnp.float32)
    targets = [jnp.zeros((1, g, g, 3, 6), jnp.float32) for g in cfg.grid_sizes]

    ema = ema_init(state.params)
    (state2, ema2), metrics = stepped((state, ema), images, targets)
    # EMA moved toward the updated params but is not equal to either
    p_new = jax.tree.leaves(state2.params)[0]
    e_new = jax.tree.leaves(ema2)[0]
    p_old = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(e_new), np.asarray(p_old))
    assert np.isfinite(float(metrics["loss"]))


def test_fit_with_ema_saves_averaged_params(cfg, temp_dataset_dir, tmp_path):
    """fit(use_ema=True) must checkpoint the EMA params, which differ from
    the raw trained params after a high-LR epoch."""
    import jax

    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.data.loader import DataLoader
    from yolo_from_scratch_tpu.train.loop import fit
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from yolo_from_scratch_tpu.utils.checkpoint import load_checkpoint

    ds = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                     img_size=cfg.img_size)
    loader = DataLoader(ds, batch_size=5, prefetch=0)
    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-2)
    step = make_train_step(model, tx, cfg, donate=False)
    eval_step = make_eval_step(model, cfg)
    p = tmp_path / "ema.ckpt"
    state, _ = fit(
        state, step, eval_step, loader, loader, cfg, epochs=1,
        initial_lr=1e-2, warmup_epochs=0, save_path=str(p), use_ema=True,
        ema_decay=0.99, log=lambda *a: None,
    )
    variables, _, _ = load_checkpoint(p)
    raw = jax.tree.leaves(jax.device_get(state.params))
    saved = jax.tree.leaves(variables["params"])
    diffs = sum(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(raw, saved)
    )
    assert diffs > 0  # checkpoint holds the EMA, not the raw weights
