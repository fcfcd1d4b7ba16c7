"""Exponential moving average of model parameters.

Not in the reference (its checkpoints hold raw weights) but standard YOLO
practice: evaluation/serving with an EMA of the weights is measurably more
stable. Functional: EMA params ride in a pytree updated inside jit.

YOLOv5-style warmup decay: d(step) = decay * (1 - exp(-step / tau)) so
early steps average aggressively and the EMA converges to `decay`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    """EMA state = copy of params."""
    return jax.tree.map(jnp.asarray, params)


def ema_update(ema_params, params, step, decay=0.9999, tau=2000.0):
    """One EMA update (jit-friendly; `step` may be traced)."""
    d = decay * (1.0 - jnp.exp(-(step.astype(jnp.float32) + 1.0) / tau))
    return jax.tree.map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
    )


def wrap_train_step_with_ema(train_step, decay=0.9999, tau=2000.0):
    """Lift a (state, ...) -> (state, metrics) step into one that also
    carries EMA params: ((state, ema), ...) -> ((state, ema), metrics)."""

    def stepped(state_and_ema, *args):
        state, ema = state_and_ema
        new_state, metrics = train_step(state, *args)
        new_ema = ema_update(ema, new_state.params, new_state.step, decay, tau)
        return (new_state, new_ema), metrics

    return stepped
