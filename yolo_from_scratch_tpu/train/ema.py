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
    """EMA state = COPY of params (a real copy — the EMA is carried next
    to the live state in donated step arguments, so sharing buffers would
    donate the same buffer twice)."""
    return jax.tree.map(lambda x: jnp.array(x, copy=True), params)


def ema_update(ema_params, params, step, decay=0.9999, tau=2000.0):
    """One EMA update (jit-friendly; `step` may be traced)."""
    d = decay * (1.0 - jnp.exp(-(step.astype(jnp.float32) + 1.0) / tau))
    return jax.tree.map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
    )


def wrap_train_step_with_ema(train_step, decay=0.9999, tau=2000.0):
    """Lift a (state, ...) -> (state, metrics) step into one that also
    carries an EMA pytree: ((state, ema), ...) -> ((state, ema), metrics).

    `ema` may be a params pytree, or a {'params', 'batch_stats'} dict to
    average the BN buffers along with the weights (YOLOv5 ModelEMA
    averages buffers too)."""

    def stepped(state_and_ema, *args):
        state, ema = state_and_ema
        new_state, metrics = train_step(state, *args)
        if isinstance(ema, dict) and "batch_stats" in ema:
            target = {"params": new_state.params,
                      "batch_stats": new_state.batch_stats}
        else:
            target = new_state.params
        new_ema = ema_update(ema, target, new_state.step, decay, tau)
        return (new_state, new_ema), metrics

    return stepped
