"""Warmup + cosine learning-rate schedule (reference: train.py:1034-1062).

Stepped per-EPOCH, exactly like the reference's LambdaLR usage
(train.py:1543): linear warmup from warmup_start_lr to initial_lr over
`warmup_epochs`, then cosine decay from initial_lr to min_lr over the
remaining epochs.
"""

from __future__ import annotations

import numpy as np


def get_lr_lambda(
    warmup_epochs=3, total_epochs=100, initial_lr=1e-2, min_lr=1e-4,
    warmup_start_lr=1e-6,
):
    """Returns epoch -> LR *multiplier* (relative to initial_lr), matching
    the reference's LambdaLR contract."""

    def lr_lambda(epoch):
        if epoch < warmup_epochs:
            return (
                warmup_start_lr
                + (initial_lr - warmup_start_lr) * epoch / warmup_epochs
            ) / initial_lr
        progress = (epoch - warmup_epochs) / (total_epochs - warmup_epochs)
        cosine_decay = 0.5 * (1.0 + np.cos(np.pi * progress))
        return (min_lr + (initial_lr - min_lr) * cosine_decay) / initial_lr

    return lr_lambda


def make_step_lr(
    total_steps, warmup_steps, initial_lr, min_lr, warmup_start_lr=1e-6,
):
    """Per-STEP warmup + cosine, jnp-traceable (step may be a tracer).

    The v8-style per-iteration schedule for the anchor-free recipe study
    (VERDICT r4 #1): the reference steps its LambdaLR per EPOCH
    (train.py:1543), which quantizes the 3-epoch warmup to 3 LR values —
    at 64 steps/epoch the first optimizer updates already run at
    initial_lr/3. This ramps every step instead. Feed to the scanned
    trainers' `step_lr` hook."""
    import jax.numpy as jnp

    warmup_steps = max(int(warmup_steps), 1)
    span = max(int(total_steps) - warmup_steps, 1)

    def lr_fn(step):
        s = step.astype(jnp.float32)
        warm = (warmup_start_lr
                + (initial_lr - warmup_start_lr) * s / warmup_steps)
        progress = jnp.clip((s - warmup_steps) / span, 0.0, 1.0)
        cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        main = min_lr + (initial_lr - min_lr) * cosine
        return jnp.where(s < warmup_steps, warm, main).astype(jnp.float32)

    return lr_fn


def lr_at_epoch(
    epoch, warmup_epochs=3, total_epochs=100, initial_lr=1e-2, min_lr=1e-4,
    warmup_start_lr=1e-6,
):
    """Absolute LR at an epoch."""
    return initial_lr * get_lr_lambda(
        warmup_epochs, total_epochs, initial_lr, min_lr, warmup_start_lr
    )(epoch)
