"""Fused BatchNorm+SiLU with a memory-lean custom backward.

Why: in train mode, JAX autodiff of `BatchNorm -> silu` materializes the
elementwise chain's residuals to HBM between the forward and backward
passes (the normalized activations in f32, the pre-SiLU tensor, its
sigmoid) — per-layer extra HBM traffic that the round-3 backward
decomposition measured at ~0.66 ms/step for batch-stats mode alone plus
the SiLU residuals on top (docs/HISTORY.md "Non-conv backward"). A
whole-graph `jax.checkpoint` was a measured NEGATIVE (it recomputes the
convolutions too); this module is the targeted version: a
`jax.custom_vjp` whose forward saves ONLY the conv output (already
resident for the conv's own backward) plus per-channel statistics, and
whose backward recomputes the cheap elementwise chain in-register inside
one fused XLA region.

Semantics are flax's exactly (flax.linen.normalization): f32
fast-variance statistics clipped at zero, f32 affine, cast to the
compute dtype, SiLU in the compute dtype, momentum running-stat
updates. The backward implements the classical batch-norm gradient

    dx = gamma * r * (dz - mean(dz) - xhat * mean(dz * xhat))

which is the analytic gradient of that forward (fast variance and
two-pass variance agree as functions of x). Gradients match autodiff of
the unfused composition to reduction-order (tests/test_fused_bn.py).

`phases`: the space-to-depth packed layout (models/packed.py) carries
`phases` spatial phases on the channel axis; statistics reduce over
batch, space AND phases per canonical channel, reproducing what flax
BatchNorm computes on the unpacked tensor (see `_PackedBN`).

Escape hatch: set YOLO_FUSED_BN=0 to fall back to the unfused
composition (also the equivalence oracle in tests). Reference behavior
being replaced: torch BatchNorm2d+SiLU inside ConvBlock
(reference: train.py:253-265).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from flax import linen as nn

BN_MOMENTUM = 0.9  # == blocks.BN_MOMENTUM (no import: blocks imports us)
BN_EPS = 1e-5


def fused_bn_enabled() -> bool:
    return os.environ.get("YOLO_FUSED_BN", "1") != "0"


def _stats(x, phases):
    """flax-equivalent f32 fast-variance batch statistics, reduced over
    batch/space/phases per canonical channel. Returns (mean, var), f32."""
    c = x.shape[-1] // phases
    xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (phases, c))
    red = tuple(range(xf.ndim - 1))
    mu = jnp.mean(xf, axis=red)
    mu2 = jnp.mean(jnp.square(xf), axis=red)
    var = jnp.maximum(0.0, mu2 - jnp.square(mu))
    return mu, var


def _affine_silu(x, mu, var, scale, bias, eps, phases):
    """z = (x - mu) * (rsqrt(var+eps) * scale) + bias in f32 (the exact
    op order flax's _normalize uses), cast to x.dtype, then SiLU."""
    mul = jax.lax.rsqrt(var + eps) * scale
    if phases > 1:
        mu, mul, bias = (jnp.tile(v, phases) for v in (mu, mul, bias))
    z = ((x.astype(jnp.float32) - mu) * mul + bias).astype(x.dtype)
    return nn.silu(z)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def bn_silu_train(phases: int, eps: float, x, scale, bias):
    """Train-mode fused BatchNorm+SiLU. Returns (y, mean, var); mean/var
    feed the (undifferentiated) running-stat update."""
    mu, var = _stats(x, phases)
    return _affine_silu(x, mu, var, scale, bias, eps, phases), mu, var


def _bn_silu_fwd(phases, eps, x, scale, bias):
    mu, var = _stats(x, phases)
    y = _affine_silu(x, mu, var, scale, bias, eps, phases)
    # residuals: the conv output x (resident anyway for the conv's own
    # backward) + per-channel vectors. No NHWC-sized extras.
    return (y, mu, var), (x, mu, var, scale, bias)


def _bn_silu_bwd(phases, eps, res, cts):
    dy, _dmu, _dvar = cts  # running-stat outputs are never differentiated
    x, mu, var, scale, bias = res
    c = x.shape[-1] // phases
    r = jax.lax.rsqrt(var + eps)

    xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (phases, c))
    xhat = (xf - mu) * r
    z = (xhat * scale + bias).astype(x.dtype).reshape(x.shape)

    # SiLU backward in the compute dtype (matches autodiff of nn.silu)
    s = jax.nn.sigmoid(z)
    dz = (dy * (s * (1.0 + z * (1.0 - s)))).astype(jnp.float32)
    dz = dz.reshape(x.shape[:-1] + (phases, c))

    red = tuple(range(dz.ndim - 1))
    m = 1
    for a in red:
        m *= dz.shape[a]
    dbeta = jnp.sum(dz, axis=red)
    dgamma = jnp.sum(dz * xhat, axis=red)
    dx = (scale * r) * (dz - dbeta / m - xhat * (dgamma / m))
    dx = dx.reshape(x.shape).astype(x.dtype)
    return dx, dgamma, dbeta


bn_silu_train.defvjp(_bn_silu_fwd, _bn_silu_bwd)


class BNSiLU(nn.Module):
    """Drop-in `BatchNorm(name="bn") -> silu` tail for ConvBNSiLU and the
    packed conv blocks: identical parameter/batch_stats tree ("scale",
    "bias" / "mean", "var" over the canonical feature axis), identical
    numerics, memory-lean fused backward in train mode."""

    features: int | None = None  # default: x.shape[-1] // phases
    phases: int = 1
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features if self.features else x.shape[-1] // self.phases
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if not train:
            y = _affine_silu(x, ra_mean.value, ra_var.value, scale, bias,
                             self.epsilon, self.phases)
            return y.astype(self.dtype)

        if fused_bn_enabled():
            y, mu, var = bn_silu_train(self.phases, self.epsilon,
                                       x, scale, bias)
        else:  # unfused oracle: same math, autodiff backward
            mu, var = _stats(x, self.phases)
            y = _affine_silu(x, mu, var, scale, bias, self.epsilon,
                             self.phases)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mu)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        return y.astype(self.dtype)
