"""Building blocks: Conv+BN+SiLU, Bottleneck, C3 (CSP), SPPF.

TPU-first re-design of the reference blocks (reference: train.py:224-306):
NHWC layout (XLA's preferred conv layout on TPU), configurable compute
dtype (bf16 for the MXU throughput path, fp32 params), and functional
flax.linen modules so the whole graph traces into one fused XLA program.

Initialization matches PyTorch Conv2d defaults (kaiming-uniform ==
U(-1/sqrt(fan_in), +1/sqrt(fan_in))) so training dynamics are comparable.
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_from_scratch_tpu.models.fused_bn import BNSiLU

BN_MOMENTUM = 0.9  # flax momentum == 1 - torch momentum(0.1)
BN_EPS = 1e-5


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)); HWIO."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvBNSiLU(nn.Module):
    """Conv2d + BatchNorm + SiLU.

    `use_bias=False` matches the reference's ConvBlock (train.py:253-265);
    `use_bias=True` matches its raw `nn.Conv2d + BN + SiLU` stem/downsample
    and SPPF convs (train.py:236-241, 401-420), which keep the (redundant)
    conv bias before BN.
    """

    features: int
    kernel: int = 1
    stride: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        fan_in = x.shape[-1] * self.kernel * self.kernel
        from yolo_from_scratch_tpu.ops.conv_bwd import (
            conv3x3_same,
            use_fused_bwd,
        )

        if not self.use_bias and use_fused_bwd(
                self.kernel, self.stride, x.shape[-1], self.features,
                x.shape[1], x.shape[2], self.dtype):
            # lane-underfilled 3x3: same forward conv, fused Pallas
            # backward (ops/conv_bwd.py). Params declared identically to
            # the nn.Conv branch so checkpoints are interchangeable.
            from yolo_from_scratch_tpu.models.packed import _ConvParams

            kernel, _ = _ConvParams(self.features, x.shape[-1], False,
                                    fan_in, kernel_size=self.kernel,
                                    name="conv")()
            x = conv3x3_same(x.astype(self.dtype),
                             kernel.astype(self.dtype))
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init_for(fan_in),
                name="conv",
            )(x)
        # BatchNorm+SiLU tail with a memory-lean fused backward in train
        # mode (models/fused_bn.py); identical params/stats/numerics to
        # flax BatchNorm -> nn.silu.
        return BNSiLU(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                      dtype=self.dtype, name="bn")(x, train)


class Bottleneck(nn.Module):
    """Two 3x3 ConvBNSiLU with residual add iff shortcut and cin == cout
    (reference: train.py:295-306)."""

    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        y = ConvBNSiLU(self.features, 3, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNSiLU(self.features, 3, dtype=self.dtype, name="conv2")(y, train)
        return x + y if (self.shortcut and cin == self.features) else y


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions (reference: train.py:267-293).

    hidden = features // 2; path 1 runs `n` Bottlenecks, path 2 is a 1x1;
    concat then 1x1 project.
    """

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.features // 2
        x1 = ConvBNSiLU(hidden, 1, dtype=self.dtype, name="conv1")(x, train)
        for i in range(self.n):
            x1 = Bottleneck(hidden, self.shortcut, self.dtype, name=f"bottleneck{i}")(
                x1, train
            )
        x2 = ConvBNSiLU(hidden, 1, dtype=self.dtype, name="conv2")(x, train)
        out = jnp.concatenate([x1, x2], axis=-1)
        return ConvBNSiLU(self.features, 1, dtype=self.dtype, name="conv3")(out, train)


def _maxpool_same(x, k: int):
    """k x k stride-1 SAME max pool (NHWC) as separable shifted maxes.

    Same forward as `lax.reduce_window(max)`, but with an elementwise-max
    backward: XLA's select-and-scatter gradient miscompiles under spatial
    (H-dim) GSPMD sharding (measured: grad maxdiff 0.12 on a 2-D
    data x space mesh while the forward matches to 1e-7), and the
    shifted-max chain sidesteps that partitioner path entirely. Gradient
    tie-routing differs from select-and-scatter only on exactly-equal
    window values.
    """
    pad = k // 2
    for axis in (1, 2):
        widths = [(pad, pad) if a == axis else (0, 0) for a in range(x.ndim)]
        xp = jnp.pad(x, widths, constant_values=-jnp.inf)
        n = x.shape[axis]
        x = functools.reduce(
            jnp.maximum,
            [jax.lax.slice_in_dim(xp, i, i + n, axis=axis) for i in range(k)],
        )
    return x


class SPPF(nn.Module):
    """Spatial Pyramid Pooling - Fast (reference: train.py:224-251).

    1x1 reduce to cin//2, three sequential 5x5 stride-1 max pools,
    concat [x, y1, y2, y3], 1x1 out. The reference's SPPF convs carry a
    bias (raw nn.Conv2d), so use_bias=True here.
    """

    features: int
    kernel: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBNSiLU(hidden, 1, use_bias=True, dtype=self.dtype, name="conv1")(
            x, train
        )
        y1 = _maxpool_same(x, self.kernel)
        y2 = _maxpool_same(y1, self.kernel)
        y3 = _maxpool_same(y2, self.kernel)
        out = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBNSiLU(self.features, 1, use_bias=True, dtype=self.dtype, name="conv2")(
            out, train
        )


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsample, NHWC (reference: train.py:431, 436)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
