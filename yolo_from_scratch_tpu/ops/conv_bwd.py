"""Fused Pallas backward for lane-underfilled stride-1 SAME 3x3 convs.

Under the packed-p3 layout the remaining conv-backward excess
concentrates in the 3x3 64->64 stride-1 convs (docs/HISTORY.md round-3
decomposition: the C3a bottleneck convs at 80x80 run 3.5x their 38.4 us
backward floor, the P4 hidden-64 convs at 40x40 3.7x). XLA lowers the
backward pair as two separate convolutions whose [64 x K x 64]
contractions fill at most a quarter of the 128x128 MXU and re-read the
activations from HBM for each.

The kernel here computes BOTH grads in one pass per batch element,
reading x and dy into VMEM once:

    dW += X9^T @ dy_flat      X9  = (H*W, 9C) shifted-patch matrix
    dx  = DY9 @ W9flip        DY9 = same scratch, rebuilt from dy

Both matmuls carry a 9C=576-deep side, so the MXU runs at ~50% (the
C=64 output side is the only underfill left — inherent to the layer)
instead of ~25%, and HBM traffic drops to one x + dy read and one dx
write. The (H*W, 9C) scratch is written twice (X9 then DY9) to stay
inside VMEM at 80x80.

`conv3x3_same` wraps the standard lax forward with a jax.custom_vjp
whose backward calls the kernel — the forward pass (and therefore
inference, checkpoints, and all forward numerics) is EXACTLY the stock
convolution; only the gradient computation changes, and only up to
float reduction order (tests/test_conv_bwd.py pins the equivalence).

Enabled inside the model blocks when `use_fused_bwd(...)` says the
shape qualifies; `YOLO_FUSED_CONV_BWD=0` opts out, `=interpret` forces
the Pallas interpreter (CPU tests).

Reference context: the reference's conv backward is cuDNN's
(train.py:913 loss.backward()); this is its TPU-native counterpart for
the shapes XLA handles poorly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: xpad + dypad + (H*W, 9C) scratch + in/out blocks must fit
# ~16 MB. At C=64 bf16 that bounds H*W to the 80x80 level.
_MAX_HW = 80 * 80
_FUSED_C = 64  # the lane-underfilled channel count worth intercepting


def _flag() -> str:
    # default OFF — the on-TPU A/B came back NEGATIVE (2026-08-20,
    # benchmarks/bwdproto.py on v5e): XLA's stock backward pair beats
    # both Pallas formulations (80x80: xla 134 us vs v1-patch-matrix
    # 216 us / v2-per-tap 370 us; 40x40: 34 vs 50 / 96). The patch
    # build's VMEM copy traffic (v1) and the strided-view 64-wide
    # matmuls (v2) both cost more than the lane underfill they remove.
    # Kept as an exact opt-in mechanism for future revisiting; full
    # numbers in docs/HISTORY.md round 4.
    return os.environ.get("YOLO_FUSED_CONV_BWD", "0")


def use_fused_bwd(kernel: int, stride: int, cin: int, cout: int,
                  h: int, w: int, dtype=jnp.bfloat16) -> bool:
    """Should this conv use the fused Pallas backward?

    PROCESS-START configuration: the flag is consulted at TRACE time and
    jitted programs are cached by shape/dtype, so set
    YOLO_FUSED_CONV_BWD before the process's first trace of the model —
    toggling it later has no effect on already-compiled programs
    (tests build fresh traces per setting for exactly this reason)."""
    if _flag() == "0":
        return False
    if not (kernel == 3 and stride == 1 and cin == cout == _FUSED_C):
        return False
    # the VMEM budget is dtype-dependent: f32 doubles every scratch
    # buffer (measured: 80x80 f32 needs 22.95M vs the 16M limit)
    limit = _MAX_HW if jnp.dtype(dtype).itemsize <= 2 else _MAX_HW // 2
    if h * w > limit:
        return False
    if _flag() == "interpret":
        return True
    return jax.default_backend() == "tpu"


def _bwd_kernel(x_ref, dy_ref, w9_ref, dx_ref, dw_ref,
                xpad, dypad, patches, dwacc, *, H, W, C):
    b = pl.program_id(0)
    hw = H * W

    # zero-pad x and dy into (H+2, W+2, C) scratch (SAME padding, 3x3 s1)
    xpad[:] = jnp.zeros_like(xpad)
    dypad[:] = jnp.zeros_like(dypad)
    xpad[1:H + 1, 1:W + 1, :] = x_ref[0]
    dypad[1:H + 1, 1:W + 1, :] = dy_ref[0]

    taps = [(i, j) for i in range(3) for j in range(3)]
    # X9: 9 shifted views of xpad, channel-concatenated -> (H*W, 9C)
    for t, (i, j) in enumerate(taps):
        patches[:, t * C:(t + 1) * C] = (
            xpad[i:i + H, j:j + W, :].reshape(hw, C))
    dyf = dy_ref[0].reshape(hw, C)
    contrib = jax.lax.dot_general(
        patches[:], dyf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(b == 0)
    def _():
        dwacc[:] = contrib

    @pl.when(b > 0)
    def _():
        dwacc[:] = dwacc[:] + contrib

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = dwacc[:]

    # DY9 reuses the same scratch -> dx = DY9 @ W9flip
    for t, (i, j) in enumerate(taps):
        patches[:, t * C:(t + 1) * C] = (
            dypad[i:i + H, j:j + W, :].reshape(hw, C))
    dx = jax.lax.dot_general(
        patches[:], w9_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0] = dx.reshape(H, W, C).astype(dx_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_call(B, H, W, C, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    kernel = functools.partial(_bwd_kernel, H=H, W=W, C=C)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), dtype),
            jax.ShapeDtypeStruct((9 * C, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, C), dtype),        # xpad
            pltpu.VMEM((H + 2, W + 2, C), dtype),        # dypad
            pltpu.VMEM((H * W, 9 * C), dtype),           # X9 / DY9
            pltpu.VMEM((9 * C, C), jnp.float32),         # dW accumulator
        ],
        interpret=interpret,
    )


def fused_bwd(x, dy, w):
    """(dx, dw) for y = conv3x3_s1_same(x, w), one fused pass."""
    B, H, W, C = x.shape
    # W9flip[t*C+co, ci] = w[2-i, 2-j, ci, co] — the grad-input kernel
    wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    w9 = wf.reshape(9 * C, C).astype(x.dtype)
    call = _make_call(B, H, W, C, x.dtype.name,
                      _flag() == "interpret")
    dx, dw9 = call(x, dy, w9)
    return dx, dw9.reshape(3, 3, C, C)


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))


@jax.custom_vjp
def conv3x3_same(x, w):
    """Stride-1 SAME 3x3 NHWC conv; forward == lax, backward == the
    fused Pallas kernel."""
    return _conv(x, w)


def _fwd(x, w):
    return _conv(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    dx, dw = fused_bwd(x, dy.astype(x.dtype), w)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3_same.defvjp(_fwd, _bwd)
