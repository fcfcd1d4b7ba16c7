#!/usr/bin/env python
"""Prototype: fused Pallas backward for the lane-underfilled 3x3 64-ch
convs (VERDICT r3 #6).

Under packed-p3 the remaining conv-backward excess concentrates in two
shapes (docs/HISTORY.md round-3 decomposition): the C3a bottleneck 3x3
64->64 convs at 80x80 (4 x 135 us, 3.5x their 38.4 us backward floor)
and the P4 hidden-64 3x3s at 40x40 (6 x 36 us, 3.7x). XLA lowers the
backward pair as two separate convs whose [64 x K x 64] contractions
fill at most a quarter of the 128x128 MXU and re-read the activations
from HBM for each.

The Pallas kernel here computes BOTH grads in one pass per batch
element, reading x and dy into VMEM once:

    dW = X9^T @ dy_flat      X9  = (H*W, 9*64) shifted-patch matrix
    dx = DY9 @ W9flip        DY9 = same buffer, rebuilt from dy

Both matmuls have a 576-deep side, so the MXU runs at ~50% (the co=64
output side is the only underfill left — inherent to the layer) instead
of ~25%, and the HBM traffic drops to the x + dy read and dx write.
The single (H*W, 576) scratch is reused for X9 then DY9 to stay inside
VMEM at 80x80.

Usage: python benchmarks/bwdproto.py [--iters 3] [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.stagebench import _dep, log, time_per_iter

DN = None  # set in main (conv dimension numbers NHWC/HWIO)


def _conv(x, w, dn):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=dn)


# ---------------------------------------------------------------------------
# Pallas fused backward: one grid step per batch element.
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, dy_ref, w9_ref, dx_ref, dw_ref,
                xpad, dypad, patches, dwacc, *, H, W, C):
    b = pl.program_id(0)
    hw = H * W

    # zero-pad x and dy into (H+2, W+2, C) scratch (SAME padding, 3x3 s1)
    xpad[:] = jnp.zeros_like(xpad)
    dypad[:] = jnp.zeros_like(dypad)
    xpad[1:H + 1, 1:W + 1, :] = x_ref[0]
    dypad[1:H + 1, 1:W + 1, :] = dy_ref[0]

    # X9: 9 shifted views of xpad, channel-concatenated -> (H*W, 9C)
    for t, (i, j) in enumerate([(i, j) for i in range(3) for j in range(3)]):
        patches[:, t * C:(t + 1) * C] = (
            xpad[i:i + H, j:j + W, :].reshape(hw, C))
    dyf = dy_ref[0].reshape(hw, C)
    # dW contribution of this batch element: (9C, C), f32 accumulate
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
    for t, (i, j) in enumerate([(i, j) for i in range(3) for j in range(3)]):
        patches[:, t * C:(t + 1) * C] = (
            dypad[i:i + H, j:j + W, :].reshape(hw, C))
    dx = jax.lax.dot_general(
        patches[:], w9_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0] = dx.reshape(H, W, C).astype(dx_ref.dtype)


def _bwd_kernel_v2(x_ref, dy_ref, w9_ref, dx_ref, dw_ref,
                   xpad, dypad, dwacc, dxacc, *, H, W, C):
    """v2: no patch-matrix materialization — 9 accumulating per-tap
    matmuls read the shifted VMEM views directly. Trades the v1 patch
    copies (measured to dominate) for 25%-MXU [64 x 6400 x 64]
    contractions."""
    b = pl.program_id(0)
    hw = H * W

    xpad[:] = jnp.zeros_like(xpad)
    dypad[:] = jnp.zeros_like(dypad)
    xpad[1:H + 1, 1:W + 1, :] = x_ref[0]
    dypad[1:H + 1, 1:W + 1, :] = dy_ref[0]
    dyf = dy_ref[0].reshape(hw, C)

    taps = [(i, j) for i in range(3) for j in range(3)]
    dxacc[:] = jnp.zeros_like(dxacc)
    for t, (i, j) in enumerate(taps):
        xs = xpad[i:i + H, j:j + W, :].reshape(hw, C)
        contrib = jax.lax.dot_general(
            xs, dyf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(b == 0)
        def _():
            dwacc[t * C:(t + 1) * C, :] = contrib

        @pl.when(b > 0)
        def _():
            dwacc[t * C:(t + 1) * C, :] = (
                dwacc[t * C:(t + 1) * C, :] + contrib)

        dys = dypad[i:i + H, j:j + W, :].reshape(hw, C)
        dxacc[:] = dxacc[:] + jax.lax.dot_general(
            dys, w9_ref[t * C:(t + 1) * C, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = dwacc[:]

    dx_ref[0] = dxacc[:].reshape(H, W, C).astype(dx_ref.dtype)


def make_fused_bwd_v2(B, H, W, C, dtype=jnp.bfloat16, interpret=False):
    kernel = functools.partial(_bwd_kernel_v2, H=H, W=W, C=C)
    call = pl.pallas_call(
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
            pltpu.VMEM((9 * C, C), jnp.float32),         # dW accumulator
            pltpu.VMEM((H * W, C), jnp.float32),         # dx accumulator
        ],
        interpret=interpret,
    )

    def fused(x, dy, w):
        wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
        w9 = wf.reshape(9 * C, C).astype(x.dtype)
        dx, dw9 = call(x, dy, w9)
        return dx, dw9.reshape(3, 3, C, C)

    return fused


def make_fused_bwd(B, H, W, C, dtype=jnp.bfloat16, interpret=False):
    """Returns fused(x, dy, w) -> (dx, dw_f32). w: (3, 3, C, C) HWIO."""

    kernel = functools.partial(_bwd_kernel, H=H, W=W, C=C)
    call = pl.pallas_call(
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

    def fused(x, dy, w):
        # W9flip[t*C+co, ci] = w[2-i, 2-j, ci, co] — the grad-input kernel
        wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)  # (3,3,co,ci)
        w9 = wf.reshape(9 * C, C).astype(x.dtype)
        dx, dw9 = call(x, dy, w9)
        dw = dw9.reshape(3, 3, C, C)
        return dx, dw

    return fused


def check_correctness(B, H, W, C, interpret):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    dy = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    _, vjp = jax.vjp(lambda x, w: _conv(x, w, dn), x, w)
    dx_ref, dw_ref = vjp(dy)

    for name, mk in (("v1", make_fused_bwd), ("v2", make_fused_bwd_v2)):
        fused = mk(B, H, W, C, jnp.float32, interpret=interpret)
        dx, dw = jax.jit(fused)(x, dy, w)
        err_dx = float(jnp.max(jnp.abs(dx - dx_ref)) /
                       (jnp.max(jnp.abs(dx_ref)) + 1e-9))
        err_dw = float(jnp.max(jnp.abs(dw - dw_ref)) /
                       (jnp.max(jnp.abs(dw_ref)) + 1e-9))
        log(f"correctness {name} {B}x{H}x{W}x{C}: rel err dx {err_dx:.2e} "
            f"dw {err_dw:.2e}")
        assert err_dx < 1e-4 and err_dw < 1e-4, (name, err_dx, err_dw)


def bench_shape(B, H, W, C, iters, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32).astype(
        dtype)
    w = jnp.asarray(
        rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32).astype(dtype)
    dy = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32).astype(
        dtype)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def xla_bwd(carry):
        x, dy = carry
        _, vjp = jax.vjp(lambda x, w: _conv(x, w, dn), x, w)
        dx, dw = vjp(dy)
        return _dep(x, (dx, dw)), _dep(dy, (dx, dw))

    t_xla = time_per_iter(xla_bwd, (x, dy), 50, 550, reps=3)

    fused = make_fused_bwd(B, H, W, C, dtype)

    def pallas_bwd(carry):
        x, dy = carry
        dx, dw = fused(x, dy, w)
        return _dep(x, (dx, dw)), _dep(dy, (dx, dw))

    t_pl = time_per_iter(pallas_bwd, (x, dy), 50, 550, reps=3)

    fused2 = make_fused_bwd_v2(B, H, W, C, dtype)

    def pallas_bwd2(carry):
        x, dy = carry
        dx, dw = fused2(x, dy, w)
        return _dep(x, (dx, dw)), _dep(dy, (dx, dw))

    t_pl2 = time_per_iter(pallas_bwd2, (x, dy), 50, 550, reps=3)
    floor = 2 * 19.2e-6 * (H * W) / (80 * 80)  # 2x fwd roofline floor
    log(f"bwd {B}x{H}x{W}x{C}: xla {t_xla * 1e6:7.1f} us   "
        f"pallas-v1 {t_pl * 1e6:7.1f} us   v2 {t_pl2 * 1e6:7.1f} us   "
        f"floor {floor * 1e6:6.1f} us   "
        f"(best {t_xla / min(t_pl, t_pl2):.2f}x)")
    return t_xla, min(t_pl, t_pl2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpreter mode (correctness only)")
    a = ap.parse_args()

    log(f"backend: {jax.devices()[0].platform}")
    check_correctness(2, 16, 16, 64, a.interpret)
    if a.interpret:
        log("interpret mode: skipping timing")
        return
    # f32 at 80x80 exceeds the VMEM budget (f32 doubles every scratch);
    # the full-scale correctness check runs at 40x40 f32, the 80x80
    # shape is exercised by the bf16 timing below
    check_correctness(8, 40, 40, 64, False)
    # the two packed-p3 hot shapes (4x and 6x instances in the step)
    x80 = bench_shape(8, 80, 80, 64, a.iters)
    x40 = bench_shape(8, 40, 40, 64, a.iters)
    saved = 4 * (x80[0] - x80[1]) + 6 * (x40[0] - x40[1])
    log(f"projected step saving at 4x80 + 6x40 instances: "
        f"{saved * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
