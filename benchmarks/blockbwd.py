#!/usr/bin/env python
"""Prototype: fully fused Pallas backward through a whole bottleneck
chain — conv3x3 + (folded-BN scale) + SiLU + conv3x3 + residual add —
the lever docs/HISTORY.md round 4 named as the realistic remaining path
past 54% of roofline (VERDICT r4 #4).

Round 4's per-conv fused backward lost to XLA (134 us vs 216/370 us at
80x80/64ch) because the patch-matrix build (v1) and the 25%-MXU per-tap
matmuls (v2) both cost more than the lane underfill they remove. The
whole-chain hypothesis: backward through BOTH convs in one kernel pass
per batch element, so the intermediate gradient (dz1) never round-trips
HBM and the pad/shift scratch is shared — if the loss was mostly memory
movement, chaining amortizes it over twice the matmul work.

Chain (s1, s2 = folded BN scales, per channel):
    z1 = conv1(x) * s1;  a1 = silu(z1);  y = x + conv2(a1) * s2
Backward given dy (dx, dw1, dw2; scale/bias grads are cheap reductions
XLA fuses into elementwise passes either way and are excluded from both
arms):
    dz2 = dy * s2
    dw2[t] = shift_t(a1)^T @ dz2          da1 = sum_t shift_t(dz2) @ w2f[t]
    dz1 = da1 * silu'(z1) * s1
    dw1[t] = shift_t(x)^T @ dz1           dx = sum_t shift_t(dz1) @ w1f[t] + dy

Both arms are timed as FWD+BWD of the chain (the fused kernel would ship
as a custom_vjp that keeps XLA's forward; jax.vjp's construction runs
the forward, so the comparison is like for like).

Usage: python benchmarks/blockbwd.py [--interpret]
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


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))


def chain_fwd(x, w1, w2, s1, s2):
    z1 = _conv(x, w1) * s1.astype(x.dtype)
    a1 = jax.nn.silu(z1)
    return z1, a1, x + _conv(a1, w2) * s2.astype(x.dtype)


def _silu_grad(z):
    sig = jax.nn.sigmoid(z)
    return sig * (1.0 + z * (1.0 - sig))


TAPS = [(i, j) for i in range(3) for j in range(3)]


def _chain_bwd_kernel(x_ref, z1_ref, a1_ref, dy_ref, w1f_ref, w2f_ref,
                      s1_ref, s2_ref, dx_ref, dw1_ref, dw2_ref,
                      xpad, a1pad, g2pad, g1pad, gacc, dw1acc, dw2acc,
                      *, H, W, C):
    b = pl.program_id(0)
    hw = H * W
    f32 = jnp.float32

    # stage padded activations once (shared by both convs' backward)
    xpad[:] = jnp.zeros_like(xpad)
    a1pad[:] = jnp.zeros_like(a1pad)
    g2pad[:] = jnp.zeros_like(g2pad)
    xpad[1:H + 1, 1:W + 1, :] = x_ref[0]
    a1pad[1:H + 1, 1:W + 1, :] = a1_ref[0]
    dz2 = (dy_ref[0].astype(f32) * s2_ref[0].astype(f32)).astype(
        xpad.dtype)
    g2pad[1:H + 1, 1:W + 1, :] = dz2
    dz2f = dz2.reshape(hw, C)

    # conv2 backward: dw2 per tap + da1 accumulation (gacc)
    gacc[:] = jnp.zeros_like(gacc)
    for t, (i, j) in enumerate(TAPS):
        a1s = a1pad[i:i + H, j:j + W, :].reshape(hw, C)
        c2 = jax.lax.dot_general(a1s, dz2f, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)

        @pl.when(b == 0)
        def _():
            dw2acc[t * C:(t + 1) * C, :] = c2

        @pl.when(b > 0)
        def _():
            dw2acc[t * C:(t + 1) * C, :] = dw2acc[t * C:(t + 1) * C, :] + c2

        g2s = g2pad[i:i + H, j:j + W, :].reshape(hw, C)
        gacc[:] = gacc[:] + jax.lax.dot_general(
            g2s, w2f_ref[t * C:(t + 1) * C, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    # through the activation: dz1 = da1 * silu'(z1) * s1 — VMEM-resident,
    # never touches HBM (the point of the chain fusion)
    z1 = z1_ref[0].astype(f32)
    dz1 = (gacc[:].reshape(H, W, C) * _silu_grad(z1)
           * s1_ref[0].astype(f32)).astype(xpad.dtype)
    g1pad[:] = jnp.zeros_like(g1pad)
    g1pad[1:H + 1, 1:W + 1, :] = dz1
    dz1f = dz1.reshape(hw, C)

    # conv1 backward: dw1 per tap + dx accumulation (gacc reused)
    gacc[:] = jnp.zeros_like(gacc)
    for t, (i, j) in enumerate(TAPS):
        xs = xpad[i:i + H, j:j + W, :].reshape(hw, C)
        c1 = jax.lax.dot_general(xs, dz1f, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)

        @pl.when(b == 0)
        def _():
            dw1acc[t * C:(t + 1) * C, :] = c1

        @pl.when(b > 0)
        def _():
            dw1acc[t * C:(t + 1) * C, :] = dw1acc[t * C:(t + 1) * C, :] + c1

        g1s = g1pad[i:i + H, j:j + W, :].reshape(hw, C)
        gacc[:] = gacc[:] + jax.lax.dot_general(
            g1s, w1f_ref[t * C:(t + 1) * C, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dw1_ref[:] = dw1acc[:]
        dw2_ref[:] = dw2acc[:]

    # residual: dx = conv1-backprop + dy
    dx_ref[0] = (gacc[:].reshape(H, W, C)
                 + dy_ref[0].astype(f32)).astype(dx_ref.dtype)


def make_chain_bwd(B, H, W, C, dtype=jnp.bfloat16, interpret=False):
    kernel = functools.partial(_chain_bwd_kernel, H=H, W=W, C=C)
    img = lambda: pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    wspec = lambda: pl.BlockSpec((9 * C, C), lambda b: (0, 0),
                                 memory_space=pltpu.VMEM)
    srow = lambda: pl.BlockSpec((1, C), lambda b: (0, 0),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[img(), img(), img(), img(), wspec(), wspec(), srow(),
                  srow()],
        out_specs=[img(), wspec(), wspec()],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), dtype),
            jax.ShapeDtypeStruct((9 * C, C), jnp.float32),
            jax.ShapeDtypeStruct((9 * C, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, C), dtype),   # xpad
            pltpu.VMEM((H + 2, W + 2, C), dtype),   # a1pad
            pltpu.VMEM((H + 2, W + 2, C), dtype),   # g2pad (dz2)
            pltpu.VMEM((H + 2, W + 2, C), dtype),   # g1pad (dz1)
            pltpu.VMEM((H * W, C), jnp.float32),    # gradient accumulator
            pltpu.VMEM((9 * C, C), jnp.float32),    # dw1
            pltpu.VMEM((9 * C, C), jnp.float32),    # dw2
        ],
        interpret=interpret,
    )

    def fused(x, z1, a1, dy, w1, w2, s1, s2):
        flip9 = lambda w: jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).reshape(
            9 * C, C).astype(x.dtype)
        dx, dw1_9, dw2_9 = call(x, z1, a1, dy, flip9(w1), flip9(w2),
                                s1.reshape(1, C), s2.reshape(1, C))
        return dx, dw1_9.reshape(3, 3, C, C), dw2_9.reshape(3, 3, C, C)

    return fused


def check_correctness(B, H, W, C, interpret):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    s1 = jnp.asarray(rng.random(C) + 0.5, jnp.float32)
    s2 = jnp.asarray(rng.random(C) + 0.5, jnp.float32)
    dy = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    (dx_ref, dw1_ref, dw2_ref) = jax.vjp(
        lambda x, w1, w2: chain_fwd(x, w1, w2, s1, s2)[2], x, w1, w2
    )[1](dy)
    z1, a1, _ = chain_fwd(x, w1, w2, s1, s2)
    fused = make_chain_bwd(B, H, W, C, jnp.float32, interpret=interpret)
    dx, dw1, dw2 = jax.jit(fused)(x, z1, a1, dy, w1, w2, s1, s2)
    for name, got, ref in (("dx", dx, dx_ref), ("dw1", dw1, dw1_ref),
                           ("dw2", dw2, dw2_ref)):
        err = float(jnp.max(jnp.abs(got - ref)) /
                    (jnp.max(jnp.abs(ref)) + 1e-9))
        log(f"correctness {name} {B}x{H}x{W}x{C}: rel err {err:.2e}")
        assert err < 1e-4, (name, err)


def bench_chain(B, H, W, C, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), f32 := jnp.float32
                    ).astype(dtype)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, f32
                     ).astype(dtype)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, f32
                     ).astype(dtype)
    s1 = jnp.asarray(rng.random(C) + 0.5, f32)
    s2 = jnp.asarray(rng.random(C) + 0.5, f32)

    def xla_arm(carry):
        x, dy = carry
        y, vjp = jax.vjp(
            lambda x, w1, w2: chain_fwd(x, w1, w2, s1, s2)[2], x, w1, w2)
        dx, dw1, dw2 = vjp(dy)
        outs = (y, dx, dw1, dw2)
        return _dep(x, outs), _dep(dy, outs)

    dy = jnp.asarray(rng.standard_normal((B, H, W, C)), f32).astype(dtype)
    t_xla = time_per_iter(xla_arm, (x, dy), 50, 550, reps=3)

    fused = make_chain_bwd(B, H, W, C, dtype)

    def pallas_arm(carry):
        x, dy = carry
        z1, a1, y = chain_fwd(x, w1, w2, s1, s2)   # XLA forward (as shipped)
        dx, dw1, dw2 = fused(x, z1, a1, dy, w1, w2, s1, s2)
        outs = (y, dx, dw1, dw2)
        return _dep(x, outs), _dep(dy, outs)

    t_pl = time_per_iter(pallas_arm, (x, dy), 50, 550, reps=3)

    # fwd+bwd floor: 6 conv-equivalents at the measured 19.2 us/conv
    # (80x80 64ch bf16) scaled by H*W
    floor = 6 * 19.2e-6 * (H * W) / (80 * 80)
    log(f"chain {B}x{H}x{W}x{C} fwd+bwd: xla {t_xla * 1e6:7.1f} us   "
        f"pallas-chain {t_pl * 1e6:7.1f} us   floor {floor * 1e6:6.1f} us  "
        f"({t_xla / t_pl:.2f}x)")
    return t_xla, t_pl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    a = ap.parse_args()
    log(f"backend: {jax.devices()[0].platform}")
    check_correctness(2, 16, 16, 64, a.interpret)
    if a.interpret:
        log("interpret mode: skipping timing")
        return
    check_correctness(4, 40, 40, 64, False)
    r80 = bench_chain(8, 80, 80, 64)
    r40 = bench_chain(8, 40, 40, 64)
    # packed-p3 step has 2 such chains at 80x80 (c3a+c3b bottlenecks) and
    # 3 at 40x40 (P4 C3s) — projection if every chain switched
    saved = 2 * (r80[0] - r80[1]) + 3 * (r40[0] - r40[1])
    log(f"projected step delta at 2x80 + 3x40 chains: {saved * 1e3:+.3f} ms"
        f" ({'saves' if saved > 0 else 'LOSES'})")


if __name__ == "__main__":
    main()
