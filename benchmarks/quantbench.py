#!/usr/bin/env python
"""int8-vs-bf16 conv microbenchmark: does the v5e's 2x int8 MXU rate
(394 TOPS vs 197 TFLOP/s bf16) reach XLA-lowered convolutions?

Decides whether a quantized serving path (PTQ int8 weights+activations)
is worth building: times representative conv signatures from the 's'
model forward (the MXU-bound 3x3s and the HBM-bound 1x1s) in bf16 and
int8 (int32 accumulation via preferred_element_type), scanned-slope
timing so the axon tunnel RTT cancels (see stagebench.py).

    python benchmarks/quantbench.py [--batch 32] [--iters 30]
"""

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

# (H, W, Cin, Cout, k, stride) — representative 's'@640 forward convs
# (from utils/roofline.py's traced jaxpr): big MXU-bound 3x3s + the
# widest HBM-bound 1x1s + a mid-size C3 conv.
SHAPES = [
    (80, 80, 64, 64, 3, 1),     # C3 p3 bottleneck (MXU-bound)
    (40, 40, 128, 128, 3, 1),   # C3 p4 bottleneck
    (20, 20, 256, 256, 3, 1),   # C3 p5 bottleneck
    (80, 80, 128, 64, 1, 1),    # lateral / C3 split (HBM-bound)
    (40, 40, 256, 128, 1, 1),
    (80, 80, 64, 128, 3, 2),    # downsample
]


def scanned_conv(w_dtype, x_dtype, acc_dtype, shape, batch, iters):
    h, wdim, cin, cout, k, stride = shape
    rng = np.random.default_rng(0)
    if x_dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 128, (batch, h, wdim, cin)),
                        jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout)), jnp.int8)
    else:
        x = jnp.asarray(rng.random((batch, h, wdim, cin)), x_dtype)
        w = jnp.asarray(rng.random((k, k, cin, cout)), w_dtype)
    pad = k // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def one(x):
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=dn, preferred_element_type=acc_dtype,
        )
        # keep the carry shape/dtype: fold y back into x cheaply
        red = y.astype(jnp.float32).mean()
        if x.dtype == jnp.int8:
            return (x + red.astype(jnp.int8)).astype(jnp.int8)
        return x + red.astype(x.dtype)

    @jax.jit
    def run_n(x, n_static=iters):
        def body(c, _):
            return one(c), None

        c, _ = jax.lax.scan(body, x, None, length=n_static)
        return c

    @jax.jit
    def run_1(x):
        return one(x)

    def t(fn, reps=5):
        out = fn(x)
        float(jnp.ravel(out.astype(jnp.float32))[0])  # hard sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(x)
            float(jnp.ravel(out.astype(jnp.float32))[0])
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    return (t(run_n) - t(run_1)) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()
    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev.device_kind}), batch {a.batch}")
    print(f"{'shape':>28} {'bf16 us':>9} {'int8 us':>9} {'speedup':>8}")
    tot_bf16 = tot_int8 = 0.0
    for shape in SHAPES:
        t_bf16 = scanned_conv(jnp.bfloat16, jnp.bfloat16, jnp.float32,
                              shape, a.batch, a.iters)
        t_int8 = scanned_conv(jnp.int8, jnp.int8, jnp.int32,
                              shape, a.batch, a.iters)
        tot_bf16 += t_bf16
        tot_int8 += t_int8
        h, w, cin, cout, k, s = shape
        name = f"{h}x{w}x{cin}->{cout} k{k}s{s}"
        print(f"{name:>28} {t_bf16 * 1e6:9.1f} {t_int8 * 1e6:9.1f} "
              f"{t_bf16 / t_int8:8.2f}x")
    print(f"{'TOTAL':>28} {tot_bf16 * 1e6:9.1f} {tot_int8 * 1e6:9.1f} "
          f"{tot_bf16 / tot_int8:8.2f}x")


if __name__ == "__main__":
    main()
