#!/usr/bin/env python
"""Single-image serving latency decomposition + pipelined throughput.

The driver-captured single-image p50 through the axon tunnel (~25-39 ms)
is far above the 0.87 ms scanned device time; this benchmark MEASURES the
claimed decomposition instead of inferring it:

1. `rtt_floor`: p50 round-trip of a null program (dispatch an (8,)-add,
   read the value back) — the tunnel/host floor no model work can beat.
2. `predict_p50`: the synchronous single-image Predictor end-to-end
   (letterbox + dispatch + forward/decode/NMS + readback), the same
   contract as the reference's predict (reference: train.py:1114-1250).
3. `pipelined`: PipelinedPredictor sustained throughput with depth
   1/2/4/8 in-flight requests — shows single-image serving at device
   rate through the same link the synchronous path pays per image.

Usage: python benchmarks/rttbench.py [--iters 40] [--stream 64]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_rtt_floor(iters=40):
    """p50 of a null-program dispatch + value readback."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    float(f(x)[0])  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(x)[0])
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--stream", type=int, default=64,
                    help="images per pipelined-throughput run")
    ap.add_argument("--size", default="s")
    ap.add_argument("--img-size", type=int, default=640)
    a = ap.parse_args()

    from PIL import Image

    from yolo_from_scratch_tpu.config import (
        YOLO_SIZES,
        YoloConfig,
        auto_fast_layout,
    )
    from yolo_from_scratch_tpu.infer.predict import (
        PipelinedPredictor,
        Predictor,
    )
    from yolo_from_scratch_tpu.models.yolo import YOLO

    platform = jax.devices()[0].platform
    log(f"backend: {platform} ({jax.devices()[0]})")

    rtt = measure_rtt_floor(a.iters)
    log(f"null-program round-trip p50: {rtt * 1000:.2f} ms "
        f"({a.iters} iters)")

    cfg = YoloConfig(num_classes=1, img_size=a.img_size,
                     **YOLO_SIZES[a.size],
                     **auto_fast_layout(platform))
    model = YOLO(cfg)
    cpu = jax.devices("cpu")[0] if platform != "cpu" else None
    init_img = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    if cfg.packed_stem:
        init_img = jnp.zeros(
            (1, cfg.img_size // 4, cfg.img_size // 4, 48))
    if cpu is not None:  # init on host: the remote compiler is slow
        with jax.default_device(cpu):
            variables = model.init(jax.random.PRNGKey(0), init_img,
                                   train=False)
    else:
        variables = model.init(jax.random.PRNGKey(0), init_img,
                               train=False)
    variables = jax.device_put(variables, jax.devices()[0])

    rng = np.random.default_rng(0)
    pil = Image.fromarray(
        (rng.random((a.img_size, a.img_size, 3)) * 255).astype(np.uint8))

    pred = Predictor(variables, cfg, conf_threshold=0.5)
    pred(pil)  # compile + warm
    times = []
    for _ in range(min(a.iters, 20)):
        t0 = time.perf_counter()
        pred(pil)
        times.append(time.perf_counter() - t0)
    p50 = statistics.median(times)

    # stage decomposition: where does the end-to-end time go?
    from yolo_from_scratch_tpu.data.letterbox import letterbox_image

    img_u8, scale, pt, pl_ = letterbox_image(pil, cfg.img_size)
    staged = img_u8[None]
    if cfg.packed_stem:
        from yolo_from_scratch_tpu.models.packed import pack_s2d_host

        staged = pack_s2d_host(staged)

    def med(f, n=10):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    t_upload = med(lambda: jax.block_until_ready(jnp.asarray(staged)))
    dev_img = jnp.asarray(staged)

    def dispatch():
        out = pred._post(pred.variables, dev_img, float(scale),
                         float(pt), float(pl_))
        jax.block_until_ready(out)

    t_dispatch = med(dispatch)
    mb = staged.nbytes / 1e6
    log(f"synchronous predict p50: {p50 * 1000:.2f} ms = upload "
        f"{t_upload * 1000:.1f} ms ({mb:.1f} MB uint8 at "
        f"{mb / t_upload:.1f} MB/s in-context) + dispatch+exec "
        f"{t_dispatch * 1000:.1f} ms (incl. {rtt * 1000:.1f} ms rtt; "
        f"device time is ~0.9 ms, BASELINE.md)")

    result = {
        "rtt_floor_ms": round(rtt * 1000, 2),
        "predict_p50_ms": round(p50 * 1000, 2),
        "upload_ms": round(t_upload * 1000, 1),
        "upload_mb": round(mb, 2),
        "dispatch_exec_ms": round(t_dispatch * 1000, 1),
        "pipelined_img_s": {},
    }
    for depth in (1, 2, 4, 8):
        pp = PipelinedPredictor(variables, cfg, depth=depth,
                                conf_threshold=0.5)
        pp([pil] * 4)  # warm (shares the Predictor program shape)
        t0 = time.perf_counter()
        pp([pil] * a.stream)
        dt = time.perf_counter() - t0
        ips = a.stream / dt
        result["pipelined_img_s"][str(depth)] = round(ips, 1)
        log(f"pipelined depth {depth}: {ips:.1f} img/s sustained "
            f"({a.stream} images, {dt:.2f}s)")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
