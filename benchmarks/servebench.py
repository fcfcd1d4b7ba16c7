#!/usr/bin/env python
"""Where does batched-serving time go on-chip?

Splits the BatchPredictor device program (forward -> per-scale decode ->
per-image top-k -> batch-gridded Pallas NMS) into cumulative stages and
times each with the tunnel-RTT-cancelling scan-slope methodology
(benchmarks/stagebench.py). Identifies whether serving headroom is in
the network or the postprocess chain.

Usage: python benchmarks/servebench.py [--batch 32] [--packed-stem]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.stagebench import _dep, log, time_per_iter
from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.models.yolo import YOLO
from yolo_from_scratch_tpu.ops.decode import decode_predictions
from yolo_from_scratch_tpu.ops.nms import NEG_INF


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--packed-stem", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="additionally time the int8 PTQ path")
    ap.add_argument("--packed-interior", action="store_true",
                    help="extend packing through the first C3 stage "
                         "(models/packed.py; implies --packed-stem)")
    ap.add_argument("--packed-p3", action="store_true",
                    help="extend packing through the whole 80x80 P3 "
                         "level (implies --packed-interior)")
    ap.add_argument("--size", default="s", choices=["n", "s", "m", "l", "x"])
    ap.add_argument("--mxu-only", action="store_true",
                    help="with --int8: quantize only the MXU-bound 3x3 "
                         "convs (HBM-bound 1x1s stay bf16)")
    ap.add_argument("--approx-topk", action="store_true",
                    help="use the TPU-native binned approx_max_k prefilter "
                         "(recall 0.95) instead of the exact sort")
    ap.add_argument("--topk", type=int, default=None,
                    help="NMS candidate capacity (default: "
                         "default_topk's 4096 @640; 1024 measured +28%% "
                         "serving throughput with no realistic-scene "
                         "capacity loss at conf 0.5)")
    a = ap.parse_args()

    from yolo_from_scratch_tpu.config import YOLO_SIZES

    cfg = YoloConfig(num_classes=1, img_size=a.img_size,
                     compute_dtype="bfloat16",
                     packed_stem=(a.packed_stem or a.packed_interior
                                  or a.packed_p3),
                     packed_interior=a.packed_interior or a.packed_p3,
                     packed_p3=a.packed_p3,
                     **YOLO_SIZES[a.size])
    model = YOLO(cfg)
    rng = np.random.default_rng(0)
    imgs_np = rng.random(
        (a.batch, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    if cfg.packed_stem:
        from yolo_from_scratch_tpu.models.packed import pack_s2d_host

        imgs_np = pack_s2d_host(imgs_np)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(
            imgs_np[:1]), train=False)
    variables = jax.device_put(variables, jax.devices()[0])
    imgs = jnp.asarray(imgs_np)

    anchors = cfg.anchors_array
    from yolo_from_scratch_tpu.infer.predict import default_topk

    k = a.topk or default_topk(cfg.img_size)
    log(f"backend: {jax.devices()[0]}  B={a.batch} @{a.img_size} "
        f"packed={cfg.packed_stem} interior={cfg.packed_interior} "
        f"p3={cfg.packed_p3} "
        f"topk={k}")

    # stage 1: forward only
    def fwd(x):
        return _dep(x, model.apply(variables, x, train=False))

    t1 = time_per_iter(fwd, imgs, max(a.iters // 4, 2), a.iters)
    log(f"forward:                 {t1 * 1e3:7.2f} ms "
        f"({a.batch / t1:6.0f} img/s)")

    def decode_flat(x):
        preds = model.apply(variables, x, train=False)
        b = x.shape[0]
        boxes, obj, cls = [], [], []
        for pred, anc in zip(preds, anchors):
            d = decode_predictions(pred, anc, cfg.img_size)
            flat = d.reshape(b, -1, 5 + cfg.num_classes)
            boxes.append(flat[..., 0:4])
            obj.append(jax.nn.sigmoid(flat[..., 4]))
            cls.append(jax.nn.sigmoid(flat[..., 5:]))
        return (jnp.concatenate(boxes, axis=1), jnp.concatenate(obj, axis=1),
                jnp.concatenate(cls, axis=1))

    # stage 2: + decode
    def dec(x):
        return _dep(x, decode_flat(x))

    t2 = time_per_iter(dec, imgs, max(a.iters // 4, 2), a.iters)
    log(f"+ decode/sigmoid:        {t2 * 1e3:7.2f} ms  "
        f"(decode {1e3 * (t2 - t1):+.2f})")

    # stage 3: + score mask + per-image top-k
    from yolo_from_scratch_tpu.infer.predict import _topk_fn

    def topk(x):
        boxes, obj, cls = decode_flat(x)
        conf = obj * cls[..., 0]
        score = jnp.where(obj > 0.5, conf, NEG_INF)
        top_scores, idx = _topk_fn(a.approx_topk)(score, k)
        return _dep(x, (top_scores, jnp.take_along_axis(
            boxes, idx[..., None], axis=1)))

    t3 = time_per_iter(topk, imgs, max(a.iters // 4, 2), a.iters)
    log(f"+ top-k {k}:            {t3 * 1e3:7.2f} ms  "
        f"(top-k {1e3 * (t3 - t2):+.2f})")

    # stage 4: the full serving program (incl. NMS), as bench.py measures
    from yolo_from_scratch_tpu.infer.predict import make_batch_postprocess

    post = make_batch_postprocess(model, cfg, conf_threshold=0.5,
                                  iou_threshold=0.4, topk=a.topk,
                                  max_outputs=300,
                                  approx_topk=a.approx_topk)
    ones = jnp.ones(a.batch, jnp.float32)
    zeros = jnp.zeros(a.batch, jnp.float32)

    def full(x):
        out = post(variables, x, ones, zeros, zeros)
        return _dep(x, out)

    t4 = time_per_iter(full, imgs, max(a.iters // 4, 2), a.iters)
    log(f"full (+NMS+unletterbox): {t4 * 1e3:7.2f} ms  "
        f"(NMS+rest {1e3 * (t4 - t3):+.2f})  "
        f"=> {a.batch / t4:6.0f} img/s")

    if a.int8:
        # int8 PTQ path (infer/quantize.py): same program with every
        # ConvBNSiLU swapped for a BN-folded int8 MXU conv
        from yolo_from_scratch_tpu.infer.quantize import (
            mxu_bound_select,
            quantize_model,
        )

        select = mxu_bound_select if a.mxu_only else None
        bundle, qapply = quantize_model(model, variables, [imgs_np],
                                        select=select)
        nq = len(bundle[1])
        log(f"int8: {nq} convs quantized"
            + (" (mxu-bound only)" if a.mxu_only else ""))

        def qfwd(x):
            return _dep(x, qapply(bundle, x))

        t5 = time_per_iter(qfwd, imgs, max(a.iters // 4, 2), a.iters)
        log(f"int8 forward:            {t5 * 1e3:7.2f} ms "
            f"({a.batch / t5:6.0f} img/s)  vs bf16 {t1 / t5:.2f}x")

        qpost = make_batch_postprocess(model, cfg, conf_threshold=0.5,
                                       iou_threshold=0.4, topk=a.topk,
                                       max_outputs=300, apply_fn=qapply)

        def qfull(x):
            return _dep(x, qpost(bundle, x, ones, zeros, zeros))

        t6 = time_per_iter(qfull, imgs, max(a.iters // 4, 2), a.iters)
        log(f"int8 full:               {t6 * 1e3:7.2f} ms  "
            f"=> {a.batch / t6:6.0f} img/s  vs bf16 {t4 / t6:.2f}x")


if __name__ == "__main__":
    main()
