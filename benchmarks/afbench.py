#!/usr/bin/env python
"""Decompose the anchor-free train step's throughput gap (VERDICT r4 #2):
374 img/s vs the anchor head's 1003 at the same nc=80 @640 workload
(benchmarks/configs_results.jsonl). Attribution targets: the decoupled
head's extra convs, the TAL assignment tensor program (the (B, M, A)
einsums over nc=80, models/anchor_free.py), and the DFL loss — plus the
cost of the round-4 recipe bug that let gradients flow through the
assignment (now stop_gradient'ed to v8 semantics; both variants timed).

    python benchmarks/afbench.py [--batch 8] [--nc 80] [--img-size 640]
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
from yolo_from_scratch_tpu.config import STRIDES, YoloConfig
from yolo_from_scratch_tpu.models.yolo import YOLO


def _mk_gt(batch, nc, rng):
    from yolo_from_scratch_tpu.models.anchor_free import MAX_GT

    gt_boxes = np.zeros((batch, MAX_GT, 4), np.float32)
    gt_cls = np.zeros((batch, MAX_GT, nc), np.float32)
    gt_valid = np.zeros((batch, MAX_GT), np.float32)
    for b in range(batch):
        n = 6
        for m in range(n):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            w, h = rng.uniform(0.08, 0.3, 2)
            gt_boxes[b, m] = [cx, cy, w, h]
            gt_cls[b, m, rng.integers(0, nc)] = 1.0
            gt_valid[b, m] = 1.0
    return jnp.asarray(gt_boxes), jnp.asarray(gt_cls), jnp.asarray(gt_valid)


def _mk_images(cfg, batch, rng):
    x = rng.random((batch, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    if cfg.packed_stem:
        from yolo_from_scratch_tpu.models.packed import pack_s2d_host

        x = pack_s2d_host(x)
    return jnp.asarray(x)


def _init(model, images):
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        v = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    return jax.device_put(v, jax.devices()[0])


def bench_forwards(cfg_af, cfg_anchor, batch, iters, rng):
    """Head-conv attribution: same trunk, AF vs anchor head forward."""
    n1, n2 = max(iters // 4, 2), iters
    out = {}
    for name, cfg in (("anchor", cfg_anchor), ("anchor_free", cfg_af)):
        model = YOLO(cfg)
        images = _mk_images(cfg, batch, rng)
        variables = _init(model, images)

        def fwd(x):
            return _dep(x, model.apply(variables, x, train=False))

        t = time_per_iter(fwd, images, n1, n2)
        out[name] = t
        log(f"fwd {name:12s}: {t * 1e3:7.2f} ms")
    log(f"decoupled-head conv premium: "
        f"{(out['anchor_free'] - out['anchor']) * 1e3:+.2f} ms/fwd")
    return out


def bench_loss_parts(cfg, batch, iters, rng):
    """AF loss on FIXED head outputs: total fwd, fwd+grad (detached and
    legacy non-detached assignment), and the tal/dfl/bce internals."""
    import optax

    from yolo_from_scratch_tpu.models.anchor_free import (
        REG_MAX,
        _dfl_loss,
        _flatten_af_preds,
        tal_assign,
        yolo_loss_anchor_free_from_gt,
    )

    n1, n2 = max(iters // 4, 2), iters
    nc = cfg.num_classes
    preds = []
    for s in STRIDES:
        g = cfg.img_size // s
        preds.append(jnp.asarray(
            rng.standard_normal((batch, g, g, 4 * REG_MAX + nc)) * 0.1,
            jnp.float32))
    gt = _mk_gt(batch, nc, rng)

    def loss_fwd(ps):
        total, *_ = yolo_loss_anchor_free_from_gt(
            ps, *gt, nc, cfg.img_size)
        return [_dep(p, total) for p in ps]

    t = time_per_iter(loss_fwd, preds, n1, n2)
    log(f"AF loss fwd (fixed preds):        {t * 1e3:7.2f} ms")

    def loss_grad(ps):
        g = jax.grad(lambda ps: yolo_loss_anchor_free_from_gt(
            ps, *gt, nc, cfg.img_size)[0])(ps)
        return [_dep(p, g) for p in ps]

    t_g = time_per_iter(loss_grad, preds, n1, n2)
    log(f"AF loss fwd+grad (detached TAL):  {t_g * 1e3:7.2f} ms")

    # legacy (round-4) behavior: gradient THROUGH the assignment
    def loss_grad_legacy(ps):
        def legacy(ps):
            dist, cls_logits, boxes_c, boxes_xy, pts, strides = (
                _flatten_af_preds(ps, nc, cfg.img_size))
            asn = tal_assign(jax.nn.sigmoid(cls_logits), boxes_xy, pts,
                             *gt)
            score_sum = jnp.maximum(jnp.sum(asn["target_scores"]), 1.0)
            cls = jnp.sum(optax.sigmoid_binary_cross_entropy(
                cls_logits, asn["target_scores"])) / score_sum
            from yolo_from_scratch_tpu.ops.ciou import ciou

            w_fg = jnp.sum(asn["target_scores"], -1) * asn["fg"]
            box = jnp.sum((1 - ciou(boxes_c, asn["target_boxes"])) * w_fg
                          ) / score_sum
            return 7.5 * box + 0.5 * cls

        g = jax.grad(legacy)(ps)
        return [_dep(p, g) for p in ps]

    t_leg = time_per_iter(loss_grad_legacy, preds, n1, n2)
    log(f"legacy grad THROUGH assignment    {t_leg * 1e3:7.2f} ms "
        f"(box+cls only, no DFL)")

    # internals on flattened tensors
    from yolo_from_scratch_tpu.models.anchor_free import _flatten_af_preds

    dist, cls_logits, boxes_c, boxes_xy, pts, strides = jax.jit(
        lambda ps: _flatten_af_preds(ps, nc, cfg.img_size))(preds)
    scores = jax.nn.sigmoid(cls_logits)

    def tal_only(carry):
        s, bx = carry
        asn = tal_assign(s, bx, pts, *gt)
        return _dep(s, asn), _dep(bx, asn)

    t_tal = time_per_iter(tal_only, (scores, boxes_xy), n1, n2)
    log(f"  tal_assign fwd alone:           {t_tal * 1e3:7.2f} ms")

    def tal_iter(carry):
        s, bx = carry
        asn = tal_assign(s, bx, pts, *gt, topk_impl="iter")
        return _dep(s, asn), _dep(bx, asn)

    t_tal_i = time_per_iter(tal_iter, (scores, boxes_xy), n1, n2)
    log(f"  tal_assign (iter top-k):        {t_tal_i * 1e3:7.2f} ms")

    tgt_ltrb = jnp.abs(jnp.asarray(
        rng.standard_normal((batch, dist.shape[1], 4)), jnp.float32)) * 4

    def dfl_only(d):
        g = jax.grad(lambda d: jnp.sum(_dfl_loss(d, tgt_ltrb)))(d)
        return _dep(d, g)

    t_dfl = time_per_iter(dfl_only, dist, n1, n2)
    log(f"  DFL loss fwd+grad alone:        {t_dfl * 1e3:7.2f} ms")

    tgt_scores = jnp.zeros_like(cls_logits)

    def bce_only(x):
        g = jax.grad(lambda x: jnp.sum(
            optax.sigmoid_binary_cross_entropy(x, tgt_scores)))(x)
        return _dep(x, g)

    t_bce = time_per_iter(bce_only, cls_logits, n1, n2)
    log(f"  cls BCE fwd+grad alone:         {t_bce * 1e3:7.2f} ms")
    return {"loss_fwd": t, "loss_grad": t_g, "loss_grad_legacy": t_leg,
            "tal": t_tal, "dfl": t_dfl, "bce": t_bce}


def bench_full_steps(cfg_af, cfg_anchor, batch, iters, rng):
    """Full train step A/B on the compact paths configs.py actually runs
    (AF: GT-list TAL; anchor: sparse gather loss)."""
    import optax

    from yolo_from_scratch_tpu.train.steps import (
        TrainState,
        _make_loss_fn,
        create_train_state,
        set_learning_rate,
    )

    n1, n2 = max(iters // 4, 2), iters
    out = {}
    for name, cfg in (("anchor(sparse)", cfg_anchor),
                      ("anchor_free", cfg_af)):
        model, tx, state = create_train_state(
            jax.random.PRNGKey(0), cfg, 1e-3, batch_size=1)
        state = jax.device_put(state, jax.devices()[0])
        state = set_learning_rate(state, 1e-3)
        images = _mk_images(cfg, batch, rng)
        af = cfg.head_type == "anchor_free"
        loss_fn = _make_loss_fn(model, cfg, False, af_compact=af,
                                sparse=not af)
        if af:
            targets = _mk_gt(batch, cfg.num_classes, rng)
        else:
            k = 16
            labels = np.zeros((batch, k, 5), np.float32)
            labels[:, :6, 0] = rng.integers(0, cfg.num_classes, (batch, 6))
            labels[:, :6, 1:] = rng.uniform(0.2, 0.4, (batch, 6, 4))
            valid = np.zeros((batch, k), bool)
            valid[:, :6] = True
            targets = (jnp.asarray(labels), jnp.asarray(valid))

        def full_step(state):
            (_, (new_bs, *_r)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       images, targets)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(new_params, new_bs, new_opt, state.step + 1)

        t = time_per_iter(full_step, state, n1, n2)
        out[name] = t
        log(f"full step {name:14s}: {t * 1e3:7.2f} ms  "
            f"({batch / t:6.0f} img/s)")
    return out


def bench_scanned(cfg_af, cfg_anchor, batch, rng, n_steps=16,
                  device_augment=True):
    """The REAL scanned trainers configs.py runs (uint8 staging, in-scan
    expand + label-level augment), timed per step from a two-length
    dispatch difference — catches costs the isolated full_step misses."""
    import time as _time

    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_train_step_multi_compact,
        set_learning_rate,
    )
    from yolo_from_scratch_tpu.utils.timing import hard_sync

    out = {}
    for name, cfg, sparse in (("anchor(sparse)", cfg_anchor, True),
                              ("anchor_free", cfg_af, False)):
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            model, tx, state = create_train_state(
                jax.random.PRNGKey(0), cfg, 1e-3, batch_size=1)
        state = jax.device_put(state, jax.devices()[0])
        state = set_learning_rate(state, 1e-3)
        steps = make_train_step_multi_compact(
            model, tx, cfg, device_augment=device_augment,
            sparse_loss=sparse)
        k = 16
        imgs = (rng.random((n_steps, batch, cfg.img_size, cfg.img_size, 3))
                * 255).astype(np.uint8)
        if cfg.packed_stem:
            from yolo_from_scratch_tpu.models.packed import pack_s2d_host

            imgs = np.stack([pack_s2d_host(s) for s in imgs])
        labels = np.zeros((n_steps, batch, k, 5), np.float32)
        labels[..., :6, 0] = rng.integers(0, cfg.num_classes,
                                          (n_steps, batch, 6))
        labels[..., :6, 1:] = rng.uniform(0.2, 0.4, (n_steps, batch, 6, 4))
        counts = np.full((n_steps, batch), 6, np.int32)
        args_short = tuple(jnp.asarray(x[:4]) for x in
                           (imgs, labels, counts))
        args_full = tuple(jnp.asarray(x) for x in (imgs, labels, counts))

        # warm both lengths, then slope
        steps2 = make_train_step_multi_compact(
            model, tx, cfg, device_augment=device_augment,
            sparse_loss=sparse, donate=False)
        for _ in range(2):
            _, m = steps2(state, *args_short)
        hard_sync(m["loss"])
        for _ in range(2):
            _, m = steps2(state, *args_full)
        hard_sync(m["loss"])

        def timed(args, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = _time.perf_counter()
                _, m = steps2(state, *args)
                hard_sync(m["loss"])
                best = min(best, _time.perf_counter() - t0)
            return best

        t_short, t_full = timed(args_short), timed(args_full)
        per_step = (t_full - t_short) / (n_steps - 4)
        out[name] = per_step
        log(f"scanned step {name:14s}: {per_step * 1e3:7.2f} ms  "
            f"({batch / per_step:6.0f} img/s)  [expand+augment in-scan]")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--nc", type=int, default=80)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=24)
    a = ap.parse_args()

    log(f"backend: {jax.devices()[0].platform}  nc={a.nc} "
        f"@{a.img_size} b{a.batch} packed-p3 bf16")
    rng = np.random.default_rng(0)
    common = dict(num_classes=a.nc, img_size=a.img_size,
                  compute_dtype="bfloat16", packed_stem=True,
                  packed_interior=True, packed_p3=True)
    cfg_af = YoloConfig(head_type="anchor_free", **common)
    cfg_anchor = YoloConfig(head_type="anchor", **common)

    import os

    if os.environ.get("AFBENCH_SCANNED_ONLY"):
        bench_scanned(cfg_af, cfg_anchor, a.batch, rng)
        return
    bench_forwards(cfg_af, cfg_anchor, a.batch, a.iters, rng)
    bench_loss_parts(cfg_af, a.batch, a.iters, rng)
    bench_full_steps(cfg_af, cfg_anchor, a.batch, a.iters, rng)
    bench_scanned(cfg_af, cfg_anchor, a.batch, rng)


if __name__ == "__main__":
    main()
