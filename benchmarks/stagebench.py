#!/usr/bin/env python
"""Where does the train step's time actually go on-chip?

Measures, at the reference workload (batch 8, 's', 640, bf16), each stage
of the training step in isolation — all scanned N iterations per dispatch
with a value-dependent carry (so XLA cannot CSE the loop away) and closed
with a hard value readback (`utils/timing` methodology):

  1. forward, eval mode (BN running stats)
  2. forward, train mode (BN batch stats)        -> delta = BN-stat cost
  3. forward + multiscale loss + grad            -> delta = backward cost
  4. full train step (grad + clip + Adam)        -> delta = optimizer cost
  5. every conv from the traced jaxpr, standalone -> per-conv measured vs
     roofline floor (identifies which layers XLA executes inefficiently)

Usage:  python benchmarks/stagebench.py [--batch 8] [--iters 30] [--convs]
"""

from __future__ import annotations

import argparse
import functools
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.models.yolo import YOLO
from yolo_from_scratch_tpu.ops.losses import yolo_loss_multiscale
from yolo_from_scratch_tpu.utils.roofline import (
    V5E_HBM_BW,
    forward_conv_costs,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_dispatch(fn, *args, reps=5, warmup=2):
    """Median seconds per dispatch of jitted fn(*args), hard-synced."""
    from yolo_from_scratch_tpu.utils.timing import hard_sync

    for _ in range(warmup):
        hard_sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        hard_sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def scanned(step, carry, iters):
    """jit a scan of `step` (carry -> carry) `iters` times; the carry makes
    each iteration depend on the last so the loop cannot collapse."""

    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), None

        c, _ = jax.lax.scan(body, c, None, length=iters)
        return c

    return run


def time_per_iter(step, carry, n1, n2, reps=5):
    """Seconds per iteration of `step` via the two-length scan SLOPE:
    (T(scan n2) - T(scan n1)) / (n2 - n1). The axon tunnel costs ~35 ms
    of round-trip per synced dispatch — a constant that a single-length
    measurement wrongly attributes to the op; the slope cancels it."""
    t1 = time_dispatch(scanned(step, carry, n1), carry, reps=reps)
    t2 = time_dispatch(scanned(step, carry, n2), carry, reps=reps)
    return (t2 - t1) / (n2 - n1)


def _dep(x, y):
    """Value-dependent no-op: x' == x numerically but depends on y."""
    leaves = jax.tree.leaves(y)
    s = sum(jnp.sum(l).astype(jnp.float32) * 0.0 for l in leaves)
    return x * (1.0 + s.astype(x.dtype))


def bench_stages(cfg, batch, iters):
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        set_learning_rate,
    )

    model = YOLO(cfg)
    rng = np.random.default_rng(0)
    images_np = rng.random(
        (batch, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    if cfg.packed_stem:  # the loader delivers host-packed batches
        from yolo_from_scratch_tpu.models.packed import pack_s2d_host

        images_np = pack_s2d_host(images_np)
    images = jnp.asarray(images_np)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    variables = jax.device_put(variables, jax.devices()[0])
    anchors = cfg.anchors_array

    targets = []
    for g in cfg.grid_sizes:
        t = np.zeros((batch, g, g, 3, 5 + cfg.num_classes), np.float32)
        t[:, g // 2, g // 2, 0, :5] = [0.5, 0.5, 0.2, 0.2, 1.0]
        t[:, g // 2, g // 2, 0, 5] = 1.0  # one-hot class 0
        targets.append(jnp.asarray(t))

    results = {}
    n1, n2 = max(iters // 4, 2), iters

    # -- 1. forward eval ----------------------------------------------------
    def fwd_eval(x):
        y = model.apply(variables, x, train=False)
        return _dep(x, y)

    t = time_per_iter(fwd_eval, images, n1, n2)
    results["fwd_eval"] = t
    log(f"fwd eval-mode:        {t * 1e3:7.2f} ms")

    # -- 2. forward train (BN batch stats) ----------------------------------
    def fwd_train(carry):
        x, bs = carry
        y, mut = model.apply(
            {"params": variables["params"], "batch_stats": bs},
            x, train=True, mutable=["batch_stats"])
        return _dep(x, y), mut["batch_stats"]

    carry = (images, variables["batch_stats"])
    t = time_per_iter(fwd_train, carry, n1, n2)
    results["fwd_train"] = t
    log(f"fwd train-mode:       {t * 1e3:7.2f} ms  "
        f"(BN-stat cost {1e3 * (t - results['fwd_eval']):+.2f})")

    # -- 3. forward + loss + grad -------------------------------------------
    def loss_fn(params, bs, x):
        preds, mut = model.apply(
            {"params": params, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"])
        total, *_ = yolo_loss_multiscale(
            preds, targets, anchors, cfg.num_classes, cfg.img_size)
        return total, mut["batch_stats"]

    def grad_step(carry):
        params, bs = carry
        (_, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bs, images)
        # fold grads back so iterations chain (numerically ~identity)
        params = jax.tree.map(lambda p, g: p + 0.0 * g, params, grads)
        return params, new_bs

    carry = (variables["params"], variables["batch_stats"])
    t = time_per_iter(grad_step, carry, n1, n2)
    results["fwd_bwd"] = t
    log(f"fwd+loss+grad:        {t * 1e3:7.2f} ms  "
        f"(backward cost {1e3 * (t - results['fwd_train']):+.2f})")

    # -- 4. full train step (same batch each iteration, carry = state) ------
    import optax

    from yolo_from_scratch_tpu.train.steps import TrainState, _make_loss_fn

    model2, tx, state = create_train_state(
        jax.random.PRNGKey(0), cfg, 1e-3, batch_size=1)
    state = jax.device_put(state, jax.devices()[0])
    state = set_learning_rate(state, 1e-3)
    loss_fn2 = _make_loss_fn(model2, cfg, False)

    def full_step(state):
        (_, (new_bs, *_rest)), grads = jax.value_and_grad(
            loss_fn2, has_aux=True)(state.params, state.batch_stats,
                                    images, targets)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bs, new_opt, state.step + 1)

    t = time_per_iter(full_step, state, n1, n2)
    results["train_step"] = t
    log(f"full train step:      {t * 1e3:7.2f} ms  "
        f"(optimizer cost {1e3 * (t - results['fwd_bwd']):+.2f})")
    log(f"=> {batch / t:7.0f} img/s")
    return results


def bench_convs(cfg, batch, iters):
    """Run every conv from the traced forward jaxpr standalone (scanned) and
    compare measured device time against its roofline floor. Duplicate
    signatures are measured once and weighted by their count."""
    convs, _ = forward_conv_costs(cfg, batch)
    counts = {}
    for c in convs:
        key = (c.lhs_shape, c.kernel_shape, c.strides, c.padding, c.dtype)
        counts.setdefault(key, [c, 0])[1] += 1
    rng = np.random.default_rng(0)
    dn = jax.lax.conv_dimension_numbers(
        convs[0].lhs_shape, convs[0].kernel_shape, ("NHWC", "HWIO", "NHWC"))

    rows, total_meas, total_floor = [], 0.0, 0.0
    for c, n in counts.values():
        dtype = jnp.dtype(c.dtype)
        x = jnp.asarray(rng.random(c.lhs_shape), jnp.float32).astype(dtype)
        w = jnp.asarray(
            rng.random(c.kernel_shape) * 0.01, jnp.float32).astype(dtype)

        conv = functools.partial(
            jax.lax.conv_general_dilated, window_strides=c.strides,
            padding=c.padding, dimension_numbers=dn)

        def step(x, w=w, conv=conv):
            y = conv(x, w)
            return _dep(x, y)

        t = time_per_iter(step, x, 100, 1100, reps=3)
        total_meas += t * n
        total_floor += c.t_min * n
        rows.append((c, t, n))
        log(f"conv {str(c.out_shape):>22} k{str(c.kernel_shape):>18} "
            f"s{c.strides[0]} x{n}: {t * 1e6:8.1f} us  floor "
            f"{c.t_min * 1e6:7.1f} us  ({t / c.t_min:5.1f}x)")
    log(f"sum of standalone convs: {total_meas * 1e3:.2f} ms  "
        f"(roofline floor {total_floor * 1e3:.2f} ms, "
        f"{total_meas / total_floor:.1f}x)")
    return rows


def bench_convs_bwd(cfg, batch, iters):
    """Time each traced conv's BACKWARD pair (grad-input + grad-kernel)
    standalone. Each backward conv moves the same FLOPs as the forward, so
    the per-conv floor is ~2x the forward floor — this locates which layers
    the backward pass executes inefficiently (the forward table can't:
    XLA lowers grad-input to a transposed/dilated conv and grad-kernel to
    a batch-contracting conv, with different layouts and tilings)."""
    convs, _ = forward_conv_costs(cfg, batch)
    counts = {}
    for c in convs:
        key = (c.lhs_shape, c.kernel_shape, c.strides, c.padding, c.dtype)
        counts.setdefault(key, [c, 0])[1] += 1
    rng = np.random.default_rng(0)
    dn = jax.lax.conv_dimension_numbers(
        convs[0].lhs_shape, convs[0].kernel_shape, ("NHWC", "HWIO", "NHWC"))

    rows, total_meas, total_floor = [], 0.0, 0.0
    for c, n in counts.values():
        dtype = jnp.dtype(c.dtype)
        x = jnp.asarray(rng.random(c.lhs_shape), jnp.float32).astype(dtype)
        w = jnp.asarray(
            rng.random(c.kernel_shape) * 0.01, jnp.float32).astype(dtype)
        ct = jnp.asarray(
            rng.random(c.out_shape) * 0.01, jnp.float32).astype(dtype)

        conv = functools.partial(
            jax.lax.conv_general_dilated, window_strides=c.strides,
            padding=c.padding, dimension_numbers=dn)

        def bwd_step(carry, w=w, conv=conv):
            # both grads feed the next iteration's (x, ct) so neither
            # backward conv is loop-invariant (XLA would hoist it out of
            # the scan and the slope would time nothing)
            x, ct = carry
            _, vjp = jax.vjp(conv, x, w)
            dx, dw = vjp(ct)
            return _dep(x, (dx, dw)), _dep(ct, (dx, dw))

        t = time_per_iter(bwd_step, (x, ct), 100, 2100, reps=3)
        floor = 2.0 * c.t_min  # two backward convs, each ~the fwd cost
        total_meas += t * n
        total_floor += floor * n
        rows.append((c, t, n))
        log(f"bwd  {str(c.out_shape):>22} k{str(c.kernel_shape):>18} "
            f"s{c.strides[0]} x{n}: {t * 1e6:8.1f} us  floor "
            f"{floor * 1e6:7.1f} us  ({t / floor:5.1f}x)")
    log(f"sum of standalone conv backwards: {total_meas * 1e3:.2f} ms  "
        f"(roofline floor {total_floor * 1e3:.2f} ms, "
        f"{total_meas / total_floor:.1f}x)")
    return rows


def bench_loss(cfg, batch, iters):
    """Time the multiscale loss fwd+grad standalone (random logits/dense
    targets) — isolates the loss's share of the train step's backward
    delta (stage 3 minus stage 2 bundles it with the model backward)."""
    rng = np.random.default_rng(0)
    anchors = cfg.anchors_array
    preds, targets = [], []
    for g in cfg.grid_sizes:
        shape = (batch, g, g, 3, 5 + cfg.num_classes)
        preds.append(jnp.asarray(rng.standard_normal(shape), jnp.float32))
        t = np.zeros(shape, np.float32)
        t[:, g // 2, g // 2, 0, :5] = [0.5, 0.5, 0.2, 0.2, 1.0]
        t[:, g // 2, g // 2, 0, 5] = 1.0  # one-hot class 0
        targets.append(jnp.asarray(t))

    def loss_total(preds):
        total, *_ = yolo_loss_multiscale(
            preds, targets, anchors, cfg.num_classes, cfg.img_size)
        return total

    def step(preds):
        grads = jax.grad(loss_total)(preds)
        return [_dep(p, g) for p, g in zip(preds, grads)]

    t = time_per_iter(step, preds, max(iters // 4, 2), iters)
    log(f"loss fwd+grad alone:  {t * 1e3:7.2f} ms")
    return t


def bench_compact(cfg, batch, iters):
    """Time the REAL compact train step (uint8 images + on-device target
    transport) dense vs sparse-loss, slope-style: the scanned trainer is
    fed (n, B, ...) step stacks of two lengths and the difference cancels
    dispatch overhead. This is the config-3-style workload where target/
    loss traffic scales with nc (bench_stages feeds prebuilt dense
    targets, so it never sees the assignment cost)."""
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_train_step_multi_compact,
        set_learning_rate,
    )

    rng = np.random.default_rng(0)
    k = 64
    n1, n2 = max(iters // 4, 2), iters

    def make_stack(n):
        imgs = (rng.random((n, batch, cfg.img_size, cfg.img_size, 3))
                * 255).astype(np.uint8)
        if cfg.packed_stem:
            from yolo_from_scratch_tpu.models.packed import pack_s2d_host

            imgs = pack_s2d_host(imgs)
        labels = np.zeros((n, batch, k, 5), np.float32)
        labels[..., 0] = rng.integers(0, cfg.num_classes, (n, batch, k))
        labels[..., 1:3] = rng.uniform(0.05, 0.95, (n, batch, k, 2))
        labels[..., 3:5] = rng.uniform(0.03, 0.3, (n, batch, k, 2))
        counts = rng.integers(4, 12, (n, batch)).astype(np.int32)
        return (jnp.asarray(imgs), jnp.asarray(labels),
                jnp.asarray(counts))

    out = {}
    for sparse in (False, True):
        model, tx, state0 = create_train_state(
            jax.random.PRNGKey(0), cfg, 1e-3, batch_size=1)
        state0 = jax.device_put(state0, jax.devices()[0])
        state0 = set_learning_rate(state0, 1e-3)
        step = make_train_step_multi_compact(model, tx, cfg, donate=False,
                                             sparse_loss=sparse)
        times = []
        for n in (n1, n2):
            stack = make_stack(n)
            t = time_dispatch(lambda s, st=stack: step(s, *st), state0)
            times.append(t)
        per = (times[1] - times[0]) / (n2 - n1)
        out[sparse] = per
        log(f"compact step ({'sparse' if sparse else 'dense '} loss, "
            f"nc={cfg.num_classes}): {per * 1e3:7.2f} ms  "
            f"=> {batch / per:7.0f} img/s")
    return out


def bench_packexp(cfg, batch, iters):
    """Decision experiment: would extending 2x2 packing through the
    80x80 natural stage (bb_p3_c3b-shaped C3) pay? Times the SAME
    parameters three ways, fwd and fwd+vjp (scan slope):

      dense    — C3 on the natural (B, 80, 80, c_p3) map
      packed   — PackedC3 on the 2x2-packed map, pack/unpack INSIDE
                 (what a minimal bolt-on would pay per C3)
      packed*  — PackedC3 with the boundary transposes excluded
                 (what full-stage integration would pay)

    The backward table says the 32-ch 3x3s run 5.9x off floor unpacked
    vs ~1.2x for their packed 128-ch@40x40 form, but the 1x1s pay 4x
    FLOPs when packed — this measures the composite, which is what
    decides the model change."""
    import functools as ft

    from flax import linen as nn

    from yolo_from_scratch_tpu.models.blocks import C3
    from yolo_from_scratch_tpu.models.packed import (
        PackedC3,
        pack_s2d,
        pack_s2d_host,
        unpack_s2d,
    )

    gs = cfg.img_size // 8  # the 80x80 level at 640
    c = cfg.c_p3
    n = cfg.repeats(2)
    dt = jnp.dtype(cfg.compute_dtype)
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((batch, gs, gs, c)).astype(np.float32)
    x = jnp.asarray(x_np, dt)
    xp = jnp.asarray(pack_s2d_host(x_np, 2), dt)

    dense = C3(c, n, dtype=dt)
    packed = PackedC3(c, n, packed=2, dtype=dt)
    variables = dense.init(jax.random.PRNGKey(0), x[:1])

    def run_dense(v, x):
        return dense.apply(v, x)

    def run_packed_boundary(v, x):
        return unpack_s2d(packed.apply(v, pack_s2d(x, 2)), 2)

    def run_packed_interior(v, xp):
        return packed.apply(v, xp)

    n1, n2 = max(iters // 4, 2), iters
    for name, fn, arg in (("dense   ", run_dense, x),
                          ("packed  ", run_packed_boundary, x),
                          ("packed* ", run_packed_interior, xp)):
        def fwd_step(a, fn=fn):
            return _dep(a, fn(variables, a))

        def bwd_step(carry, fn=fn):
            # grads wrt BOTH params and input feed the next carry so
            # neither the wgrad nor the dgrad convs can be eliminated
            a, ct = carry
            y, vjp = jax.vjp(fn, variables, a)
            dv, da = vjp(ct)
            return _dep(a, (da, dv)), _dep(ct, y)

        tf = time_per_iter(fwd_step, arg, n1 * 4, n2 * 4)
        ct0 = jnp.asarray(rng.standard_normal(
            jax.eval_shape(fn, variables, arg).shape), dt)
        tb = time_per_iter(bwd_step, (arg, ct0), n1 * 4, n2 * 4)
        log(f"c3b {name}: fwd {tf * 1e6:7.1f} us   fwd+vjp "
            f"{tb * 1e6:7.1f} us")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", default="s")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--nc", type=int, default=1,
                    help="num_classes (1 = headline bench; 80 = config-3 "
                         "regime, where dense loss/target traffic scales "
                         "with nc)")
    ap.add_argument("--iters", type=int, default=30,
                    help="scan length per dispatch")
    ap.add_argument("--convs", action="store_true",
                    help="also time every conv standalone")
    ap.add_argument("--convs-bwd", action="store_true",
                    help="also time every conv's backward pair standalone")
    ap.add_argument("--loss", action="store_true",
                    help="also time the multiscale loss fwd+grad standalone")
    ap.add_argument("--compact", action="store_true",
                    help="also time the real compact train step, dense "
                         "transport vs sparse loss")
    ap.add_argument("--packexp", action="store_true",
                    help="decision experiment: 80x80 C3 stage dense vs "
                         "2x2-packed (see bench_packexp)")
    ap.add_argument("--stages", action="store_true", default=None)
    ap.add_argument("--packed-stem", action="store_true",
                    help="evaluate the stem space-to-depth packed on "
                         "host-packed input (models/packed.py)")
    ap.add_argument("--packed-interior", action="store_true",
                    help="extend packing through the first C3 stage "
                         "(implies --packed-stem)")
    ap.add_argument("--packed-p3", action="store_true",
                    help="extend packing through the whole 80x80 P3 "
                         "level (implies --packed-interior)")
    a = ap.parse_args()

    cfg = YoloConfig.from_size(
        a.size, img_size=a.img_size, num_classes=a.nc,
        compute_dtype="bfloat16",
        packed_stem=a.packed_stem or a.packed_interior or a.packed_p3,
        packed_interior=a.packed_interior or a.packed_p3,
        packed_p3=a.packed_p3)
    log(f"backend: {jax.devices()[0]}  batch {a.batch} img {a.img_size} "
        f"'{a.size}' nc={a.nc} bf16, {a.iters} scanned iters/dispatch")
    if a.stages or not (a.convs or a.convs_bwd or a.loss or a.compact
                        or a.packexp):
        bench_stages(cfg, a.batch, a.iters)
    if a.convs:
        bench_convs(cfg, a.batch, a.iters)
    if a.convs_bwd:
        bench_convs_bwd(cfg, a.batch, a.iters)
    if a.loss:
        bench_loss(cfg, a.batch, a.iters)
    if a.compact:
        bench_compact(cfg, a.batch, a.iters)
    if a.packexp:
        bench_packexp(cfg, a.batch, a.iters)


if __name__ == "__main__":
    main()
