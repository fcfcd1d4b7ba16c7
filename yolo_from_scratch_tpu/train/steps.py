"""Jitted training / evaluation steps.

One `train_step` fuses forward, multi-scale loss, backward, global-norm
gradient clipping (max 10.0, reference: train.py:916) and the Adam update
(reference: train.py:1506) into a single XLA program. The learning rate
lives inside the optimizer state via `optax.inject_hyperparams`, so the
per-epoch LR schedule (reference steps its LambdaLR per epoch,
train.py:1543) mutates state instead of retracing.

Both steps are mesh-aware: with a data-parallel `Mesh` the caller shards
the batch on the `data` axis and keeps state replicated; XLA's SPMD
partitioner inserts the gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from yolo_from_scratch_tpu.config import INV255, YoloConfig
from yolo_from_scratch_tpu.models.yolo import YOLO
from yolo_from_scratch_tpu.ops.losses import yolo_loss_multiscale
from yolo_from_scratch_tpu.train.metrics import grid_metric_counts

GRAD_CLIP_NORM = 10.0  # reference: train.py:916


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(learning_rate: float = 1e-2, weight_decay: float = 0.0):
    """clip-by-global-norm(10) -> Adam, with injectable learning rate.

    `weight_decay` > 0 switches to AdamW (decoupled decay) — not in the
    reference (plain Adam, train.py:1506); exposed for the anchor-free
    nc=80 recipe study, where the decoupled cls branch memorizes the
    512-image train set (VERDICT r4 #1: val cls-acc 16.6% vs train
    100%)."""

    def tx_fn(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(GRAD_CLIP_NORM),
            (optax.adamw(learning_rate, weight_decay=weight_decay)
             if weight_decay else optax.adam(learning_rate)),
        )

    return optax.inject_hyperparams(tx_fn)(learning_rate=learning_rate)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected LR inside the optimizer state (per-epoch)."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def create_train_state(rng, cfg: YoloConfig, learning_rate=1e-2, batch_size=1,
                       weight_decay: float = 0.0):
    model = YOLO(cfg)
    dummy = jnp.zeros((batch_size, cfg.img_size, cfg.img_size, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    tx = make_optimizer(learning_rate, weight_decay)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return model, tx, state


def _make_loss_fn(model: YOLO, cfg: YoloConfig, quirk_640: bool,
                  af_compact: bool = False, sparse: bool = False,
                  af_hp: dict | None = None):
    """Head-family dispatch: anchor-based (reference parity) or the
    anchor-free decoupled head. Returns
    loss_fn(params, batch_stats, images, targets)
      -> (total, (new_batch_stats, bbox, obj, cls)).

    `af_compact`: anchor-free head fed by the compact path — `targets`
    is the explicit GT tuple (gt_boxes, gt_cls, gt_valid) produced by
    `_make_expand`, consumed by TAL with no dense transport.

    `sparse`: anchor head fed by the compact path with the gather-based
    loss (ops/losses_sparse.py) — `targets` is the (labels, valid)
    tuple; no dense maps are ever materialized.

    `af_hp`: optional anchor-free loss hyperparameter overrides
    (box_weight/cls_weight/dfl_weight/topk/alpha/beta) — the knobs the
    nc=80 recipe study sweeps (VERDICT r4 #1)."""
    anchors = cfg.anchors_array
    af_kw = dict(af_hp or {})

    if cfg.head_type == "anchor_free":
        from yolo_from_scratch_tpu.models.anchor_free import (
            yolo_loss_anchor_free,
            yolo_loss_anchor_free_from_gt,
        )

        def loss_fn(params, batch_stats, images, targets):
            preds, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            if af_compact:
                gt_boxes, gt_cls, gt_valid = targets
                total, bbox, cls = yolo_loss_anchor_free_from_gt(
                    preds, gt_boxes, gt_cls, gt_valid, cfg.num_classes,
                    cfg.img_size, **af_kw,
                )
            else:
                total, bbox, cls = yolo_loss_anchor_free(
                    preds, targets, cfg.num_classes, cfg.img_size, **af_kw
                )
            zero = jnp.zeros((), total.dtype)
            return total, (mutated["batch_stats"], bbox, zero, cls)

        return loss_fn

    def loss_fn(params, batch_stats, images, targets):
        preds, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        if sparse:
            from yolo_from_scratch_tpu.ops.losses_sparse import (
                yolo_loss_multiscale_sparse,
            )

            labels, valid = targets
            total, bbox, obj, cls = yolo_loss_multiscale_sparse(
                preds, labels, valid, anchors, cfg.num_classes,
                cfg.img_size, quirk_640
            )
        else:
            total, bbox, obj, cls = yolo_loss_multiscale(
                preds, targets, anchors, cfg.num_classes, cfg.img_size,
                quirk_640
            )
        return total, (mutated["batch_stats"], bbox, obj, cls)

    return loss_fn


def _make_augment(cfg: YoloConfig, device_augment, seed: int = 0):
    """device_augment: False | True/'full' (hflip + photometric jitter) |
    'flip' (hflip only — for datasets whose class signal lives in color).
    Returns a step-indexed device augmentation hook (ops/augment) or
    None."""
    if not device_augment:
        return None
    from yolo_from_scratch_tpu.ops.augment import make_device_augment

    return make_device_augment(cfg, seed=seed,
                               jitter=(device_augment != "flip"))


def make_train_step(model: YOLO, tx, cfg: YoloConfig, quirk_640: bool = False,
                    donate: bool = True, device_augment: bool = False,
                    augment_seed: int = 0, compact_targets: bool = False,
                    device_mosaic: bool = False, sparse_loss: bool = False):
    """Build the jitted train step: (state, images, targets3) -> (state, metrics).

    `device_augment`: apply random hflip + photometric jitter on-device
    inside the step (keyed by state.step — deterministic, varies per step).

    `compact_targets`: `targets` is a (labels (B, K, 5), counts (B,))
    tuple and the dense maps are rebuilt on-device
    (data/assign_device.py); pairs with `DataLoader(compact=K)` so the
    streaming path ships ~1 KB of labels per image instead of dense maps
    (~8.7 MB/img at nc=80 @640). uint8 images are normalized in-step.

    `sparse_loss` (with `compact_targets`, anchor head): skip the dense
    maps entirely — the gather-based ops/losses_sparse consumes
    (labels, valid) directly; augmentation moves to label level."""

    af_compact = compact_targets and cfg.head_type == "anchor_free"
    sparse_loss = sparse_loss and compact_targets and not af_compact
    loss_fn = _make_loss_fn(model, cfg, quirk_640, af_compact=af_compact,
                            sparse=sparse_loss)
    # anchor-free compact / sparse: augmentation rides the label-level
    # expand; the dense-level hook would not type-check on those targets
    aug = (None if af_compact or sparse_loss
           else _make_augment(cfg, device_augment, augment_seed))
    expand = _make_expand(cfg, compact_targets, mosaic=device_mosaic,
                          seed=augment_seed,
                          device_augment=device_augment,
                          sparse=sparse_loss)

    def train_step(state: TrainState, images, targets):
        images, targets = expand(state.step, images, targets)
        if aug is not None:
            images, targets = aug(state.step, images, targets)
        (total, (new_bs, bbox, obj, cls)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, images, targets)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        metrics = {"loss": total, "bbox": bbox, "obj": obj, "cls": cls}
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_train_step_multi(model: YOLO, tx, cfg: YoloConfig, quirk_640=False,
                          donate=True, device_augment: bool = False,
                          augment_seed: int = 0):
    """Scanned multi-step trainer: N sequential optimizer updates in ONE
    jitted dispatch.

    (state, images (N, B, S, S, 3), targets [(N, B, g, g, A, D)] x3)
      -> (state, metrics averaged over the N steps)

    Why: each Python->device dispatch of a full TrainState pytree costs
    ~10ms of host time on a weak host (and a round trip through the axon
    tunnel); `lax.scan` over pre-staged batches amortizes that — this is
    the high-throughput path the input queue feeds.

    `device_augment`: random hflip + jitter per scan step (the staged
    batches are fixed on device, so this is the ONLY way those epochs see
    augmentation at all — host augmentation never touches them).
    """
    loss_fn = _make_loss_fn(model, cfg, quirk_640)
    aug = _make_augment(cfg, device_augment, augment_seed)

    def one_step(state, images, targets):
        if images.dtype == jnp.uint8:
            # uint8 staging: 4x less HBM than f32 for scanned epochs; the
            # in-step normalize multiplies by the same f32 reciprocal as
            # the host loader (config.INV255) so both are bit-identical
            images = images.astype(jnp.float32) * INV255
        if aug is not None:
            images, targets = aug(state.step, images, targets)
        (total, (new_bs, bbox, obj, cls)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, images, targets)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_bs, new_opt_state, state.step + 1),
            {"loss": total, "bbox": bbox, "obj": obj, "cls": cls},
        )

    def train_steps(state, images, t3, t4, t5):
        def body(state, batch):
            imgs, a, b, c = batch
            return one_step(state, imgs, [a, b, c])

        state, metrics = jax.lax.scan(body, state, (images, t3, t4, t5))
        return state, jax.tree.map(jnp.mean, metrics)

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_steps, donate_argnums=donate_argnums)


def _make_expand(cfg: YoloConfig, compact_targets: bool,
                 mosaic: bool = False, seed: int = 0,
                 device_augment=False, sparse: bool = False):
    """Input adapter for the train steps: normalize uint8 images in-step,
    (when `mosaic`) compose a device-side 4-mosaic over the compact
    labels (ops/mosaic_device.py, keyed by the step index), and (when
    `compact_targets`) build the head's target representation on-device:
    dense maps for the anchor head (data/assign_device.py), the explicit
    (gt_boxes, gt_cls, gt_valid) TAL tuple for the anchor-free head —
    whose loss assigns from GT lists, so no dense transport exists at
    all on that path.

    `device_augment` applies at label level (ops/augment.
    augment_compact_batch) on the anchor-free compact path AND the
    sparse anchor path (`sparse=True`, which returns (labels, valid)
    for ops/losses_sparse with no dense transport); the dense anchor
    paths keep their dense-level hook in the step functions. (Label-
    level and dense-level hflip agree except when a flipped center
    lands exactly on a cell boundary — measure-zero for real data.)
    Returns expand(step, images, targets)."""
    if mosaic and not compact_targets:
        raise ValueError("device mosaic requires compact targets (it "
                         "transforms raw labels, not dense maps)")
    anchors = cfg.anchors_array
    af = cfg.head_type == "anchor_free"
    sparse = sparse and not af
    packed = bool(getattr(cfg, "packed_stem", False))
    # distinct stream from the flip/jitter hook (seed ^ a fixed salt)
    mosaic_base = jax.random.PRNGKey(seed ^ 0x6D6F7361) if mosaic else None
    aug_base = (jax.random.PRNGKey(seed)
                if (af or sparse) and compact_targets and device_augment
                else None)

    def expand(step, images, targets):
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) * INV255
        if not compact_targets:
            return images, targets

        labels, counts = targets
        k = labels.shape[1]
        if mosaic:
            from yolo_from_scratch_tpu.ops.mosaic_device import (
                mosaic_compact_batch,
            )

            key = jax.random.fold_in(mosaic_base, step)
            images, labels, valid = mosaic_compact_batch(
                key, images, labels, counts,
                min_box=2.0 / cfg.img_size, packed=packed,
            )
        else:
            valid = jnp.arange(k)[None, :] < counts[:, None]

        if af or sparse:
            if aug_base is not None:
                from yolo_from_scratch_tpu.ops.augment import (
                    augment_compact_batch,
                )

                images, labels = augment_compact_batch(
                    jax.random.fold_in(aug_base, step), images, labels,
                    valid, packed=packed,
                    jitter=(device_augment != "flip"))
            if sparse:
                return images, (labels, valid)
            cls_ids = jnp.clip(labels[..., 0].astype(jnp.int32), 0,
                               cfg.num_classes - 1)
            gt_cls = (jax.nn.one_hot(cls_ids, cfg.num_classes)
                      * valid[..., None])
            return images, (labels[..., 1:5], gt_cls,
                            valid.astype(jnp.float32))

        from yolo_from_scratch_tpu.data.assign_device import (
            assign_targets_device_masked_batch,
        )

        targets = assign_targets_device_masked_batch(
            labels, valid, anchors, cfg.img_size, cfg.num_classes
        )
        return images, targets

    return expand


def make_train_step_multi_compact(model: YOLO, tx, cfg: YoloConfig,
                                  quirk_640=False, donate=True,
                                  device_augment: bool = False,
                                  augment_seed: int = 0,
                                  device_mosaic: bool = False,
                                  sparse_loss: bool = False,
                                  af_hp: dict | None = None,
                                  step_lr=None,
                                  ema_decay: float | None = None):
    """Scanned multi-step trainer fed by COMPACT labels: the dense target
    maps are rebuilt on-device inside the scan body
    (data/assign_device.py) instead of being staged in HBM.

    (state, images (N, B, S, S, C) float32 OR uint8,
     labels (N, B, K, 5), counts (N, B) int32) -> (state, metrics)

    Why: at nc=80 @640 a dense target set is ~8.7 MB/image while the
    compact labels are ~1 KB/image — staging an epoch set on-device goes
    from targets-dominated to images-dominated, and uint8 image staging
    (normalized in-body; bit-identical to the host's, see config.INV255)
    cuts that by another 4x. Together they raise the pre-stageable dataset from ~512
    to ~2000+ images @640 nc=80 on a 16 GB chip. The per-step assignment
    is (B*K, 9) elementwise work + three scatters — noise next to the
    conv step.

    Both head families: the anchor head expands to dense maps on-device
    (or, with `sparse_loss=True`, skips dense maps entirely and feeds
    (labels, valid) to the gather-based ops/losses_sparse — same loss,
    no dense transport; augmentation moves to label level like the
    anchor-free path); the anchor-free head feeds the compact labels to
    TAL DIRECTLY (yolo_loss_anchor_free_from_gt) — its natural input is
    a GT list, so this path has no dense targets anywhere.

    Recipe-study knobs (VERDICT r4 #1): `af_hp` overrides the AF loss
    hyperparameters; `step_lr` (step:int32 -> f32) sets a PER-STEP LR
    inside the scan body (v8-style per-iteration warmup, vs the
    reference's per-epoch LambdaLR); `ema_decay` carries an EMA of
    params+batch_stats through the scan — the signature then becomes
    ((state, ema), images, labels, counts) -> ((state, ema), metrics).
    """
    af_compact = cfg.head_type == "anchor_free"
    sparse_loss = sparse_loss and not af_compact
    loss_fn = _make_loss_fn(model, cfg, quirk_640, af_compact=af_compact,
                            sparse=sparse_loss, af_hp=af_hp)
    aug = (None if af_compact or sparse_loss
           else _make_augment(cfg, device_augment, augment_seed))
    expand = _make_expand(cfg, compact_targets=True, mosaic=device_mosaic,
                          seed=augment_seed,
                          device_augment=device_augment,
                          sparse=sparse_loss)

    def one_step(state, images, labels, counts):
        if step_lr is not None:
            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = step_lr(state.step)
            state = state.replace(opt_state=opt_state)
        images, targets = expand(state.step, images, (labels, counts))
        if aug is not None:
            images, targets = aug(state.step, images, targets)
        (total, (new_bs, bbox, obj, cls)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, images, targets)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_bs, new_opt_state, state.step + 1),
            {"loss": total, "bbox": bbox, "obj": obj, "cls": cls},
        )

    if ema_decay is not None:
        from yolo_from_scratch_tpu.train.ema import ema_update

        def train_steps_ema(state_and_ema, images, labels, counts):
            def body(carry, batch):
                state, ema = carry
                state, metrics = one_step(state, *batch)
                ema = ema_update(
                    ema,
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    state.step, decay=ema_decay,
                )
                return (state, ema), metrics

            carry, metrics = jax.lax.scan(
                body, state_and_ema, (images, labels, counts))
            return carry, jax.tree.map(jnp.mean, metrics)

        donate_argnums = (0,) if donate else ()
        return jax.jit(train_steps_ema, donate_argnums=donate_argnums)

    def train_steps(state, images, labels, counts):
        def body(state, batch):
            return one_step(state, *batch)

        state, metrics = jax.lax.scan(body, state, (images, labels, counts))
        return state, jax.tree.map(jnp.mean, metrics)

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_steps, donate_argnums=donate_argnums)


def make_train_step_multi_pool(model: YOLO, tx, cfg: YoloConfig,
                               quirk_640=False, donate=True,
                               device_augment: bool = False,
                               augment_seed: int = 0,
                               device_mosaic: bool = False,
                               sparse_loss: bool = False,
                               af_hp: dict | None = None):
    """Scanned multi-step trainer sampling from a DEVICE-RESIDENT pool
    (data/stream.PoolStream): each scan step gathers its batch from the
    staged pool by index, so the host->device link carries only fresh
    pool refreshes + a tiny (N, B) index array per dispatch.

    (state, pool_images (P, H, W, C) uint8, pool_labels (P, K, 5),
     pool_counts (P,), idx (N, B) int32) -> (state, metrics)

    The pool arrays are NOT donated — they persist across dispatches and
    are refreshed in place via the donated slot writer (PoolStream).
    Sampling + expansion reuse the compact-path machinery: uint8
    normalize, optional device mosaic/augment, on-device target assembly
    (dense maps for the anchor head, GT lists for TAL).
    """
    af_compact = cfg.head_type == "anchor_free"
    sparse_loss = sparse_loss and not af_compact
    loss_fn = _make_loss_fn(model, cfg, quirk_640, af_compact=af_compact,
                            sparse=sparse_loss, af_hp=af_hp)
    aug = (None if af_compact or sparse_loss
           else _make_augment(cfg, device_augment, augment_seed))
    expand = _make_expand(cfg, compact_targets=True, mosaic=device_mosaic,
                          seed=augment_seed,
                          device_augment=device_augment,
                          sparse=sparse_loss)

    def one_step(state, images, labels, counts):
        images, targets = expand(state.step, images, (labels, counts))
        if aug is not None:
            images, targets = aug(state.step, images, targets)
        (total, (new_bs, bbox, obj, cls)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, images, targets)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_bs, new_opt_state, state.step + 1),
            {"loss": total, "bbox": bbox, "obj": obj, "cls": cls},
        )

    def train_steps(state, pool_images, pool_labels, pool_counts, idx):
        def body(state, idx_step):
            images = jnp.take(pool_images, idx_step, axis=0)
            labels = jnp.take(pool_labels, idx_step, axis=0)
            counts = jnp.take(pool_counts, idx_step, axis=0)
            return one_step(state, images, labels, counts)

        state, metrics = jax.lax.scan(body, state, idx)
        return state, jax.tree.map(jnp.mean, metrics)

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_steps, donate_argnums=donate_argnums)


def make_train_step_accum(model: YOLO, tx, cfg: YoloConfig, n_accum: int,
                          quirk_640: bool = False, donate: bool = True,
                          device_augment: bool = False,
                          augment_seed: int = 0):
    """Gradient-accumulation trainer: ONE optimizer update from `n_accum`
    micro-batches (mean of micro-batch gradients == the gradient of the
    concatenated batch for mean-reduced losses, up to the per-batch masked
    bbox/cls denominators).

    (state, images (n_accum, B, S, S, 3), targets [(n_accum, B, ...)]x3)
      -> (state, metrics averaged over micro-batches)

    Use when the desired effective batch exceeds HBM at full resolution
    (e.g. 1280² training) — activations only ever materialize for one
    micro-batch (lax.scan), while the update sees the full batch.
    """
    loss_fn = _make_loss_fn(model, cfg, quirk_640)
    aug = _make_augment(cfg, device_augment, augment_seed)

    def grads_one(params, batch_stats, images, targets):
        (total, (new_bs, bbox, obj, cls)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, images, targets)
        return grads, new_bs, {"loss": total, "bbox": bbox, "obj": obj,
                               "cls": cls}

    def train_step(state: TrainState, images, t3, t4, t5):
        zero_grads = jax.tree.map(jnp.zeros_like, state.params)

        def body(carry, batch):
            grads_acc, batch_stats = carry
            micro, imgs, a, b, c = batch
            targets = [a, b, c]
            if aug is not None:
                # distinct key per (step, micro-batch)
                imgs, targets = aug(state.step * n_accum + micro, imgs,
                                    targets)
            grads, new_bs, metrics = grads_one(
                state.params, batch_stats, imgs, targets
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, new_bs), metrics

        (grads_sum, new_bs), metrics = jax.lax.scan(
            body, (zero_grads, state.batch_stats),
            (jnp.arange(n_accum, dtype=jnp.int32), images, t3, t4, t5)
        )
        grads = jax.tree.map(lambda g: g / n_accum, grads_sum)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_bs, new_opt_state,
                               state.step + 1)
        return new_state, jax.tree.map(jnp.mean, metrics)

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(model: YOLO, cfg: YoloConfig, conf_threshold=0.5,
                   iou_threshold=0.5, quirk_640: bool = False,
                   compact_targets: bool = False):
    """Build the jitted eval step: loss + grid-aligned TP/FP/FN counts.

    Replaces the reference's quadruple Python loop (train.py:1002-1024)
    with dense on-device counting; on a mesh the counts reduce with the
    same psum XLA inserts for the loss mean.

    `compact_targets`: `targets` is a (labels (B, K, 5), counts (B,))
    tuple expanded on-device (data/assign_device.py) and uint8 images
    are normalized in-step — pairs with `DataLoader(compact=K)` so val
    batches also ship ~1 KB/image instead of dense maps.
    """

    anchors = cfg.anchors_array
    expand = _make_expand(cfg, compact_targets)

    if cfg.head_type == "anchor_free":
        from yolo_from_scratch_tpu.config import STRIDES
        from yolo_from_scratch_tpu.models.anchor_free import (
            assign_targets_anchor_free_device_batch,
            yolo_loss_anchor_free,
            yolo_loss_anchor_free_from_gt,
        )
        from yolo_from_scratch_tpu.train.metrics import (
            grid_metric_counts_anchor_free,
        )

        @jax.jit
        def eval_step_af(params, batch_stats, images, targets):
            if compact_targets:
                # compact val batches: uint8 images + (labels, counts).
                # Loss goes straight from the GT list (TAL needs no dense
                # maps); the grid metric's dense transport is rebuilt
                # on-device — identical to the host assignment.
                labels, counts = targets
                if images.dtype == jnp.uint8:
                    images = images.astype(jnp.float32) * INV255
                preds = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    images, train=False,
                )
                k = labels.shape[1]
                valid = (jnp.arange(k)[None, :] < counts[:, None]
                         ).astype(jnp.float32)
                cls_ids = jnp.clip(labels[..., 0].astype(jnp.int32), 0,
                                   cfg.num_classes - 1)
                gt_cls = (jax.nn.one_hot(cls_ids, cfg.num_classes)
                          * valid[..., None])
                loss, _, _ = yolo_loss_anchor_free_from_gt(
                    preds, labels[..., 1:5], gt_cls, valid,
                    cfg.num_classes, cfg.img_size,
                )
                targets = assign_targets_anchor_free_device_batch(
                    labels, counts, cfg.img_size, cfg.num_classes
                )
            else:
                preds = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    images, train=False,
                )
                loss, _, _ = yolo_loss_anchor_free(
                    preds, targets, cfg.num_classes, cfg.img_size
                )
            b = images.shape[0]
            tp = fp = fn = jnp.zeros((b,), jnp.int32)
            for pred, tgt, stride in zip(preds, targets, STRIDES):
                t, f, n = grid_metric_counts_anchor_free(
                    pred, tgt, stride, cfg.img_size, conf_threshold,
                    iou_threshold, per_image=True,
                )
                tp, fp, fn = tp + t, fp + f, fn + n
            return loss, tp, fp, fn

        return eval_step_af

    @jax.jit
    def eval_step(params, batch_stats, images, targets):
        images, targets = expand(0, images, targets)
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        loss, _, _, _ = yolo_loss_multiscale(
            preds, targets, anchors, cfg.num_classes, cfg.img_size, quirk_640
        )
        b = images.shape[0]
        tp = fp = fn = jnp.zeros((b,), jnp.int32)
        for pred, tgt, anc in zip(preds, targets, anchors):
            t, f, n = grid_metric_counts(
                pred, tgt, anc, cfg.img_size, conf_threshold, iou_threshold,
                quirk_640, per_image=True,
            )
            tp, fp, fn = tp + t, fp + f, fn + n
        # per-image (B,) count vectors so callers can drop padded rows
        return loss, tp, fp, fn

    return eval_step
