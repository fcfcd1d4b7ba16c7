"""Epoch-level orchestration: train loop, eval loop, checkpointing.

Mirrors the reference driver (reference: train.py:888-926 train_epoch,
train.py:960-1032 eval_epoch, train.py:1492-1545 training loop): per-epoch
LR stepping, eval + checkpoint every epoch, identical stdout contract.

TPU specifics: batches stream through the prefetching loader, are placed
on the device (sharded over the mesh's `data` axis when a mesh is given),
and per-batch metrics stay on device until the end of the epoch — the
reference's per-batch `.item()` syncs (train.py:920-923) would serialize
host and TPU.
"""

from __future__ import annotations

import time
from datetime import datetime

import jax
import numpy as np

from yolo_from_scratch_tpu.data.device_queue import DeviceQueue
from yolo_from_scratch_tpu.train.metrics import prf1
from yolo_from_scratch_tpu.train.schedule import lr_at_epoch
from yolo_from_scratch_tpu.train.steps import set_learning_rate
from yolo_from_scratch_tpu.utils.checkpoint import save_checkpoint


def train_epoch(train_step, state, loader, mesh=None):
    """One epoch. Returns (state, mean_total, mean_bbox, mean_obj, mean_cls,
    images_seen, seconds). Batches stream through the double-buffered
    DeviceQueue (transfers issued one step ahead)."""
    metrics_acc = []
    n_images = 0
    t0 = time.perf_counter()
    for images, targets, valid in DeviceQueue(loader, mesh):
        n_images += valid
        state, metrics = train_step(state, images, targets)
        metrics_acc.append(metrics)
    # single host sync at epoch end
    metrics_acc = jax.device_get(metrics_acc)
    dt = time.perf_counter() - t0
    n = max(len(metrics_acc), 1)
    mean = lambda k: float(sum(m[k] for m in metrics_acc)) / n
    return state, mean("loss"), mean("bbox"), mean("obj"), mean("cls"), n_images, dt


def _eval_counts(eval_step, params, batch_stats, loader, mesh=None):
    """Per-loader eval accumulation: ([batch losses], tp, fp, fn). The
    per-process piece of `eval_epoch` — what each host computes on its
    shard before the cross-process sum."""
    # place params once — callers may pass raw numpy checkpoint arrays,
    # which would otherwise re-upload the full model every batch
    if mesh is not None and mesh.size > 1:
        from yolo_from_scratch_tpu.parallel.mesh import replicated_sharding

        sh = replicated_sharding(mesh)
        params = jax.device_put(params, sh)
        batch_stats = jax.device_put(batch_stats, sh)
    else:
        dev = jax.local_devices()[0]

        def _localize(t):
            # multihost: train-state arrays live replicated on the GLOBAL
            # mesh and are not fully addressable from one process — pull
            # this process's (complete) replica before re-placing locally
            if isinstance(t, jax.Array) and not t.is_fully_addressable:
                return jax.device_get(t)
            return t

        params = jax.device_put(jax.tree.map(_localize, params), dev)
        batch_stats = jax.device_put(
            jax.tree.map(_localize, batch_stats), dev)
    losses, tps, fps, fns = [], 0, 0, 0
    per_batch = []
    for images, targets, valid in DeviceQueue(loader, mesh):
        loss, tp, fp, fn = eval_step(params, batch_stats, images, targets)
        per_batch.append((loss, tp, fp, fn, valid))
    for loss, tp, fp, fn, valid in per_batch:
        loss, tp, fp, fn = jax.device_get((loss, tp, fp, fn))
        losses.append(float(loss))
        tp, fp, fn = np.asarray(tp), np.asarray(fp), np.asarray(fn)
        # per-image count vectors: sum only the valid (non-padded) rows
        tps += int(tp[:valid].sum())
        fps += int(fp[:valid].sum())
        fns += int(fn[:valid].sum())
    return losses, tps, fps, fns


def eval_epoch(eval_step, params, batch_stats, loader, mesh=None):
    """Loss + grid-aligned P/R/F1 over a loader
    (reference: train.py:960-1032). Returns (loss, P%, R%, F1%).

    Multi-host: the counting runs LOCALLY on each process (mesh ignored)
    — the per-image tp/fp/fn vectors of a cross-host global batch are
    not addressable from any single process, and the local `valid` count
    could not mask a global batch anyway. Each process counts its own
    loader shard, then the five scalars are summed across processes
    (parallel.distributed.global_eval_reduce), so the returned P/R/F1
    and loss are GLOBAL — matching the reference's single-process eval
    exactly when the shards partition the dataset (when process_count
    does not divide the dataset size, the wrap-padded shard rule counts
    up to process_count-1 duplicate images, the standard distributed-
    sampler approximation)."""
    multihost = mesh is not None and jax.process_count() > 1
    if multihost:
        mesh = None
    losses, tps, fps, fns = _eval_counts(
        eval_step, params, batch_stats, loader, mesh)
    if multihost:
        from yolo_from_scratch_tpu.parallel.distributed import (
            global_eval_reduce,
        )

        tps, fps, fns, loss_sum, n_batches = global_eval_reduce(
            tps, fps, fns, float(np.sum(losses)), len(losses))
        avg_loss = loss_sum / n_batches if n_batches else 0.0
    else:
        avg_loss = float(np.mean(losses)) if losses else 0.0
    p, r, f1 = prf1(tps, fps, fns)
    return avg_loss, p, r, f1


def fit(
    state,
    train_step,
    eval_step,
    train_loader,
    val_loader,
    cfg,
    epochs=100,
    initial_lr=1e-2,
    min_lr=1e-4,
    warmup_epochs=3,
    mesh=None,
    save_path=None,
    log=print,
    metrics_path=None,
    start_epoch=0,
    save_opt_state=True,
    use_ema=False,
    ema_decay=0.9999,
    initial_ema=None,
    multi_scale=None,
    stream=None,
    det_eval=None,
):
    """Full training driver (reference: train.py:1520-1545): per-epoch
    train + eval + checkpoint + LR step. Returns (state, save_path).

    Beyond the reference: checkpoints carry the optimizer state and epoch,
    `start_epoch` resumes mid-schedule (the reference always restarts from
    scratch — SURVEY.md §5.3), and `use_ema` maintains an exponential
    moving average of the weights — eval and the saved checkpoint then use
    the EMA params (YOLOv5 practice).

    `metrics_path`: optional JSONL file receiving one structured record per
    epoch (SURVEY.md §5.5).

    `stream`: optional ChunkStream/PoolStream (data/stream.py). When set,
    training epochs run `stream.run_epoch(train_step, state)` — the
    scanned out-of-HBM path over the disk cache — and `train_loader` is
    unused. Eval still runs through `val_loader` every epoch. Mutually
    exclusive with `use_ema`/`multi_scale` (the CLI guards this).

    `det_eval`: optional callable (params, batch_stats) -> (P%, R%, F1%)
    computing DETECTION-level metrics (NMS output vs GT at a fixed conf
    operating point) on the val split — appended to the epoch line and
    the metrics JSONL. This is the honest per-epoch metric for the
    anchor-free TAL head, whose cell-aligned grid P/R/F1 understates it
    (train/metrics.py caveat); the grid numbers keep the reference's
    stdout contract either way.

    `multi_scale`: optional list of (train_step, train_loader) pairs, one
    per resolution bucket — epoch e trains with pair e % len (YOLOv5-style
    multi-scale augmentation, TPU-idiomatic: a SMALL static set of
    resolutions, one compiled program each, rotated per epoch so the
    scanned/prefetched pipeline keeps static shapes; per-batch random
    sizes would defeat XLA's shape specialization). Parameters are fully
    convolutional, so one TrainState serves every bucket; eval and the
    checkpoint stay at the base cfg.img_size. When given, the positional
    `train_step`/`train_loader` are unused for training."""
    from yolo_from_scratch_tpu.utils.metrics_log import MetricsLogger

    if save_path is None:
        timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        save_path = f"yolo_{timestamp}.ckpt"
    # multi-host: only process 0 appends to the (possibly shared-FS)
    # JSONL — same race the process-0 checkpoint guard below avoids.
    # Per-epoch stdout still prints on every host (each has its own
    # console), and n_imgs/img_s are PER-PROCESS figures.
    metrics_logger = MetricsLogger(
        metrics_path if jax.process_index() == 0 else None)

    # one (step, loader) pair per resolution bucket; single-scale is the
    # degenerate one-bucket schedule
    schedule = list(multi_scale) if multi_scale else [
        (train_step, train_loader)]

    ema = None  # {'params', 'batch_stats'} — BN buffers average too
    if use_ema:
        from yolo_from_scratch_tpu.train.ema import (
            ema_init,
            wrap_train_step_with_ema,
        )

        if initial_ema is not None:
            # --resume path: continue the checkpointed average (stored as
            # the deployment 'model' weights) instead of re-pinning the EMA
            # to the resume-point raw snapshot — at a restored step the
            # warmup factor is already ~decay, so a re-init would keep
            # evals on stale raw weights for ~1/(1-decay) steps.
            ema = ema_init(initial_ema)
        else:
            ema = ema_init({"params": state.params,
                            "batch_stats": state.batch_stats})
        schedule = [
            (jax.jit(
                wrap_train_step_with_ema(fn, decay=ema_decay),
                donate_argnums=(0,),  # keep plain-path donation semantics
            ), loader)
            for fn, loader in schedule
        ]

    try:
        state, save_path = _fit_epochs(
            start_epoch, epochs, warmup_epochs, initial_lr, min_lr,
            schedule, state, ema, use_ema, stream, mesh, eval_step,
            val_loader, det_eval, log, metrics_logger, save_path, cfg,
            save_opt_state, train_epoch, eval_epoch,
        )
    finally:
        if stream is not None and hasattr(stream, "stop"):
            # PoolStream's persistent refresher must not keep staging
            # transfers after the last epoch — nor after a training
            # failure (the refresher would otherwise run for the rest of
            # the process lifetime; ADVICE r4)
            stream.stop()
    return state, save_path


def _fit_epochs(start_epoch, epochs, warmup_epochs, initial_lr, min_lr,
                schedule, state, ema, use_ema, stream, mesh, eval_step,
                val_loader, det_eval, log, metrics_logger, save_path, cfg,
                save_opt_state, train_epoch, eval_epoch):
    """fit()'s epoch loop, split out so the stream shutdown wraps it in
    one try/finally."""
    for epoch in range(start_epoch, epochs):
        lr = lr_at_epoch(epoch, warmup_epochs, epochs, initial_lr, min_lr)
        state = set_learning_rate(state, lr)
        epoch_step, epoch_loader = schedule[epoch % len(schedule)]

        ingest_img_s = None
        if stream is not None:
            state, means, n_imgs, dt = stream.run_epoch(epoch_step, state)
            loss, bbox, obj, cls = (means.get(k, 0.0) for k in
                                    ("loss", "bbox", "obj", "cls"))
            ingest_img_s = means.get("ingest_img_s")
        elif use_ema:
            carry = (state, ema)
            carry, loss, bbox, obj, cls, n_imgs, dt = train_epoch(
                epoch_step, carry, epoch_loader, mesh
            )
            state, ema = carry
        else:
            state, loss, bbox, obj, cls, n_imgs, dt = train_epoch(
                epoch_step, state, epoch_loader, mesh
            )
        eval_params = ema["params"] if use_ema else state.params
        eval_stats = ema["batch_stats"] if use_ema else state.batch_stats
        val_loss, val_p, val_r, val_f1 = eval_epoch(
            eval_step, eval_params, eval_stats, val_loader, mesh
        )

        det = None
        if det_eval is not None:
            det = det_eval(eval_params, eval_stats)

        ingest = (f" | ingest {ingest_img_s:.1f} img/s"
                  if ingest_img_s is not None else "")
        det_str = (f" | Det: P {det[0]:.1f}%, R {det[1]:.1f}%, "
                   f"F1 {det[2]:.1f}%" if det is not None else "")
        log(
            f"Epoch {epoch + 1}: "
            f"Loss: {loss:.4f} (bbox: {bbox:.4f}, obj: {obj:.4f}, cls: {cls:.4f}) | "
            f"Val: Loss {val_loss:.4f}, P {val_p:.1f}%, R {val_r:.1f}%, "
            f"F1 {val_f1:.1f}%{det_str} | LR: {lr:.6f} | "
            f"{n_imgs / max(dt, 1e-9):.1f} img/s"
            f"{ingest}"
        )
        record = {
            "epoch": epoch + 1, "loss": loss, "bbox": bbox, "obj": obj,
            "cls": cls, "val_loss": val_loss, "val_precision": val_p,
            "val_recall": val_r, "val_f1": val_f1, "lr": lr,
            "images_per_sec": n_imgs / max(dt, 1e-9),
        }
        if det is not None:
            record["det_precision"], record["det_recall"], \
                record["det_f1"] = det
        if ingest_img_s is not None:
            record["ingest_images_per_sec"] = ingest_img_s
        metrics_logger.log(record)

        # multi-host: params are replicated, so only process 0 writes the
        # (identical) checkpoint — concurrent writers on a shared FS race
        if jax.process_index() != 0:
            continue
        # 'model' holds the DEPLOYMENT weights (EMA when enabled); the raw
        # training trajectory + step ride in extra so --resume restores the
        # true optimization state, not the smoothed average
        extra = {"step": int(jax.device_get(state.step))}
        if use_ema:
            extra["raw_params"] = jax.device_get(state.params)
            extra["raw_batch_stats"] = jax.device_get(state.batch_stats)
        save_checkpoint(
            save_path,
            {"params": jax.device_get(eval_params),
             "batch_stats": jax.device_get(eval_stats if use_ema
                                           else state.batch_stats)},
            cfg,
            epoch=epoch,
            opt_state=state.opt_state if save_opt_state else None,
            extra=extra,
        )

    return state, save_path


def restore_train_state(ckpt_path, tx):
    """Rebuild a TrainState (incl. optimizer state when present) from a
    checkpoint for `--resume`. Returns (state, cfg, start_epoch, ema_vars)
    where `ema_vars` is the checkpoint's averaged deployment weights
    ({'params', 'batch_stats'}) when it was written with --ema, else None
    — pass it to fit(initial_ema=...) so a resumed EMA continues the
    checkpointed average instead of restarting from the raw snapshot."""
    import jax.numpy as jnp
    from flax import serialization

    from yolo_from_scratch_tpu.train.steps import TrainState
    from yolo_from_scratch_tpu.utils.checkpoint import load_checkpoint

    variables, cfg, meta = load_checkpoint(ckpt_path)
    extra = meta.get("extra") or {}
    # EMA checkpoints store the deployment (averaged) weights as 'model';
    # the raw training trajectory rides in extra — resume from THAT so the
    # restored Adam moments match the weights they were accumulated for
    params = extra.get("raw_params", variables["params"])
    batch_stats = extra.get("raw_batch_stats", variables["batch_stats"])
    ema_vars = None
    if "raw_params" in extra:
        ema_vars = {"params": variables["params"],
                    "batch_stats": variables["batch_stats"]}
    opt_state = tx.init(params)
    if meta.get("opt_state") is not None:
        opt_state = serialization.from_state_dict(opt_state, meta["opt_state"])
    step = int(extra.get("step", 0))
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.asarray(step, jnp.int32),
    )
    return state, cfg, meta["epoch"] + 1, ema_vars
