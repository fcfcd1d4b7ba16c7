#!/usr/bin/env python
"""Train + measure the BASELINE.json configs end to end on the TPU.

Each config: synthesize its dataset regime, (optionally) run the k-means
anchor optimizer and feed the anchors back, train the 's' model with the
scanned multi-step trainer, record steady-state train img/s (hard-sync
methodology, see BASELINE.md), then evaluate mAP on the unseen val split
through the batched NMS inference path. One JSON line per config is
appended to benchmarks/configs_results.jsonl.

    python benchmarks/configs.py 2      # nc=5 @416
    python benchmarks/configs.py 3      # nc=80 @640 + k-means anchors
    python benchmarks/configs.py 4      # 1280x1280 small-object
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yolo_from_scratch_tpu.config import YoloConfig  # noqa: E402
from yolo_from_scratch_tpu.data.dataset import YoloDataset  # noqa: E402
from yolo_from_scratch_tpu.infer.predict import BatchPredictor  # noqa: E402
from yolo_from_scratch_tpu.train.map_eval import evaluate_map  # noqa: E402
from yolo_from_scratch_tpu.train.schedule import lr_at_epoch  # noqa: E402
from yolo_from_scratch_tpu.train.steps import (  # noqa: E402
    create_train_state,
    make_train_step_multi_compact,
    set_learning_rate,
)
from yolo_from_scratch_tpu.utils.synth import make_dataset  # noqa: E402

CONFIGS = {
    "2": dict(name="nc5_416", num_classes=5, img_size=416,
              box_range=(0.08, 0.35), n_train=512, n_val=48, n_min=1,
              n_max=4, epochs=300, kmeans=False),
    "3": dict(name="coco80_640_kmeans", num_classes=80, img_size=640,
              box_range=(0.06, 0.35), n_train=512, n_val=64, n_min=4,
              n_max=8, epochs=300, kmeans=True),
    "4": dict(name="small_obj_1280", num_classes=1, img_size=1280,
              box_range=(0.015, 0.06), n_train=48, n_val=12, n_min=2,
              n_max=5, epochs=240, kmeans=False),
}


def _recipe_tag(spec):
    """Filename tag for the recipe-study knobs so A/B runs of the same
    regime keep distinct checkpoints/ips records."""
    parts = []
    if spec.get("ingest_cap"):
        parts.append(f"cap{spec['ingest_cap']}")
    if spec.get("mosaic"):
        parts.append("mosaic")
    if spec.get("step_lr"):
        parts.append("steplr")
    if spec.get("wd"):
        parts.append(f"wd{spec['wd']}")
    if spec.get("ema"):
        parts.append(f"ema{spec['ema']}")
    for k, v in sorted((spec.get("af_hp") or {}).items()):
        parts.append(f"{k}{v}")
    if spec.get("_lr") not in (None, 5e-3):
        parts.append(f"lr{spec['_lr']}")
    return ("_" + "_".join(parts)).replace(" ", "") if parts else ""


def run(spec, lr=5e-3, batch=8, stage="all", augment=False, mosaic=False,
        sparse=False):
    """stage: 'all' | 'train' (train + save ckpt, skip eval) | 'eval'
    (load ckpt, mAP only) — the axon remote compiler makes train + eval
    compiles together overrun a single 10-minute call budget.

    augment: device-side hflip + photometric jitter inside the scanned
    step (ops/augment.py) — the pre-staged epochs otherwise repeat the
    exact same batches, which caps the small-data configs."""
    spec["_lr"] = lr
    root = f"/tmp/cfgbench_{spec['name']}"
    tag = _recipe_tag(spec)
    # pool (echo) runs share the dataset/cache with the pre-staged run of
    # the same regime but keep their own checkpoint
    ckpt = (f"{root}/trained_pool{spec['pool']}{tag}.ckpt"
            if spec.get("pool") else f"{root}/trained{tag}.ckpt")
    if stage == "eval":
        from yolo_from_scratch_tpu.utils.checkpoint import load_checkpoint

        variables, cfg, _ = load_checkpoint(ckpt)
        # the train stage persisted its throughput so the recorded result
        # row is a self-contained measurement (train + eval of one run)
        ips_file = Path(root) / f"train_ips{tag}.json"
        train_ips = None
        if ips_file.exists():
            rec = json.loads(ips_file.read_text())
            train_ips = rec["train_img_s"]
            # pool-mode telemetry persists across the stage split so the
            # recorded result row is self-contained
            if rec.get("ingest_img_s") is not None:
                spec["_ingest_img_s"] = rec["ingest_img_s"]
                spec["_echo_factor"] = rec.get("echo_factor")
        return _eval(spec, cfg, variables, root, train_ips=train_ips)
    yaml_path = Path(root) / "data.yaml"
    if not yaml_path.exists():  # reuse across train/eval stages and retries
        yaml_path = make_dataset(
            root, spec["n_train"], spec["n_val"], spec["img_size"], seed=0,
            num_classes=spec["num_classes"], n_min=spec["n_min"],
            n_max=spec["n_max"], box_range=spec["box_range"],
            class_mode=spec.get("class_mode", "color"),
            n_distract=spec.get("n_distract", 0),
        )
    anchors = None
    if spec["kmeans"]:
        from yolo_from_scratch_tpu.utils.anchors import (
            compute_optimal_anchors,
        )

        # k-means is an offline tool: keep its jit off the slow remote
        # TPU compiler
        with jax.default_device(jax.devices("cpu")[0]):
            anchors = compute_optimal_anchors(str(yaml_path),
                                              img_size=spec["img_size"])
        print(f"k-means anchors: {anchors}", flush=True)

    cfg = YoloConfig(
        num_classes=spec["num_classes"], img_size=spec["img_size"],
        compute_dtype="bfloat16", packed_stem=True, packed_interior=True,
        packed_p3=True, head_type=spec.get("head", "anchor"),
        **({"anchors": anchors} if anchors is not None else {}),
    )
    ds = YoloDataset(f"{root}/train/images", cfg.num_classes,
                     cfg.anchors_array, cfg.img_size)
    capacity = max(16, 2 * spec["n_max"])
    pool = spec.get("pool", 0)
    if pool:
        # Echo A/B mode (VERDICT r4 #8): train through the PoolStream
        # (HBM-resident pool refreshed at this host's constrained link
        # rate — data echoing) for the SAME step count as the pre-staged
        # run, so the recorded mAP delta isolates what echo costs.
        from yolo_from_scratch_tpu.data.cache import ensure_cache
        from yolo_from_scratch_tpu.data.stream import PoolStream

        cache = ensure_cache(ds, capacity=capacity, packed=cfg.packed_stem)
        stream = PoolStream(cache, pool_size=pool, batch_size=batch,
                            steps_per_chunk=16, seed=0,
                            max_ingest_img_s=spec.get("ingest_cap"))
        print(f"{spec['name']}: pool mode — {len(cache)} cached images, "
              f"{pool}-slot HBM pool, {stream.steps_per_epoch} "
              f"steps/epoch", flush=True)
        imgs = labels = counts = None
    else:
        # Compact staging (data/assign_device.py): uint8 images + padded
        # raw labels on device; the dense (gs,gs,A,5+nc) maps are rebuilt
        # inside the scanned step. Dense staging at nc=80 @640 is
        # ~8.7 MB/img of targets + 4.9 MB/img of f32 packed pixels
        # (~7 GB at 512 images); compact is ~1.2 MB/img total, so 1024+
        # images fit in HBM.
        from yolo_from_scratch_tpu.models.packed import pack_s2d_host

        n_scan = len(ds) // batch
        imgs_np, labels_np, counts_np = [], [], []
        for s in range(n_scan):
            im, lab, cnt = ds.load_batch_compact(
                range(s * batch, (s + 1) * batch), capacity=capacity
            )
            if cfg.packed_stem:
                im = pack_s2d_host(im)
            imgs_np.append(im)
            labels_np.append(lab)
            counts_np.append(cnt)
        imgs = jnp.asarray(np.stack(imgs_np))
        labels = jnp.asarray(np.stack(labels_np))
        counts = jnp.asarray(np.stack(counts_np))
        print(f"{spec['name']}: staged {n_scan}x{batch} images "
              f"@{cfg.img_size} (uint8 + compact labels, K={capacity})",
              flush=True)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model, tx, state = create_train_state(
            jax.random.PRNGKey(0), cfg, lr, batch_size=1,
            weight_decay=spec.get("wd", 0.0))
    state = jax.device_put(state, jax.devices()[0])
    af_hp = spec.get("af_hp") or None
    ema_decay = spec.get("ema") or None
    step_lr = None
    if spec.get("step_lr"):
        from yolo_from_scratch_tpu.train.schedule import make_step_lr

        n_steps_epoch = (stream.steps_per_epoch if pool
                         else len(ds) // batch)
        step_lr = make_step_lr(
            total_steps=spec["epochs"] * n_steps_epoch,
            warmup_steps=3 * n_steps_epoch, initial_lr=lr, min_lr=lr / 100,
        )
    if pool:
        from yolo_from_scratch_tpu.train.steps import (
            make_train_step_multi_pool,
        )

        steps = make_train_step_multi_pool(model, tx, cfg,
                                           device_augment=augment,
                                           device_mosaic=mosaic,
                                           sparse_loss=sparse,
                                           af_hp=af_hp)
    else:
        steps = make_train_step_multi_compact(model, tx, cfg,
                                              device_augment=augment,
                                              device_mosaic=mosaic,
                                              sparse_loss=sparse,
                                              af_hp=af_hp,
                                              step_lr=step_lr,
                                              ema_decay=ema_decay)

    ema = None
    if ema_decay:
        from yolo_from_scratch_tpu.train.ema import ema_init

        ema = ema_init({"params": state.params,
                        "batch_stats": state.batch_stats})

    stats_fn = None
    if spec.get("tal_stats") and not pool:
        # TAL instrumentation probe (VERDICT r4 #1): assignment
        # diagnostics on the first staged batch every 10 epochs, one
        # JSONL row each, so a working and a collapsing regime can be
        # diffed trace against trace.
        from yolo_from_scratch_tpu.models.anchor_free import (
            make_af_stats_fn,
        )

        tal_kw = {k: (af_hp or {})[k] for k in ("topk", "alpha", "beta")
                  if k in (af_hp or {})}
        stats_fn = make_af_stats_fn(model, cfg, **tal_kw)
        stats_path = Path(root) / f"tal_stats{tag}.jsonl"
        stats_path.write_text("")
        probe = (imgs[0], labels[0], counts[0])

    t_compile = time.time()
    times = []
    ingest_rates = []
    for epoch in range(spec["epochs"]):
        if step_lr is None:
            state = set_learning_rate(
                state, lr_at_epoch(epoch, 3, spec["epochs"], lr, lr / 100)
            )
        t0 = time.perf_counter()
        if pool:
            state, means, n_img, dt = stream.run_epoch(steps, state)
            loss = means["loss"]
            ingest_rates.append(means["ingest_img_s"])
        elif ema is not None:
            (state, ema), m = steps((state, ema), imgs, labels, counts)
            loss = float(m["loss"])
        else:
            state, m = steps(state, imgs, labels, counts)
            loss = float(m["loss"])  # hard sync each epoch
        times.append(time.perf_counter() - t0)
        if stats_fn is not None and (epoch % 10 == 0
                                     or epoch == spec["epochs"] - 1):
            s = jax.device_get(stats_fn(state.params, state.batch_stats,
                                        *probe))
            row = {"epoch": epoch,
                   **{k: round(float(v), 5) for k, v in sorted(s.items())}}
            with open(stats_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"  tal[{epoch}]: fg/img {row['fg_per_img']:.1f} "
                  f"starved {row['starved_gt_frac']:.2f} "
                  f"best_iou {row['gt_best_iou']:.3f} "
                  f"cls_fg {row['cls_fg_mean']:.3f} "
                  f"tgt_max {row['tgt_score_max']:.3f}", flush=True)
        if epoch % 20 == 0 or epoch == spec["epochs"] - 1:
            extra_log = (f" ingest {ingest_rates[-1]:.1f} img/s"
                         if pool else "")
            print(f"  epoch {epoch + 1}: loss {loss:.4f} "
                  f"({time.time() - t_compile:.0f}s){extra_log}",
                  flush=True)
            if not np.isfinite(loss):
                raise SystemExit("diverged")
    if pool:
        stream.stop()
    # steady state: median of the second half
    med = float(np.median(times[len(times) // 2:]))
    n_epoch_imgs = stream.images_per_epoch if pool else n_scan * batch
    train_ips = n_epoch_imgs / med
    if pool:
        # run-total accounting: the per-epoch median reads 0 whenever a
        # capped slab interval spans several (fast) epochs
        ingest = stream.total_ingested / max(sum(times), 1e-9)
        spec["_ingest_img_s"] = round(ingest, 1)
        # ingest < 1 img/s means the pool covered the whole (tiny) set —
        # an echo ratio is meaningless there
        spec["_echo_factor"] = (round(train_ips / ingest, 1)
                                if ingest >= 1.0 else None)
        print(f"pool echo: trained {train_ips:.1f} img/s vs ingest "
              f"{ingest:.1f} img/s = {spec['_echo_factor']}x echo",
              flush=True)

    from yolo_from_scratch_tpu.utils.checkpoint import save_checkpoint

    if ema is not None:
        # the A/B evaluates the EMA weights — that's the lever under test
        variables = jax.device_get(ema)
    else:
        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}
    save_checkpoint(ckpt, variables, cfg, epoch=spec["epochs"] - 1)
    print(f"train_img_s: {train_ips:.1f} (ckpt -> {ckpt})", flush=True)
    ips_record = {"train_img_s": round(train_ips, 1)}
    if pool:
        ips_record["ingest_img_s"] = spec.get("_ingest_img_s")
        ips_record["echo_factor"] = spec.get("_echo_factor")
    (Path(root) / f"train_ips{tag}.json").write_text(
        json.dumps(ips_record))
    if stage == "train":
        return {"train_img_s": round(train_ips, 1)}
    return _eval(spec, cfg, variables, root, train_ips)


def _eval(spec, cfg, variables, root, train_ips):
    val = YoloDataset(f"{root}/val/images", cfg.num_classes,
                      cfg.anchors_array, cfg.img_size)
    pred = BatchPredictor(variables, cfg, conf_threshold=1e-3,
                          max_outputs=300)
    m = evaluate_map(pred, val, num_classes=cfg.num_classes, batch_size=4)
    result = {
        "config": spec["name"], "img_size": cfg.img_size,
        "num_classes": cfg.num_classes,
        "train_img_s": train_ips and round(train_ips, 1),
        "map50": round(m["map50"] * 100, 1),
        "map": round(m["map"] * 100, 1),
        "epochs": spec["epochs"], "train_images": spec["n_train"],
        "kmeans_anchors": bool(spec["kmeans"]),
        "device_augment": spec.get("augment", False) or False,
        "device_mosaic": spec.get("mosaic", False),
        "class_mode": spec.get("class_mode", "color"),
        "n_distract": spec.get("n_distract", 0),
        "sparse_loss": spec.get("sparse", False),
        "head": spec.get("head", "anchor"),
        "det_f1": round(m["det_f1"], 1),
    }
    if spec.get("pool"):
        result["pool"] = spec["pool"]
        result["ingest_img_s"] = spec.get("_ingest_img_s")
        result["echo_factor"] = spec.get("_echo_factor")
        if spec.get("ingest_cap"):
            result["ingest_cap"] = spec["ingest_cap"]
    if spec.get("_lr") not in (None, 5e-3):
        result["lr"] = spec["_lr"]
    if spec.get("step_lr"):
        result["step_lr"] = True
    if spec.get("wd"):
        result["wd"] = spec["wd"]
    if spec.get("ema"):
        result["ema"] = spec["ema"]
    if spec.get("af_hp"):
        result["af_hp"] = spec["af_hp"]
    print(json.dumps(result), flush=True)
    out = Path(__file__).parent / "configs_results.jsonl"
    with open(out, "a") as f:
        f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    stage = "all"
    augment = False
    mosaic = False
    sparse = False
    pool_n = 0
    lr_cli = None
    overrides = {}
    keys = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a in ("--train-only", "--eval-only"):
            stage = a[2:].split("-")[0]
        elif a == "--augment":
            augment = True
        elif a == "--augment-flip":
            # hflip only: photometric jitter is label noise on the
            # color-coded class regimes (config 3: 50.9 -> 28.4 mAP50)
            augment = "flip"
        elif a == "--mosaic":
            # device-side 4-mosaic inside the scanned step
            # (ops/mosaic_device.py)
            mosaic = True
        elif a == "--sparse-loss":
            # gather-based loss, no dense target transport
            # (ops/losses_sparse.py)
            sparse = True
        elif a in ("--n-train", "--n-val", "--epochs"):
            overrides[a[2:].replace("-", "_")] = int(args[i + 1])
            i += 1
        elif a == "--distractors":
            # unlabeled out-of-class-set hard negatives per image
            # (shape mode only; utils/synth.py make_image)
            overrides["n_distract"] = int(args[i + 1])
            i += 1
        elif a == "--class-mode":
            # "shape": class identity is shape x texture with random
            # per-instance color (utils/synth.py) — the de-saturated
            # regime where photometric aug is label-preserving
            overrides["class_mode"] = args[i + 1]
            i += 1
        elif a == "--head":
            # anchor_free: the YOLOv8-style decoupled TAL+DFL head
            # (models/anchor_free.py) under the identical budget/regime
            overrides["head"] = args[i + 1]
            i += 1
        elif a == "--pool":
            # echo A/B: train via a P-slot PoolStream refreshed at this
            # host's link rate instead of pre-staged batches — same step
            # count, same dataset; records ingest rate + echo factor
            pool_n = int(args[i + 1])
            i += 1
        elif a == "--ingest-cap":
            # cap the PoolStream refresher at R img/s — FORCES the echo
            # regime instead of taking whatever the link gives (the 8x-
            # echo accuracy A/B, VERDICT r4 #3)
            overrides["ingest_cap"] = float(args[i + 1])
            i += 1
        elif a == "--lr":
            lr_cli = float(args[i + 1])
            i += 1
        elif a == "--tal-stats":
            # per-10-epoch TAL assignment diagnostics JSONL (VERDICT r4
            # #1 instrumentation); anchor_free head, pre-staged runs only
            overrides["tal_stats"] = True
        elif a == "--step-lr":
            # per-STEP warmup+cosine instead of the per-epoch schedule
            overrides["step_lr"] = True
        elif a == "--ema":
            # evaluate/save the EMA of params+batch_stats at this decay
            overrides["ema"] = float(args[i + 1])
            i += 1
        elif a == "--wd":
            # AdamW decoupled weight decay (anti-overfit lever for the
            # AF nc=80 study — val cls-acc 16.6% vs train 100%)
            overrides["wd"] = float(args[i + 1])
            i += 1
        elif a == "--af-hp":
            # anchor-free loss hyperparameter overrides, e.g.
            # --af-hp topk=13,alpha=1.0,cls_weight=1.0
            hp = {}
            for kv in args[i + 1].split(","):
                k, v = kv.split("=")
                hp[k] = int(v) if k == "topk" else float(v)
            allowed = {"topk", "alpha", "beta", "box_weight",
                       "cls_weight", "dfl_weight"}
            bad = set(hp) - allowed
            if bad:
                raise SystemExit(f"unknown af-hp keys {sorted(bad)} "
                                 f"(have: {sorted(allowed)})")
            overrides["af_hp"] = hp
            i += 1
        elif a.startswith("-"):
            # fail fast: an unrecognized flag must not be silently taken
            # for a config key (it would crash only AFTER training)
            raise SystemExit(f"unknown flag {a!r} (have: --train-only "
                             f"--eval-only --augment --augment-flip "
                             f"--mosaic --sparse-loss --n-train N "
                             f"--n-val N --epochs N --distractors N "
                             f"--class-mode color|shape "
                             f"--head anchor|anchor_free --pool P "
                             f"--lr LR --tal-stats --step-lr --ema D "
                             f"--wd W --af-hp k=v,...)")
        elif a not in CONFIGS:
            raise SystemExit(f"unknown config {a!r} "
                             f"(have: {sorted(CONFIGS)})")
        else:
            keys.append(a)
        i += 1
    for key in keys or ["2", "3", "4"]:
        spec = dict(CONFIGS[key], augment=augment, mosaic=mosaic,
                    sparse=sparse, pool=pool_n, **overrides)
        if overrides:  # a different regime must not reuse the cached set
            spec["name"] += "_n{}".format(spec["n_train"])
            if spec.get("class_mode") == "shape":
                spec["name"] += "_shape"
            if spec.get("n_distract"):
                spec["name"] += "_d{}".format(spec["n_distract"])
            if spec.get("head") == "anchor_free":
                spec["name"] += "_af"
        kw = {} if lr_cli is None else {"lr": lr_cli}
        run(spec, stage=stage, augment=augment, mosaic=mosaic,
            sparse=sparse, **kw)
