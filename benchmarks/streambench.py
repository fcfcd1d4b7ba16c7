#!/usr/bin/env python
"""Streaming-path A/B: dense vs compact target shipping.

The scanned trainer (bench.py) measures the device with pre-staged
batches; this measures the STREAMING path — loader thread (decode +
letterbox [+ host assignment for dense]) -> DeviceQueue (async
device_put one batch ahead) -> per-step jitted dispatch — at the
regime where the representation matters: nc=80 @640, where a dense
target set is ~8.7 MB/image vs ~1 KB of compact labels
(data/assign_device.py; docs/DESIGN.md "On-device assignment").

Per mode it reports:
  loader-only img/s   host-side ceiling (no device work)
  streamed img/s      full pipeline through the train step
  bytes/img shipped   what crosses the host->device link

Usage: python benchmarks/streambench.py [--nc N] [--img N] [--n N]
       [--batch N] [--epochs N]
NOTE: this container has ONE CPU core — host-bound numbers scale with
cores on real TPU hosts; the point here is the dense-vs-compact RATIO.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from yolo_from_scratch_tpu.config import YoloConfig  # noqa: E402
from yolo_from_scratch_tpu.data.dataset import YoloDataset  # noqa: E402
from yolo_from_scratch_tpu.data.device_queue import DeviceQueue  # noqa: E402
from yolo_from_scratch_tpu.data.loader import DataLoader  # noqa: E402
from yolo_from_scratch_tpu.train.loop import train_epoch  # noqa: E402
from yolo_from_scratch_tpu.train.steps import (  # noqa: E402
    create_train_state,
    make_train_step,
    set_learning_rate,
)
from yolo_from_scratch_tpu.utils.synth import make_dataset  # noqa: E402


def batch_nbytes(batch):
    images, targets = batch
    leaves = [images] + list(
        targets if isinstance(targets, (list, tuple)) else [targets]
    )
    flat = []
    for x in leaves:
        if isinstance(x, (list, tuple)):
            flat.extend(x)
        else:
            flat.append(x)
    return sum(np.asarray(x).nbytes for x in flat)


def run_mode(cfg, root, compact, batch, epochs):
    ds = YoloDataset(f"{root}/train/images", cfg.num_classes,
                     cfg.anchors_array, cfg.img_size)
    mk_loader = lambda: DataLoader(ds, batch_size=batch, shuffle=False,
                                   prefetch=2, pack_images=cfg.packed_stem,
                                   compact=compact)

    # host-only ceiling: drain the loader, no device work
    loader = mk_loader()
    n, t0, nbytes = 0, time.perf_counter(), 0
    for b in loader:
        n += b[0].shape[0]
        if nbytes == 0:
            nbytes = batch_nbytes(b)
    loader_ips = n / (time.perf_counter() - t0)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg,
                                              1e-3, batch_size=1)
    state = jax.device_put(state, jax.devices()[0])
    step = make_train_step(model, tx, cfg, compact_targets=bool(compact))
    state = set_learning_rate(state, 1e-3)

    # warm epoch: compile + tunnel warm phase + page cache
    state, *_ = train_epoch(step, state, mk_loader())
    n_imgs, t0 = 0, time.perf_counter()
    for _ in range(epochs):
        state, _, _, _, _, n, _ = train_epoch(step, state, mk_loader())
        n_imgs += n
    streamed_ips = n_imgs / (time.perf_counter() - t0)

    name = f"compact K={compact}" if compact else "dense"
    print(f"{name:>14}: loader-only {loader_ips:7.1f} img/s | streamed "
          f"{streamed_ips:7.1f} img/s | {nbytes / batch / 1e6:6.2f} "
          f"MB/img shipped", flush=True)
    return streamed_ips


if __name__ == "__main__":
    args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
    nc = int(args.get("--nc", 80))
    img = int(args.get("--img", 640))
    n_train = int(args.get("--n", 128))
    batch = int(args.get("--batch", 8))
    epochs = int(args.get("--epochs", 2))

    root = f"/tmp/streambench_nc{nc}_{img}"
    if not (Path(root) / "data.yaml").exists():
        make_dataset(root, n_train, 1, img, seed=0, num_classes=nc,
                     n_min=2, n_max=6)
    cfg = YoloConfig(num_classes=nc, img_size=img,
                     compute_dtype="bfloat16", packed_stem=True,
                     packed_interior=True, packed_p3=True)
    print(f"streambench: nc={nc} @{img}, {n_train} imgs, batch {batch}, "
          f"{epochs} timed epochs, backend="
          f"{jax.devices()[0].platform}", flush=True)
    dense = run_mode(cfg, root, 0, batch, epochs)
    compact = run_mode(cfg, root, 64, batch, epochs)
    print(f"compact/dense streamed ratio: {compact / dense:.2f}x",
          flush=True)
