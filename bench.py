#!/usr/bin/env python
"""Benchmark: training images/sec/chip at 640x640 (the reference's headline
workload — batch 8, 's' model, Adam + clip; reference: train.py:1471-1543).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the reference PyTorch-CPU implementation
measured in this container (2.437 img/s — see BASELINE.md). Secondary
numbers (inference latency, bf16/fp32) go to stderr.

Runs on whatever backend JAX resolves (the axon TPU chip in the harness;
CPU elsewhere).
"""

import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.infer.predict import make_postprocess
from yolo_from_scratch_tpu.models.yolo import YOLO
from yolo_from_scratch_tpu.train.steps import (
    create_train_state,
    make_train_step_multi,
    set_learning_rate,
)

REFERENCE_CPU_TRAIN_IMG_S = 2.437  # BASELINE.md, measured in this container
BATCH = int(os.environ.get("BENCH_BATCH", 8))  # 8 = the reference workload
SIZE = os.environ.get("BENCH_SIZE", "s")  # n/s/m/l/x variant (default 's')
IMG = 640
TRAIN_STEPS = 100  # measured steps; dispatch count = max(100//chunk, 2)
                   # (chunk defaults to 50 on an accelerator, 10 on CPU)
WARMUP = 5  # warmup dispatches (x10 scanned steps) — the axon tunnel has a
            # ~30-40-step slow warm phase before sustained throughput


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(cfg, batch):
    rng = np.random.default_rng(0)
    images = rng.random((batch, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    targets = []
    for g in cfg.grid_sizes:
        t = np.zeros((batch, g, g, 3, 5 + cfg.num_classes), np.float32)
        # a few objects per image
        for b in range(batch):
            for k in range(3):
                gy, gx, a = rng.integers(0, g), rng.integers(0, g), rng.integers(0, 3)
                t[b, gy, gx, a, 0:4] = [
                    (gx + 0.5) / g, (gy + 0.5) / g, 0.1, 0.1,
                ]
                t[b, gy, gx, a, 4] = 1.0
                t[b, gy, gx, a, 5] = 1.0
        targets.append(t)
    return images, targets


def _init_on_host(fn, *args, **kw):
    """Run param init on the CPU backend — initializing on the TPU issues
    hundreds of tiny remote compiles (measured 108s on the axon tunnel)."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return fn(*args, **kw)
    with jax.default_device(cpu):
        return fn(*args, **kw)


def _bench_chunk():
    """Scanned steps per dispatch (BENCH_CHUNK overrides)."""
    default = 10 if jax.devices()[0].platform == "cpu" else 50
    return int(os.environ.get("BENCH_CHUNK", default))


def bench_train(cfg, batch=BATCH, chunk=None):
    """Sustained training throughput: `chunk` real optimizer steps per
    dispatch via the scanned multi-step trainer (a single per-step dispatch
    of the full TrainState costs ~10ms of host/tunnel time — more than the
    ~2ms the device needs for the step — so per-step dispatch measures the
    host, not the TPU). The real `fit` trainer stages whole epochs and
    scans them in one dispatch (train/loop.py), so a long chunk is the
    representative dispatch pattern; batches are staged uint8 exactly like
    the staged/stream trainers (normalized in-step by the shared
    config.INV255 reciprocal — bit-identical to the host loader).
    BENCH_CHUNK overrides (default 50 on an accelerator, 10 on CPU)."""
    if chunk is None:
        chunk = _bench_chunk()
    model, tx, state = _init_on_host(
        create_train_state, jax.random.PRNGKey(0), cfg, 1e-3, batch_size=1
    )
    state = jax.device_put(state, jax.devices()[0])
    train_steps = make_train_step_multi(model, tx, cfg)
    state = set_learning_rate(state, 1e-3)

    images_np, targets_np = make_batch(cfg, batch)
    # stage uint8 (what the staged/stream trainers feed): 4x less HBM than
    # f32 — chunk=50 packed @640 b8 is ~0.5 GB uint8 vs ~2 GB f32
    images_np = (images_np * 255).astype(np.uint8)
    if cfg.packed_stem:
        # the loader delivers host-packed batches on the packed-stem path
        from yolo_from_scratch_tpu.models.packed import pack_s2d_host

        images_np = pack_s2d_host(images_np)
    # stage `chunk` batches (same content; the device doesn't care)
    images = jnp.asarray(np.broadcast_to(
        images_np, (chunk,) + images_np.shape).copy())
    t3, t4, t5 = (
        jnp.asarray(np.broadcast_to(t, (chunk,) + t.shape).copy())
        for t in targets_np
    )

    for _ in range(WARMUP):
        state, metrics = train_steps(state, images, t3, t4, t5)
    float(metrics["loss"])  # hard sync — block_until_ready is unreliable
    # through the axon tunnel (measured returning before completion)

    n_dispatch = max(TRAIN_STEPS // chunk, 2)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        state, metrics = train_steps(state, images, t3, t4, t5)
    # reading the final loss VALUE forces the whole dependency chain
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0

    assert np.isfinite(loss), f"non-finite loss in benchmark: {loss}"
    return batch * chunk * n_dispatch / dt


def bench_pipeline(cfg, batch=BATCH, epochs=3):
    """REAL end-to-end input pipeline: JPEG decode (native C++ loader) ->
    letterbox -> dense target assignment -> prefetch thread -> DeviceQueue
    (async device_put, one batch ahead) -> per-step jitted train dispatch.
    Unlike bench_train (pre-staged batches, measures the device), this
    measures the whole system on this host. NOTE: this container has ONE
    CPU core — decode+target throughput scales with host cores on real
    TPU hosts."""
    import tempfile

    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.data.loader import DataLoader
    from yolo_from_scratch_tpu.train.loop import train_epoch
    from yolo_from_scratch_tpu.train.steps import make_train_step
    from yolo_from_scratch_tpu.utils.synth import make_dataset

    root = tempfile.mkdtemp(prefix="bench_pipe_")
    make_dataset(root, n_train=64, n_val=1, img_size=cfg.img_size)
    ds = YoloDataset(f"{root}/train/images", 1, img_size=cfg.img_size)
    loader = DataLoader(ds, batch_size=batch, shuffle=True, prefetch=2)

    model, tx, state = _init_on_host(
        create_train_state, jax.random.PRNGKey(0), cfg, 1e-3, batch_size=1
    )
    state = jax.device_put(state, jax.devices()[0])
    step = make_train_step(model, tx, cfg)
    state = set_learning_rate(state, 1e-3)

    # one warm epoch: jit compile + tunnel warm phase + page cache
    state, *_ = train_epoch(step, state, loader)

    n_imgs, t0 = 0, time.perf_counter()
    for _ in range(epochs):
        state, _, _, _, _, n, _ = train_epoch(step, state, loader)
        n_imgs += n
    dt = time.perf_counter() - t0
    return n_imgs / dt


def bench_batch_infer(cfg, batch=32, n_dispatch=10):
    """Batched serving throughput: forward + decode + batched Pallas NMS
    over B images per dispatch (the BatchPredictor device path). Dispatches
    are queued back-to-back and the stream is closed with one value
    readback — the device executes in order, so the final value forces the
    whole chain (serving-queue semantics; amortizes the tunnel RTT the
    single-image p50 cannot escape)."""
    from yolo_from_scratch_tpu.infer.predict import make_batch_postprocess

    model = YOLO(cfg)
    variables = _init_on_host(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3)), train=False,
    )
    variables = jax.device_put(variables, jax.devices()[0])
    post = make_batch_postprocess(model, cfg, conf_threshold=0.5,
                                  iou_threshold=0.4, max_outputs=300)
    rng = np.random.default_rng(0)
    imgs_np = rng.random(
        (batch, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    if cfg.packed_stem:  # the serving host packs after letterbox
        from yolo_from_scratch_tpu.models.packed import pack_s2d_host

        imgs_np = pack_s2d_host(imgs_np)
    imgs = jnp.asarray(imgs_np)
    ones = jnp.ones(batch, jnp.float32)
    zeros = jnp.zeros(batch, jnp.float32)

    for _ in range(3):
        out = post(variables, imgs, ones, zeros, zeros)
    float(out[1][0, 0])  # hard sync (see bench_train)

    t0 = time.perf_counter()
    outs = [post(variables, imgs, ones, zeros, zeros)
            for _ in range(n_dispatch)]
    float(outs[-1][1][0, 0])  # in-order stream: final value forces all
    dt = time.perf_counter() - t0
    for o in outs:  # belt-and-braces: nothing left in flight
        float(o[1][0, 0])
    return batch * n_dispatch / dt


def bench_infer(cfg, pipeline_depth=4, pipeline_n=40):
    """Device-side inference latency: forward + decode + NMS (excludes host
    letterbox; the reference's 94.4ms includes ~a few ms of PIL).

    Returns (p50_seconds, pipelined_img_s): the synchronous per-request
    p50 AND the sustained single-image rate with `pipeline_depth`
    requests in flight — the PipelinedPredictor client pattern
    (infer/predict.py) measured on the same compiled program, so the
    driver captures both serving numbers in one compile (VERDICT r4 #6).
    Through a high-RTT link the pipelined rate is the defensible
    sustained figure; whatever the link does that day is what gets
    recorded."""
    model = YOLO(cfg)
    variables = _init_on_host(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3)), train=False,
    )
    variables = jax.device_put(variables, jax.devices()[0])
    post = make_postprocess(model, cfg, conf_threshold=0.5, iou_threshold=0.4)
    rng = np.random.default_rng(0)
    img_np = rng.random((1, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    if cfg.packed_stem:
        from yolo_from_scratch_tpu.models.packed import pack_s2d_host

        img_np = pack_s2d_host(img_np)
    img = jnp.asarray(img_np)
    out = post(variables, img, 1.0, 0.0, 0.0)
    float(out[1][0])  # hard sync (see bench_train)
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = post(variables, img, 1.0, 0.0, 0.0)
        float(out[1][0])  # score readback forces the full pipeline
        times.append(time.perf_counter() - t0)
    p50 = statistics.median(times)

    # pipelined client: keep `depth` async dispatches in flight, read
    # back the oldest as each new one is queued (PipelinedPredictor
    # semantics: per-request latency unchanged, sustained rate decoupled
    # from the round trip)
    from collections import deque

    inflight = deque()
    t0 = time.perf_counter()
    for _ in range(pipeline_n):
        inflight.append(post(variables, img, 1.0, 0.0, 0.0))
        while len(inflight) > pipeline_depth:
            float(inflight.popleft()[1][0])
    while inflight:
        float(inflight.popleft()[1][0])
    pipelined_ips = pipeline_n / (time.perf_counter() - t0)
    return p50, pipelined_ips


def _probe_backend(timeout_s=240):
    """The axon tunnel can hang INDEFINITELY (no error) when the remote
    side is down — observed 2026-08-17, multi-hour outage — and a hung
    bench records nothing at all. Trigger backend init + one trivial op
    in a daemon thread; True iff it completes within `timeout_s`."""
    import threading

    done = []

    def probe():
        done.append(float(jnp.ones((8, 8)).sum()))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(done)


def _probe_backend_retry(attempts=(90, 120, 180), backoff_s=20):
    """Probe with retry/backoff over a bounded window (~7 min worst case).
    A transient tunnel blip should not cost a round's perf record; a real
    outage still fails fast enough to leave budget for the error record."""
    for i, t in enumerate(attempts):
        if _probe_backend(t):
            if i:
                log(f"backend probe succeeded on attempt {i + 1}")
            return True
        log(f"backend probe attempt {i + 1}/{len(attempts)} timed out ({t}s)")
        if i + 1 < len(attempts):
            time.sleep(backoff_s)
    return False


LASTGOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_LASTGOOD.json")


def _save_lastgood(record):
    """Persist the last successful headline measurement with a timestamp so
    a later tunnel outage can report it instead of losing the perf story."""
    record = dict(record)
    record["captured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    try:
        with open(LASTGOOD_PATH, "w") as f:
            json.dump(record, f, indent=1)
    except OSError as e:
        log(f"could not persist last-good record: {e}")


def _load_lastgood():
    try:
        with open(LASTGOOD_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def main():
    if not _probe_backend_retry():
        # honest failure record beats a silent hang past the driver budget;
        # surface the timestamped last-good measurement alongside
        record = {
            "metric": f"train_images_per_sec_per_chip_{IMG}",
            "value": 0,
            "unit": "img/s",
            "vs_baseline": 0,
            "error": "backend unresponsive after 3 probe attempts "
                     "(axon tunnel down?)",
        }
        lastgood = _load_lastgood()
        if lastgood:
            record["last_good"] = lastgood
        print(json.dumps(record), flush=True)
        os._exit(0)  # the stuck probe thread would block normal exit
    platform = jax.devices()[0].platform
    log(f"backend: {platform} ({jax.devices()[0]})")
    # the elapsed budget gates below protect the driver's call budget
    # from the multi-minute remote compiles — probe-retry wait time is
    # not bench work, so the clock starts AFTER the probe succeeds
    t_start = time.perf_counter()

    # Measure the ZERO-FLAGS CLI contract: config.auto_fast_layout is the
    # same resolver cli.py applies when no --packed/--dtype flags are
    # given (packed-p3 space-to-depth layout + bf16 on an accelerator;
    # measured 934 -> 1258 -> 1335 img/s @b8 on v5e for stem -> interior
    # -> p3, same-session A/B 2026-08-19). BENCH_PACKED=0 opts out.
    from yolo_from_scratch_tpu.config import auto_fast_layout

    auto = auto_fast_layout(platform)
    dtype = auto["compute_dtype"]
    packed = (os.environ.get("BENCH_PACKED", "1") != "0"
              and auto["packed_p3"])
    cfg = YoloConfig.from_size(SIZE, num_classes=1, img_size=IMG,
                               compute_dtype=dtype)
    if SIZE != "s":
        log(f"model size: {SIZE} (BENCH_SIZE)")
    train_ips = bench_train(cfg.with_(packed_stem=packed,
                                      packed_interior=packed,
                                      packed_p3=packed))
    log(f"train ({dtype}{', packed' if packed else ''}): "
        f"{train_ips:.2f} img/s/chip @ {IMG}x{IMG} batch {BATCH}")

    # The axon remote compiler has no persistent cache; the infer graph is
    # another multi-minute compile. Print the headline FIRST so a driver
    # timeout can never lose it, then attempt the secondary metric.
    headline = {
        "metric": f"train_images_per_sec_per_chip_{IMG}",
        "value": round(train_ips, 2),
        "unit": "img/s",
        "vs_baseline": round(train_ips / REFERENCE_CPU_TRAIN_IMG_S, 2),
    }
    print(json.dumps(headline), flush=True)
    if jax.devices()[0].platform != "cpu" and SIZE == "s":
        # only the headline configuration updates the last-good record —
        # a BENCH_SIZE experiment must not clobber the outage fallback
        # record the methodology alongside the value so cross-round
        # comparisons can tell a perf change from a setup change
        _save_lastgood({**headline, "methodology": {
            "batch": BATCH, "chunk": _bench_chunk(), "staging": "uint8",
            "packed": "p3" if packed else "none", "dtype": dtype,
            "size": SIZE,
        }})

    extra = {
        "train_images_per_sec_per_chip_640": round(train_ips, 2),
        "train_vs_pytorch_cpu": round(train_ips / REFERENCE_CPU_TRAIN_IMG_S, 2),
    }

    def save_extra():
        with open("BENCH_EXTRA.json", "w") as f:
            json.dump(extra, f, indent=1)

    save_extra()
    if os.environ.get("BENCH_PIPELINE"):
        # opt-in: real loader->queue->train pipeline (adds dataset build +
        # a second multi-minute compile; see BASELINE.md on the 1-core host)
        pipe_ips = bench_pipeline(cfg)
        log(f"end-to-end pipeline (decode+targets+queue+train): "
            f"{pipe_ips:.1f} img/s on this host")
        extra["pipeline_images_per_sec"] = round(pipe_ips, 1)
        save_extra()
    elapsed = time.perf_counter() - t_start
    if os.environ.get("BENCH_SKIP_INFER") or elapsed > 330:
        log(f"skipping infer bench (elapsed {elapsed:.0f}s)")
        return
    # Reference predict p50 measured in this container: 94.4 ms = 10.6 img/s
    # (BASELINE.md). The ≥5x target is 53 img/s.
    try:
        batch_ips = bench_batch_infer(cfg.with_(packed_stem=packed,
                                                packed_interior=packed,
                                                packed_p3=packed))
        log(f"batched inference (B=32, fwd+decode+Pallas NMS): "
            f"{batch_ips:.1f} img/s ({batch_ips / 10.6:.1f}x reference)")
        extra["infer_batch32_images_per_sec"] = round(batch_ips, 1)
        extra["infer_vs_pytorch_cpu"] = round(batch_ips / 10.6, 1)
        save_extra()
    except Exception as e:  # secondary metric must not kill the benchmark
        log(f"batched infer bench failed: {e}")
    if time.perf_counter() - t_start > 380:
        log("skipping single-image infer bench (elapsed budget)")
        return
    try:
        infer_p50, pipelined_ips = bench_infer(
            cfg.with_(packed_stem=packed, packed_interior=packed,
                      packed_p3=packed))
        log(f"infer p50 (device fwd+decode+NMS): {infer_p50 * 1000:.2f} ms "
            f"({1 / infer_p50:.1f} img/s)")
        log(f"pipelined single-image sustained (depth 4, "
            f"PipelinedPredictor pattern): {pipelined_ips:.1f} img/s "
            f"({pipelined_ips / 10.6:.1f}x reference predict)")
        extra["infer_single_image_p50_ms"] = round(infer_p50 * 1000, 2)
        extra["infer_pipelined_sustained_images_per_sec"] = round(
            pipelined_ips, 1)
        save_extra()
    except Exception as e:  # secondary metric must not kill the benchmark
        log(f"infer bench failed: {e}")


if __name__ == "__main__":
    main()
