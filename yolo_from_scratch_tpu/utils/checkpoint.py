"""Checkpoint save/load (msgpack).

Logical schema parity with the reference checkpoint dict (reference:
train.py:1533-1540): model weights + epoch + num_classes + img_size +
width_mult + depth_mult, with anchors embedded. Improvements over the
reference: optimizer state and step can ride along for true resume
(reference has no resume path — SURVEY.md §5.3), and `num_classes` is
actually read back at load (the reference writes but never reads it,
train.py:1390-1417 — SURVEY.md §3.6).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from yolo_from_scratch_tpu.config import YoloConfig

CKPT_VERSION = 1


def save_checkpoint(
    path,
    variables: dict,
    cfg: YoloConfig,
    epoch: int = 0,
    opt_state: Any = None,
    extra: Optional[dict] = None,
):
    """Write a checkpoint. `variables` = {'params':…, 'batch_stats':…}."""
    payload = {
        "version": CKPT_VERSION,
        "model": jax.device_get(variables),
        "epoch": int(epoch),
        "num_classes": int(cfg.num_classes),
        "img_size": int(cfg.img_size),
        "width_mult": float(cfg.width_mult),
        "depth_mult": float(cfg.depth_mult),
        "anchors": np.asarray(cfg.anchors, np.float32),
        "compute_dtype": cfg.compute_dtype,
        "head_type": cfg.head_type,
    }
    if opt_state is not None:
        # optax states are custom pytrees; flatten to a plain state dict so
        # msgpack can serialize them (restored via from_state_dict)
        payload["opt_state"] = jax.device_get(
            serialization.to_state_dict(opt_state)
        )
    if extra:
        payload["extra"] = extra
    blob = serialization.msgpack_serialize(payload)
    # atomic replace: fit() rewrites the same path every epoch (and --resume
    # writes onto the file being resumed) — a crash mid-write must not
    # destroy the only copy
    import os

    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_checkpoint(path):
    """Read a checkpoint. Returns (variables, cfg, meta) where meta keeps
    epoch / opt_state / extras."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    cfg = YoloConfig(
        num_classes=int(payload["num_classes"]),
        img_size=int(payload["img_size"]),
        width_mult=float(payload["width_mult"]),
        depth_mult=float(payload["depth_mult"]),
        anchors=tuple(
            tuple(tuple(float(v) for v in wh) for wh in s)
            for s in np.asarray(payload["anchors"])
        ),
        compute_dtype=payload.get("compute_dtype", "float32"),
        head_type=payload.get("head_type", "anchor"),
    )
    meta = {
        "epoch": int(payload.get("epoch", 0)),
        "opt_state": payload.get("opt_state"),
        "extra": payload.get("extra"),
        "version": int(payload.get("version", 0)),
    }
    variables = payload["model"]
    if isinstance(variables.get("params"), dict):
        # degenerate checkpoints may lack a head bias — repair + warn, as
        # the reference's initialize_detection_biases does (train.py:543-549)
        from yolo_from_scratch_tpu.models.yolo import ensure_detection_biases

        variables["params"] = ensure_detection_biases(
            variables["params"], cfg
        )
    return variables, cfg, meta
