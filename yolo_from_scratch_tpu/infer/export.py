"""Frozen serving artifacts via `jax.export` (StableHLO).

The deployment step the reference has no analogue for (its serving story
ends at `predict`, reference: train.py:1114-1250): freeze the ENTIRE
batched inference program — forward + decode + sigmoid + top-k prefilter
+ fixed-shape NMS — with the trained weights baked in as constants, into
a single portable StableHLO artifact. A serving process then needs only
jax + this file's loader: no model code path is traced, no checkpoint is
read, no Python recompile happens at load (XLA still compiles the HLO
once per process, which is the cheap half).

TPU-first design notes:
- The exported program is the same static-shape one-dispatch pipeline the
  live `BatchPredictor` runs, so the artifact inherits every serving
  optimization (packed stem, capacity-planned top-k).
- `platforms` controls lowering targets. Multi-platform artifacts
  (e.g. ["tpu", "cpu"]) must use the lax NMS path — the Pallas kernel
  lowers through Mosaic, which only targets TPU; single-platform TPU
  artifacts keep the Pallas kernel.
- Weights are closed over (constants in the StableHLO), so the artifact
  is self-contained and tamper-evident: one file == one deployable model.

File format: magic b"YFSTPU1\\n" + u32 header length + JSON header (the
config fields the host-side pre/post steps need) + the serialized
`jax.export.Exported` payload.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import jax
import numpy as np

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.data.letterbox import letterbox_image
from yolo_from_scratch_tpu.infer.predict import (
    _detections_per_image,
    default_topk,
    make_batch_postprocess,
)
from yolo_from_scratch_tpu.models.yolo import YOLO

MAGIC = b"YFSTPU1\n"


def export_serving(variables, cfg: YoloConfig, batch_size: int,
                   conf_threshold=0.5, iou_threshold=0.4, topk=None,
                   max_outputs=300, platforms=None, quantize_calib=None):
    """Build and export the frozen batched-inference program.

    Returns (jax.export.Exported, header dict). The exported callable
    takes (imgs (B,S,S,C), scales (B,), pad_tops (B,), pad_lefts (B,))
    — weights are baked in — and returns (boxes (B,K,4), scores (B,K),
    classes (B,K), valid (B,K)).

    `quantize_calib`: list of images — freeze the int8 PTQ program
    instead (infer/quantize.py): the int8 weights and scales become the
    baked-in constants.
    """
    import jax.numpy as jnp

    if platforms is None:
        platforms = [jax.default_backend()]
    # Pallas/Mosaic lowers only to TPU; a portable artifact needs lax NMS
    use_pallas = platforms == ["tpu"]
    model = YOLO(cfg)
    apply_fn = None
    if quantize_calib is not None:
        from yolo_from_scratch_tpu.infer.predict import _quantize

        variables, apply_fn = _quantize(model, variables, cfg,
                                        quantize_calib)
    post = make_batch_postprocess(
        model, cfg, conf_threshold, iou_threshold, topk=topk,
        max_outputs=max_outputs, use_pallas_nms=use_pallas,
        apply_fn=apply_fn,
    )

    def frozen(imgs, scales, pad_tops, pad_lefts):
        return post(variables, imgs, scales, pad_tops, pad_lefts)

    s = cfg.img_size
    if cfg.packed_stem:
        img_shape = (batch_size, s // 2, s // 2, 12)
    else:
        img_shape = (batch_size, s, s, 3)
    args = (
        jax.ShapeDtypeStruct(img_shape, jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.float32),
    )
    exported = jax.export.export(jax.jit(frozen), platforms=platforms)(*args)
    per_cell = 1 if cfg.head_type == "anchor_free" else 3
    header = {
        "format": 1,
        "batch_size": batch_size,
        "img_size": s,
        "num_classes": cfg.num_classes,
        "packed_stem": bool(cfg.packed_stem),
        "head_type": cfg.head_type,
        "conf_threshold": conf_threshold,
        "iou_threshold": iou_threshold,
        "topk": topk or default_topk(s, per_cell),
        "max_outputs": max_outputs,
        "platforms": list(platforms),
        "pallas_nms": use_pallas,
        "int8": quantize_calib is not None,
    }
    return exported, header


def save_serving_artifact(path, variables, cfg: YoloConfig, batch_size: int,
                          **kwargs):
    """Export and write a serving artifact file; returns the header."""
    exported, header = export_serving(variables, cfg, batch_size, **kwargs)
    payload = bytes(exported.serialize())
    head = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(head)))
        f.write(head)
        f.write(payload)
    return header


class ServingArtifact:
    """Loaded frozen serving program. Call like `BatchPredictor`:
    a list of image paths / PIL images in, per-image detection tuples
    out. The last partial batch is padded to the frozen batch size."""

    def __init__(self, path):
        raw = Path(path).read_bytes()
        if raw[: len(MAGIC)] != MAGIC:
            raise ValueError(f"{path}: not a serving artifact (bad magic)")
        off = len(MAGIC)
        (hlen,) = struct.unpack_from("<I", raw, off)
        off += 4
        self.meta = json.loads(raw[off : off + hlen].decode())
        self._exported = jax.export.deserialize(raw[off + hlen :])
        self._call = jax.jit(self._exported.call)

    def __call__(self, images):
        import jax.numpy as jnp
        from PIL import Image

        m = self.meta
        b = m["batch_size"]
        pils = [
            (Image.open(im).convert("RGB")
             if not hasattr(im, "size") else im.convert("RGB"))
            for im in images
        ]
        if len(pils) > b:
            raise ValueError(
                f"{len(pils)} images > frozen batch size {b}; chunk the "
                f"input or export with a larger batch_size"
            )
        imgs, scales, pts, pls = [], [], [], []
        for pil in pils:
            arr, scale, pad_top, pad_left = letterbox_image(
                pil, m["img_size"]
            )
            imgs.append(arr.astype(np.float32) / 255.0)
            scales.append(scale)
            pts.append(pad_top)
            pls.append(pad_left)
        pad_n = b - len(pils)
        if pad_n:
            imgs.extend([np.zeros_like(imgs[0])] * pad_n)
            scales.extend([1.0] * pad_n)
            pts.extend([0.0] * pad_n)
            pls.extend([0.0] * pad_n)
        batch = np.stack(imgs)
        if m["packed_stem"]:
            from yolo_from_scratch_tpu.models.packed import pack_s2d_host

            batch = pack_s2d_host(batch)
        boxes, scores, classes, valid = jax.device_get(
            self._call(
                jnp.asarray(batch),
                jnp.asarray(scales, jnp.float32),
                jnp.asarray(pts, jnp.float32),
                jnp.asarray(pls, jnp.float32),
            )
        )
        return _detections_per_image(boxes, scores, classes, valid,
                                     len(pils))


def load_serving_artifact(path) -> ServingArtifact:
    return ServingArtifact(path)
