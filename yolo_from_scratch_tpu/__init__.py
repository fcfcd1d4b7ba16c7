"""TPU-native YOLOv5-style object-detection framework (JAX/XLA/Pallas).

A ground-up re-design of the reference PyTorch detector
(KhaledSharif/yolo-from-scratch, mounted at /root/reference) for TPU:

- the scalable CSP/C3 backbone + SPPF + FPN/PANet neck runs as jitted XLA
  conv graphs in NHWC with a configurable compute dtype (bf16 on TPU),
- grid decode / CIoU / BCE losses are dense, fully vectorized functions
  (no dynamic-shape boolean masking),
- cross-scale global NMS is a fixed-shape sorted top-k kernel (Pallas on
  TPU, pure-lax fallback elsewhere),
- training shards batches data-parallel over a `jax.sharding.Mesh`,
- the CLI, dataset.yaml format, and checkpoint schema (embedded img_size,
  size multipliers, nc, anchors) match the reference contract
  (reference: train.py:1354-1565).
"""

__version__ = "0.1.0"

from yolo_from_scratch_tpu.config import YoloConfig, YOLO_SIZES, DEFAULT_ANCHORS

__all__ = ["YoloConfig", "YOLO_SIZES", "DEFAULT_ANCHORS", "__version__"]
