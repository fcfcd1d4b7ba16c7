#!/usr/bin/env python
"""int8 PTQ accuracy A/B: mAP of the float vs quantized serving path on
a trained checkpoint (defaults to the config-2 nc5@416 benchmark model).

    python benchmarks/int8map.py [ckpt] [data.yaml] [--batch 16]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?",
                    default="/tmp/cfgbench_nc5_416/trained.ckpt")
    ap.add_argument("yaml", nargs="?",
                    default="/tmp/cfgbench_nc5_416/data.yaml")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--calib", type=int, default=16)
    a = ap.parse_args()

    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.infer.predict import BatchPredictor
    from yolo_from_scratch_tpu.train.map_eval import evaluate_map
    from yolo_from_scratch_tpu.utils.checkpoint import load_checkpoint
    from yolo_from_scratch_tpu.utils.yaml_cfg import load_dataset_yaml

    variables, cfg, meta = load_checkpoint(a.ckpt)
    config = load_dataset_yaml(a.yaml)
    anchors = cfg.anchors_array
    val = YoloDataset(config["val"], cfg.num_classes, anchors, cfg.img_size,
                      head_type=cfg.head_type)
    train = YoloDataset(config["train"], cfg.num_classes, anchors,
                        cfg.img_size, head_type=cfg.head_type)
    calib = train.imgs[: a.calib]
    print(f"{a.ckpt}: nc={cfg.num_classes} @{cfg.img_size}, "
          f"{len(val)} val images, {len(calib)} calibration images")

    results = {}
    for name, kw in (("float", {}), ("int8", {"quantize_calib": calib})):
        t0 = time.time()
        pred = BatchPredictor(variables, cfg, conf_threshold=1e-3,
                              max_outputs=300, **kw)
        m = evaluate_map(pred, val, num_classes=cfg.num_classes,
                         batch_size=a.batch)
        results[name] = m
        print(f"{name:>6}: mAP@0.5 {m['map50'] * 100:.2f}  "
              f"mAP@[.5:.95] {m['map'] * 100:.2f}  "
              f"({time.time() - t0:.0f}s incl. compile)")
    d50 = (results["int8"]["map50"] - results["float"]["map50"]) * 100
    d = (results["int8"]["map"] - results["float"]["map"]) * 100
    print(json.dumps({
        "float_map50": round(results["float"]["map50"] * 100, 2),
        "int8_map50": round(results["int8"]["map50"] * 100, 2),
        "delta_map50": round(d50, 2),
        "float_map": round(results["float"]["map"] * 100, 2),
        "int8_map": round(results["int8"]["map"] * 100, 2),
        "delta_map": round(d, 2),
    }))


if __name__ == "__main__":
    main()
