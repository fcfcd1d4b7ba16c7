from yolo_from_scratch_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from yolo_from_scratch_tpu.utils.yaml_cfg import load_dataset_yaml

__all__ = ["save_checkpoint", "load_checkpoint", "load_dataset_yaml"]
