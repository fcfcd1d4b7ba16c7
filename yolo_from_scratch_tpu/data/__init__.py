from yolo_from_scratch_tpu.data.letterbox import letterbox_image, letterbox_params
from yolo_from_scratch_tpu.data.dataset import YoloDataset, assign_targets
from yolo_from_scratch_tpu.data.loader import DataLoader

__all__ = [
    "letterbox_image",
    "letterbox_params",
    "YoloDataset",
    "assign_targets",
    "DataLoader",
]
