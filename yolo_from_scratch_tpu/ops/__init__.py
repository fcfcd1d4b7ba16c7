from yolo_from_scratch_tpu.ops.boxes import (
    box_iou_center,
    box_iou_corner,
    center_to_corner,
    corner_to_center,
    pairwise_iou_corner,
)
from yolo_from_scratch_tpu.ops.decode import decode_predictions
from yolo_from_scratch_tpu.ops.ciou import ciou, ciou_loss
from yolo_from_scratch_tpu.ops.losses import yolo_loss, yolo_loss_multiscale
from yolo_from_scratch_tpu.ops.nms import nms_fixed, batched_nms_fixed

__all__ = [
    "box_iou_center",
    "box_iou_corner",
    "center_to_corner",
    "corner_to_center",
    "pairwise_iou_corner",
    "decode_predictions",
    "ciou",
    "ciou_loss",
    "yolo_loss",
    "yolo_loss_multiscale",
    "nms_fixed",
    "batched_nms_fixed",
]
