from yolo_from_scratch_tpu.models.yolo import YOLO, init_model, count_params

__all__ = ["YOLO", "init_model", "count_params"]
