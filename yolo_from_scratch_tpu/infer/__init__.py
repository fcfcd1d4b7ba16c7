from yolo_from_scratch_tpu.infer.predict import Predictor, predict

__all__ = ["Predictor", "predict"]
