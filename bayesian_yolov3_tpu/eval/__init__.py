from .detection_metrics import average_precision, log_average_miss_rate, evaluate_detections  # noqa: F401
