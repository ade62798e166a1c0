from rtmodt_tpu.models.yolov8 import (  # noqa: F401
    YOLOv8,
    YOLOV8_VARIANTS,
    build_model,
    decode_predictions,
)
