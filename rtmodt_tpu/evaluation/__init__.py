from rtmodt_tpu.evaluation.metrics import (  # noqa: F401
    evaluate_detection,
    evaluate_tracking,
    build_confusion_matrix,
    measure_tracking_drift,
)
