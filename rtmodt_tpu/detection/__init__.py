from rtmodt_tpu.detection.detector import Detections, Detector  # noqa: F401
