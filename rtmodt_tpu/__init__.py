"""RTMODT-TPU: a TPU-native real-time multi-object detection & tracking framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``gabbarX/Real-Time-Multi-Object-Detection---Tracking-System`` (the CUDA/torch
reference): RTSP/video ingestion -> YOLOv8 detection -> ByteTrack-style
persistent-ID tracking -> polygon zone-intrusion events -> annotated
visualization, with per-stage latency profiling, offline mAP/IDF1 evaluation,
a web demo, and JAX training/export tooling.

Architectural stance (vs. reference ``tools/run_pipeline.py:119-166``): instead
of a CPU orchestration loop calling an opaque GPU library per stage, everything
between "uint8 frame in" and "tracks + events out" is ONE jitted, fixed-shape
XLA program per frame (or per frame-batch across a device mesh).
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy top-level exports to keep import cheap
    if name in ("Detections", "Detector"):
        from rtmodt_tpu.detection import detector
        return getattr(detector, name)
    if name in ("MultiObjectTracker", "Track"):
        from rtmodt_tpu.tracking import tracker
        return getattr(tracker, name)
    raise AttributeError(name)
