"""Synthetic scene generation for tests and benchmarks (no dataset downloads
needed - the environment has no network egress)."""

from __future__ import annotations

import numpy as np


def moving_boxes_frame(
    t: int,
    h: int = 720,
    w: int = 1280,
    n_objects: int = 6,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Render frame t of a deterministic scene of moving colored rectangles.

    Returns (frame BGR uint8 (h, w, 3), gt_boxes (n, 4) xyxy float32).
    Objects bounce off the frame edges with constant speed.
    """
    rng = np.random.default_rng(seed)
    base_xy = rng.uniform([0.05, 0.05], [0.7, 0.7], (n_objects, 2))
    sizes = rng.uniform([0.06, 0.1], [0.12, 0.22], (n_objects, 2))
    vel = rng.uniform(-0.01, 0.01, (n_objects, 2))
    colors = rng.integers(60, 255, (n_objects, 3))

    frame = np.full((h, w, 3), 30, np.uint8)
    boxes = np.zeros((n_objects, 4), np.float32)
    for i in range(n_objects):
        span = 1.0 - sizes[i]
        pos = base_xy[i] + vel[i] * t
        # reflect off the walls (triangle wave)
        pos = np.abs(((pos / span) % 2.0) - 1.0) * span
        x1 = int(pos[0] * w)
        y1 = int(pos[1] * h)
        x2 = int((pos[0] + sizes[i][0]) * w)
        y2 = int((pos[1] + sizes[i][1]) * h)
        frame[y1:y2, x1:x2] = colors[i]
        boxes[i] = (x1, y1, x2, y2)
    return frame, boxes


def write_synthetic_video(path: str, frames: int = 100, h: int = 720, w: int = 1280,
                          n_objects: int = 6, fps: float = 30.0, seed: int = 0) -> None:
    import cv2

    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not vw.isOpened():
        raise RuntimeError(f"cannot open video writer for {path}")
    for t in range(frames):
        frame, _ = moving_boxes_frame(t, h, w, n_objects, seed)
        vw.write(frame)
    vw.release()
