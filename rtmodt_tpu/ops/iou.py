"""Vectorized IoU on device.

TPU-native analog of the reference's NumPy IoU matrix
(``src/tracking/tracker.py:150-161``): everything is a fixed-shape batched
jnp computation so it fuses into the surrounding XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise IoU of two aligned sets of xyxy boxes, shape (..., 4) -> (...)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter + eps)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU matrix between (M, 4) and (N, 4) xyxy boxes -> (M, N)."""
    return box_iou(a[:, None, :], b[None, :, :], eps=eps)


def ciou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU (used by the YOLOv8 box regression loss), aligned (..., 4)."""
    iou = box_iou(a, b, eps)
    # Enclosing box diagonal
    c_lt = jnp.minimum(a[..., :2], b[..., :2])
    c_rb = jnp.maximum(a[..., 2:], b[..., 2:])
    c_wh = jnp.clip(c_rb - c_lt, 0.0)
    c2 = c_wh[..., 0] ** 2 + c_wh[..., 1] ** 2 + eps
    # Center distance
    ac = (a[..., :2] + a[..., 2:]) * 0.5
    bc = (b[..., :2] + b[..., 2:]) * 0.5
    rho2 = jnp.sum((ac - bc) ** 2, axis=-1)
    # Aspect-ratio consistency term
    aw = a[..., 2] - a[..., 0]
    ah = a[..., 3] - a[..., 1]
    bw = b[..., 2] - b[..., 0]
    bh = b[..., 3] - b[..., 1]
    v = (4.0 / jnp.pi**2) * (jnp.arctan(bw / (bh + eps)) - jnp.arctan(aw / (ah + eps))) ** 2
    alpha = v / (v - iou + 1.0 + eps)
    return iou - rho2 / c2 - alpha * v


def xyxy_to_cxcyah(xyxy: jnp.ndarray) -> jnp.ndarray:
    """xyxy -> (center_x, center_y, aspect=w/h, height), the Kalman measurement space."""
    w = xyxy[..., 2] - xyxy[..., 0]
    h = xyxy[..., 3] - xyxy[..., 1]
    cx = xyxy[..., 0] + 0.5 * w
    cy = xyxy[..., 1] + 0.5 * h
    return jnp.stack([cx, cy, w / jnp.maximum(h, 1e-6), h], axis=-1)


def cxcyah_to_xyxy(m: jnp.ndarray) -> jnp.ndarray:
    h = m[..., 3]
    w = m[..., 2] * h
    x1 = m[..., 0] - 0.5 * w
    y1 = m[..., 1] - 0.5 * h
    return jnp.stack([x1, y1, x1 + w, y1 + h], axis=-1)


def xyxy_to_cxcywh(xyxy: jnp.ndarray) -> jnp.ndarray:
    wh = xyxy[..., 2:] - xyxy[..., :2]
    c = (xyxy[..., :2] + xyxy[..., 2:]) * 0.5
    return jnp.concatenate([c, wh], axis=-1)


def cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    half = b[..., 2:] * 0.5
    return jnp.concatenate([b[..., :2] - half, b[..., :2] + half], axis=-1)
